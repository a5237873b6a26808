package graft.model

import org.apache.spark.sql.types.DataType

/** Column mapping into an HBase-style table: `family:qualifier` of a given
  * type, fed from DataFrame column `source`.
  *
  * Mirrors the reference's HBaseTableSchema.java (rowkey + per-family
  * qualifier lists with types), re-expressed as plain data.
  */
final case class HColumn(family: String, qualifier: String, source: String,
                         dataType: DataType)

/** Table schema: an ordered list of rowkey source columns (encoded
  * big-endian and concatenated — composite keys sort correctly because the
  * encoding is fixed-width per component) plus the cell columns.
  *
  * `nullLiteral` reproduces HBaseSerde's null handling
  * (HBaseSerde.java:251-278): null strings encode as the literal's UTF-8
  * bytes, null non-strings as empty bytes.
  */
final case class HTableSchema(rowKey: Seq[String], columns: Seq[HColumn],
                              nullLiteral: String = "null") {
  require(rowKey.nonEmpty, "rowkey must have at least one source column")
  def families: Seq[String] = columns.map(_.family).distinct
}
