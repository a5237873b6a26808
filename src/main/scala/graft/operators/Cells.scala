package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}
import graft.functions.hb
import graft.model.{HColumn, HTableSchema}

/** Wide rows ⇄ HBase-style cell streams.
  *
  * `toCells` = HBaseSerde.createPutMutation (HBaseSerde.java:119-144): one
  * `(rowkey, family, qualifier, value)` cell per mapped column, null
  * encoding per HBaseSerde.java:251-278.
  *
  * `fromCells` = HBaseSerde.convertToRow (HBaseSerde.java:217-239): group
  * the cell stream by rowkey and decode qualifiers back into typed fields.
  *
  * Both are single-pass, codegen-friendly (explode / conditional agg), and
  * shuffle only on `fromCells`' rowkey groupBy — partial-aggregatable.
  */
object Cells {

  /** Encode one source column to its cell value with null semantics. */
  private def encodeNullable(hc: HColumn, nullLiteral: String): Column = {
    val c = col(hc.source)
    val encoded = hb.encode(c)
    hc.dataType match {
      case StringType =>
        when(c.isNull, hb.encode(lit(nullLiteral))).otherwise(encoded)
      case _ =>
        when(c.isNull, lit(Array.empty[Byte])).otherwise(encoded)
    }
  }

  def rowKey(schema: HTableSchema): Column =
    concat(schema.rowKey.map(s => hb.encode(col(s))): _*)

  /** Wide DataFrame → cell stream (rowkey, family, qualifier, value). */
  def toCells(df: DataFrame, schema: HTableSchema,
              carry: Seq[String] = Nil): DataFrame = {
    val cellStructs = schema.columns.map { hc =>
      struct(
        lit(hc.family).as("family"),
        lit(hc.qualifier).as("qualifier"),
        encodeNullable(hc, schema.nullLiteral).as("value"))
    }
    df.select(rowKey(schema).as("rowkey") +: carry.map(col) :+
        explode(array(cellStructs: _*)).as("c"): _*)
      .select(col("rowkey") +: carry.map(col) :+ col("c.family") :+
        col("c.qualifier") :+ col("c.value"): _*)
  }

  /** Cell stream → wide DataFrame with the schema's types restored.
    * Output columns are named after each HColumn.source.
    */
  def fromCells(cells: DataFrame, schema: HTableSchema): DataFrame = {
    val picked = schema.columns.map { hc =>
      val v = first(
        when(col("family") === hc.family && col("qualifier") === hc.qualifier,
          col("value")), ignoreNulls = true)
      val nullBytes: Column = hc.dataType match {
        case StringType => hb.encode(lit(schema.nullLiteral))
        case _          => lit(Array.empty[Byte])
      }
      val decoded = when(v.isNull || v === nullBytes, lit(null))
        .otherwise(hb.decode(v, hc.dataType))
      decoded.as(hc.source)
    }
    cells.groupBy(col("rowkey")).agg(picked.head, picked.tail: _*)
  }

  /** Latest cell version per (rowkey, family, qualifier) — the bulkload's
    * values[values.length-1] pick (TsdbBulkload.java:135-137).
    */
  def latestVersion(cellsWithTs: DataFrame): DataFrame =
    cellsWithTs
      .groupBy(col("rowkey"), col("family"), col("qualifier"))
      .agg(max_by(col("value"), col("ts")).as("value"),
        max(col("ts")).as("ts"))

  /** Last `n` versions per (rowkey, family, qualifier), newest first —
    * the general form of the reference's versions map
    * (TsdbBulkload.java:120-155 explodes family → qualifier → versions;
    * HBase VERSIONS=n retention). Output adds `version_rank`
    * (1 = newest). A rank window over the cell key (high cardinality,
    * so partitions stay small and the shuffle is well spread); pass
    * `tieBreak` columns to totally order versions whose `ts` collide,
    * otherwise ties are broken arbitrarily.
    */
  def lastVersions(cellsWithTs: DataFrame, n: Int,
                   tieBreak: Seq[Column] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("rowkey"), col("family"), col("qualifier"))
      .orderBy(col("ts").desc +: tieBreak: _*)
    cellsWithTs
      .withColumn("version_rank", row_number().over(w).cast("long"))
      .filter(col("version_rank") <= n)
  }
}
