package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.model.HTableSchema

/** RowKind-driven upsert/delete mutation stream (SURVEY.md §2 B8) — the
  * reference's buffered sink semantics (HBaseSerde.java:119-173:
  * createPutMutation / createDeleteMutation, flush sizing per
  * HBaseWriteOptions).
  *
  * Insert/update rows explode into one PUT cell per mapped column;
  * delete rows collapse to a single row-delete marker. Flush batching
  * happens per partition with a bounded buffer, so sink memory is
  * O(maxMutations), not O(partition).
  */
object Mutations {

  val OpPut = "PUT"
  val OpDelete = "DELETE"

  /** Wide rows + a row-kind column ("I"/"U" upsert, "D" delete) →
    * mutation stream (rowkey, op, family, qualifier, value [, ts]).
    * Pass `tsCol` to carry an event-time column through — bulk-loaded
    * mutations need real timestamps (a Put or DeleteFamily marker at
    * ts=0 loses to / masks nothing in a live HBase table).
    */
  def toMutations(df: DataFrame, schema: HTableSchema,
                  rowKindCol: String = "row_kind",
                  tsCol: Option[String] = None): DataFrame = {
    val kind = upper(col(rowKindCol))
    val carry = tsCol.toSeq
    val tail = carry.map(col)
    val puts = Cells.toCells(
        df.filter(kind.isin("I", "U")).drop(rowKindCol), schema, carry)
      .select(col("rowkey") +: lit(OpPut).as("op") +: col("family") +:
        col("qualifier") +: col("value") +: tail: _*)
    val deletes = df.filter(kind === "D")
      .select(Cells.rowKey(schema).as("rowkey") +: lit(OpDelete).as("op") +:
        lit(null: String).as("family") +: lit(null: String).as("qualifier") +:
        lit(null: Array[Byte]).as("value") +: tail: _*)
    puts.unionByName(deletes)
  }

  /** Mutation stream → HFile-writable typed cell stream (composes B8
    * with B11): PUT cells pass through as Put-typed cells; a row DELETE
    * becomes one DeleteFamily marker per schema family — HBase's
    * row-delete representation — with empty qualifier/value, so the
    * whole upsert/delete stream can be bulk-loaded as delete-marker
    * HFiles instead of issued as online mutations. `tsCol` (produced by
    * [[toMutations]]'s tsCol) is carried through to both puts and
    * markers; always set it for real tables — ts=0 markers mask nothing.
    */
  def toTypedCells(mutations: DataFrame, schema: HTableSchema,
                   tsCol: Option[String] = None): DataFrame = {
    val tail = tsCol.toSeq.map(col)
    val puts = mutations.filter(col("op") === OpPut)
      .select(col("rowkey") +: col("family") +: col("qualifier") +:
        col("value") +:
        lit(graft.sources.HFile.KeyTypePut.toInt).as("key_type") +: tail: _*)
    val deletes = mutations.filter(col("op") === OpDelete)
      .select(col("rowkey") +:
        explode(typedLit(schema.families)).as("family") +:
        lit("").as("qualifier") +:
        lit(Array.emptyByteArray).as("value") +:
        lit(graft.sources.HFile.KeyTypeDeleteFamily.toInt).as("key_type") +:
        tail: _*)
    puts.unionByName(deletes)
  }

  /** Deliver the mutation stream to `flush` in rowkey-sorted batches of
    * at most `maxMutations` per call (the reference's
    * bufferFlushMaxMutations), partition-parallel. `flush` runs on
    * executors and must be serializable.
    */
  def flushBatches(mutations: DataFrame, maxMutations: Int)
                  (flush: Seq[Row] => Unit): Unit =
    mutations
      .sortWithinPartitions(col("rowkey"), col("family"), col("qualifier"))
      .foreachPartition { (rows: Iterator[Row]) =>
        rows.grouped(maxMutations).foreach(g => flush(g))
      }
}
