package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Point-in-time (as-of) join: for each left row, the latest right row
  * with the same key and `rightTs <= leftTs` (inclusive, like DuckDB's
  * ASOF JOIN and HBase's versioned-cell lookup `Get.setTimeRange` — the
  * reference's point-GET returns the newest cell version at/before a
  * timestamp, HBaseSerde.java / HBaseRowDataLookupFunction.java).
  *
  * Spark has no native as-of join; the standard crossjoin+filter+rank
  * formulation explodes at scale. This implementation tags both sides,
  * unions them, and forward-fills the right payload with
  * `last(ignoreNulls)` over a (key, ts, side) window: ONE shuffle on
  * the join key, per-row O(1) state, no range explosion — the plan
  * scales like a groupBy, and AQE skew-split applies to hot keys.
  *
  * Right rows must be unique per (key, ts) — pre-aggregate ties first,
  * or the fill picks an arbitrary one.
  *
  * Output = all left columns + right payload columns; a right payload
  * column whose name collides with a left column (or with an
  * already-assigned output name) is prefixed `right_` repeatedly until
  * unique, so the result never contains ambiguous duplicates.
  */
object AsOfJoin {

  def asOf(left: DataFrame, leftKey: String, leftTs: String,
           right: DataFrame, rightKey: String, rightTs: String): DataFrame = {
    val rPayloadCols = right.columns.filterNot(_ == rightKey).toSeq
    // prefix until the name is absent from BOTH the left columns and the
    // output names assigned so far (left may itself contain right_<name>,
    // and the right side may carry both x and right_x)
    val usedNames = scala.collection.mutable.Set(left.columns.toSeq: _*)
    val rOutNames = rPayloadCols.map { c =>
      var n = c
      while (usedNames.contains(n)) n = s"right_$n"
      usedNames += n
      n
    }
    val rOutName: Map[String, String] = rPayloadCols.zip(rOutNames).toMap
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields.filter(f => rPayloadCols.contains(f.name)))
    val lPrep = left.select(
      col(leftKey).as("_k"), col(leftTs).cast("long").as("_ts"),
      lit(1).as("_side"),
      struct(left.columns.map(col).toSeq: _*).as("_left"),
      lit(null).cast(rType).as("_right"))
    // SQL join semantics: a NULL key matches nothing — dropping NULL-key
    // right rows up front means NULL-key left rows (which share the NULL
    // window partition) see no fill and emit null payload, exactly like
    // DuckDB's ASOF JOIN, instead of matching each other
    val rPrep = right.filter(col(rightKey).isNotNull).select(
      col(rightKey).as("_k"), col(rightTs).cast("long").as("_ts"),
      lit(0).as("_side"),
      lit(null).cast(lType).as("_left"),
      struct(rPayloadCols.map(col): _*).as("_right"))
    // right sorts before left at equal ts => a same-timestamp right row
    // is visible to the left row (inclusive bound)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lPrep.unionByName(rPrep)
      .withColumn("_fill", last(col("_right"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val outCols = left.columns.map(c => col(s"_left.$c").as(c)).toSeq ++
      rPayloadCols.map(c => col(s"_fill.$c").as(rOutName(c)))
    filled.select(outCols: _*)
  }
}
