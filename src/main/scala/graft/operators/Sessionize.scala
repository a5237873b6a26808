package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts whenever a key's
  * inter-event gap exceeds `gapMs`. Two stacked windows over ONE key
  * shuffle (lag → boundary flag → running sum), so the operator costs
  * the same as a single groupBy at any scale; there is no per-session
  * state beyond the window frame.
  *
  * Ordering must be total — pass a tiebreaker column (unique per key)
  * alongside the timestamp or session ids are nondeterministic.
  */
object Sessionize {

  /** Assign 1-based `session_idx` per key, ordered by (ts, tiebreak). */
  def assign(events: DataFrame, keyCol: String, tsCol: String,
             tiebreakCol: String, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsCol), 1).over(w)
    events
      .withColumn("_boundary",
        when(prev.isNull || col(tsCol) - prev > gapMs, 1).otherwise(0))
      .withColumn("session_idx", sum(col("_boundary")).over(cum))
      .drop("_boundary")
  }

  /** Per-session stats: event count, span, duration. */
  def stats(events: DataFrame, keyCol: String, tsCol: String,
            tiebreakCol: String, gapMs: Long): DataFrame =
    assign(events, keyCol, tsCol, tiebreakCol, gapMs)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ms"),
        max(col(tsCol)).as("end_ms"))
      .withColumn("duration_ms", col("end_ms") - col("start_ms"))
}
