package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join without an equi key.
  *
  * Stock Spark plans `p.ts >= i.start AND p.ts < i.end` as a
  * BroadcastNestedLoopJoin — O(|points| × |intervals|) comparisons,
  * which dies when the interval side outgrows a broadcast. Bucketing
  * converts it to an equi join: every interval explodes into the
  * fixed-width buckets it overlaps, every point maps to its bucket,
  * hash-join on bucket, then the exact predicate filters the bucket
  * false-positives. Work scales with
  * |points| + Σ(interval width / bucketWidth) and the join shuffles
  * hash-partitioned like any groupBy — no nested loop at any size.
  *
  * Pick `bucketMs` near the typical interval width: each interval then
  * lands in ~1-2 buckets and each point joins ~the intervals that
  * genuinely overlap its bucket.
  */
object RangeJoin {

  /** Inner-join points to every interval containing them
    * (`start <= ts < end`, all epoch-ms longs). Output: point columns +
    * interval columns, one row per (point, containing interval).
    *
    * Degenerate intervals (`end <= start`) contain no point and are
    * dropped up front — without the filter `sequence` would auto-step
    * -1 and emit spurious descending buckets. An interval spanning more
    * than `maxBucketsPerInterval` buckets fails the job with a clear
    * `raise_error` instead of overflowing sequence's array limit deep
    * inside a task: widen `bucketMs` rather than raising the cap.
    */
  def bucketed(points: DataFrame, pointTs: String,
               intervals: DataFrame, startCol: String, endCol: String,
               bucketMs: Long, maxBucketsPerInterval: Long = 1 << 20): DataFrame = {
    require(bucketMs > 0)
    val lo = floor(col(startCol) / bucketMs).cast("long")
    val hi = floor((col(endCol) - 1) / bucketMs).cast("long")
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_bucket", explode(sequence(lo,
        when(hi - lo < lit(maxBucketsPerInterval), hi).otherwise(
          raise_error(format_string(
            s"RangeJoin: interval [%s, %s) spans more than $maxBucketsPerInterval buckets of $bucketMs ms",
            col(startCol), col(endCol))).cast("long")))))
    val pt = points.withColumn("_bucket",
      floor(col(pointTs) / bucketMs).cast("long"))
    pt.join(iv, "_bucket")
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("_bucket")
  }
}
