package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(
    (1L, 50L), (2L, 100L), (3L, 150L), (4L, 199L), (5L, 200L), (6L, 999L)
  ).toDF("pid", "ts")

  private val intervals = Seq(
    (10L, 100L, 200L),  // [100, 200)
    (11L, 0L, 60L),     // [0, 60)
    (12L, 150L, 1000L)  // [150, 1000) — spans many buckets
  ).toDF("iid", "lo", "hi")

  test("bucketed equals the naive range join") {
    val bucketed = RangeJoin
      .bucketed(points, "ts", intervals, "lo", "hi", bucketMs = 64)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals,
        col("ts") >= col("lo") && col("ts") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(bucketed == naive)
    assert(naive == Set((1L, 11L), (2L, 10L), (3L, 10L), (3L, 12L),
      (4L, 10L), (4L, 12L), (5L, 12L), (6L, 12L)))
  }

  test("degenerate intervals (end <= start) are dropped, not exploded") {
    val bad = Seq((20L, 500L, 500L), (21L, 300L, 100L)).toDF("iid", "lo", "hi")
    val out = RangeJoin.bucketed(points, "ts", intervals.unionAll(bad),
      "lo", "hi", bucketMs = 64)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    // identical to the result without the degenerate intervals
    assert(out.forall(_._2 < 20L) && out.size == 8)
  }

  test("an interval wider than the bucket cap fails loudly") {
    val wide = Seq((30L, 0L, 1000000L)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.bucketed(points, "ts", wide, "lo", "hi",
        bucketMs = 1, maxBucketsPerInterval = 100).count()
    }
    assert(ex.getMessage.contains("RangeJoin") ||
      Option(ex.getCause).exists(_.getMessage.contains("RangeJoin")))
  }

  test("plan: equi hash join on bucket, no nested loop") {
    val out = RangeJoin.bucketed(points, "ts", intervals, "lo", "hi", 64)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
