package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish skew: item 1 takes ~40% of the stream, 2 and 3 ~15% each,
    * the tail is spread over 500 distinct cold items — the shape the
    * sketch's mass guarantee (> n/(capacity+1) ⇒ present) binds on.
    */
  private def skewed(n: Int): Seq[Long] =
    (0 until n).map { i =>
      val r = i % 100
      if (r < 40) 1L
      else if (r < 55) 2L
      else if (r < 70) 3L
      else 1000L + (i % 500)
    }

  test("sketch guarantee: hot items present, count_lb a true lower bound " +
      "within n/(capacity+1), across any partitioning") {
    val n = 20000
    val data = skewed(n)
    val trueCounts = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 7, 32)) {
      val sk = data.toDF("x").repartition(parts)
        .agg(FreqItemsSketch(col("x"), 16).as("sk"))
        .head.getSeq[Row](0)
      val est = sk.map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(est.size <= 16)
      val slack = n / 17 + 1
      est.foreach { case (item, lb) =>
        val t = trueCounts(item)
        assert(lb <= t, s"count_lb $lb above true $t for $item")
        assert(t - lb <= slack, s"undercount ${t - lb} > $slack for $item")
      }
      // the mass guarantee: items 1, 2, 3 all clear n/17 — must be present
      assert(Seq(1L, 2L, 3L).forall(est.contains), s"parts=$parts: $est")
    }
  }

  test("sketch accepts INT keys (the common dimension-id type)") {
    val sk = (1 to 100).map(i => if (i % 2 == 0) 5 else i)
      .toDF("x")
      .agg(FreqItemsSketch(col("x"), 8).as("sk"))
      .head.getSeq[Row](0)
    assert(sk.exists(_.getLong(0) == 5L))
  }

  test("heavyHitters: sketch-then-refine equals exact on binding skew, " +
      "repartitioning-independent") {
    val events = skewed(20000).zipWithIndex.map { case (u, i) =>
      (i.toLong, u, s"t${i % 2}", 1.0)
    }.toDF("event_id", "user_id", "event_type", "value")
    val exact = graft.queries.Core.heavyHitters(events, k = 3)
      .collect().toSeq
    val approx = graft.queries.Core.heavyHitters(events, k = 3,
      approx = true, capacity = 16).collect().toSeq
    assert(approx == exact, s"approx $approx != exact $exact")
    val re = graft.queries.Core.heavyHitters(events.repartition(13),
      k = 3, approx = true, capacity = 16).collect().toSeq
    assert(re == exact)
  }
}
