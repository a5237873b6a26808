package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq(
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0)
  ).toDF("sym", "qts", "px")

  private val trades = Seq(
    ("A", 5L), ("A", 10L), ("A", 25L), ("A", 99L),
    ("B", 14L), ("C", 50L)
  ).toDF("sym", "tts")

  test("latest right row at/before left ts, per key; null when none") {
    val out = AsOfJoin.asOf(trades, "sym", "tts", quotes, "sym", "qts")
      .orderBy("sym", "tts")
      .select("sym", "tts", "qts", "px")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      ("A", 5L, None, None),            // before first quote
      ("A", 10L, Some(10L), Some(1.0)), // inclusive: same-ts quote visible
      ("A", 25L, Some(20L), Some(2.0)),
      ("A", 99L, Some(30L), Some(3.0)),
      ("B", 14L, None, None),           // B's quote is later
      ("C", 50L, None, None)))          // key with no right rows
  }

  test("right payload columns colliding with left names get right_ prefix") {
    // right side also calls its timestamp column "tts" (and carries "px")
    val rightClash = quotes.withColumnRenamed("qts", "tts")
    val out = AsOfJoin.asOf(trades, "sym", "tts", rightClash, "sym", "tts")
    assert(out.columns.toSeq == Seq("sym", "tts", "right_tts", "px"))
    val row = out.orderBy("sym", "tts").filter("tts = 25").collect().head
    assert(row.getLong(1) == 25L && row.getLong(2) == 20L &&
      row.getDouble(3) == 2.0)
  }

  test("plan: one shuffle on the key, no crossjoin") {
    val out = AsOfJoin.asOf(trades, "sym", "tts", quotes, "sym", "qts")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // single key-hash exchange feeding the window
    assert("hashpartitioning\\(_k".r.findAllIn(plan).size == 1, plan)
  }
}
