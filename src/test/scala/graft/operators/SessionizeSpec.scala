package graft.operators

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("gap threshold splits sessions; first event always opens one") {
    val events = Seq(
      ("u1", 0L, 1L), ("u1", 100L, 2L), ("u1", 5000L, 3L), // gap 4900 > 1000
      ("u1", 5100L, 4L),
      ("u2", 50L, 5L)
    ).toDF("user", "ts", "eid")
    val out = Sessionize.assign(events, "user", "ts", "eid", gapMs = 1000L)
      .orderBy("user", "ts")
      .select("user", "eid", "session_idx")
      .as[(String, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("u1", 1L, 1L), ("u1", 2L, 1L), ("u1", 3L, 2L), ("u1", 4L, 2L),
      ("u2", 5L, 1L)))
  }

  test("stats: counts, spans, durations per session") {
    val events = Seq(
      ("u1", 0L, 1L), ("u1", 400L, 2L), ("u1", 9000L, 3L)
    ).toDF("user", "ts", "eid")
    val out = Sessionize.stats(events, "user", "ts", "eid", gapMs = 1000L)
      .orderBy("session_idx").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2)
    assert(out(0).getAs[Long]("duration_ms") == 400L)
    assert(out(1).getAs[Long]("n_events") == 1)
    assert(out(1).getAs[Long]("duration_ms") == 0L)
  }
}
