package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, countDistinct}

/** Core-query scale-path checks not covered by the DuckDB oracle. */
class CoreSpec extends SparkSpec {

  test("rollupPercentiles approx mode is rank-accurate within 1%") {
    // approx_percentile guarantees a value whose RANK is within
    // 1/accuracy of the requested quantile (it returns an actual sample,
    // not an interpolation, so value-space tolerance is meaningless when
    // samples are sparse) — assert the rank guarantee with 100× headroom
    val events = sf("events")
    val approx = Core.rollupPercentiles(events, exact = false).collect()
      .map(r => r.getString(0) ->
        Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val valuesByType = events.selectExpr("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        t -> rs.map(_.getDouble(1)).sorted
      }
    assert(approx.keySet == valuesByType.keySet)
    val ps = Seq(0.5, 0.9, 0.95, 0.99)
    approx.foreach { case (tpe, vals) =>
      val sorted = valuesByType(tpe)
      ps.zip(vals).foreach { case (p, a) =>
        val rank = sorted.count(_ <= a).toDouble / sorted.length
        assert(math.abs(rank - p) <= 0.01,
          s"$tpe p$p approx=$a has rank $rank")
      }
    }
  }

  test("rollupPercentiles approx mode keeps counts and schema") {
    val out = Core.rollupPercentiles(sf("events"), exact = false)
    assert(out.columns.toSeq ==
      Seq("event_type", "n_events", "p50", "p90", "p95", "p99"))
    assert(out.collect().map(_.getLong(1)).sum == sf("events").count())
  }

  test("rollupDistinct approx (HLL++) is within 5% of exact") {
    val events = sf("events")
    val exact = Core.rollupDistinct(events).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val approx = Core.rollupDistinct(events, exact = false).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (tpe, n) =>
      val a = approx(tpe)
      assert(math.abs(a - n).toDouble / n <= 0.05, s"$tpe exact=$n approx=$a")
    }
  }

  test("latestEventPerUser picks the (ts, event_id)-max event per user") {
    val events = sf("events")
    val out = Core.latestEventPerUser(events).collect()
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    // cross-check one user against a driver-side reduction
    val u = out.head.getLong(0)
    val expected = events.filter(s"user_id = $u")
      .selectExpr("event_id", "event_type", "value", "ts DIV 1000000 AS ts_ms")
      .collect()
      .maxBy(r => (r.getLong(3), r.getLong(0)))
    val got = out.find(_.getLong(0) == u).get
    assert(got.getLong(1) == expected.getLong(0))
    assert(got.getLong(4) == expected.getLong(3))
  }

  test("rollupIncremental merge is bit-identical to a full recompute") {
    val events = sf("events")
    // derive a cutoff that provably splits one (hour, type) group into
    // two partial rows — strictly between that group's first and last
    // event — so the merge path is exercised, not just a disjoint union
    val g = events
      .selectExpr("((ts DIV 1000000) DIV 3600000) * 3600000 AS h",
        "event_type", "ts DIV 1000000 AS ts_ms")
      .groupBy("h", "event_type")
      .agg(org.apache.spark.sql.functions.min(col("ts_ms")).as("lo"),
        org.apache.spark.sql.functions.max(col("ts_ms")).as("hi"))
      .filter(col("lo") < col("hi"))
      .head()
    val cutoffMs = g.getAs[Long]("hi") // first slice gets lo..hi-1
    // the boundary hour appears in BOTH slices: two partial rows merge
    val boundaryShared = events
      .selectExpr(s"((ts DIV 1000000) DIV 3600000) * 3600000 AS h",
        "event_type", s"ts DIV 1000000 < $cutoffMs AS pre")
      .groupBy("h", "event_type")
      .agg(countDistinct(col("pre")).as("sides"))
      .filter(col("sides") === 2).count()
    assert(boundaryShared > 0, "no (hour, type) key straddles the cutoff")
    val inc = Core.rollupIncremental(events, cutoffMs).collect()
    val full = Core.rollup(events, "hour").collect()
    assert(inc.length == full.length)
    inc.zip(full).foreach { case (a, b) =>
      assert(a == b, s"incremental row $a != full row $b")
    }
  }

  test("rollupAnomaly flags an injected spike, keeps a steady series " +
      "quiet, and is exact on a crafted variance boundary") {
    import spark.implicits._
    val hour = 3600000L
    // steady series: 25 hours of ~constant count with one 10x spike at
    // the end; quiet series: perfectly flat
    def mk(tpe: String, counts: Seq[Int]): Seq[(Long, String)] =
      counts.zipWithIndex.flatMap { case (c, h) =>
        (0 until c).map(i => (h * hour * 1000000L + i, tpe))
      }
    val spikey = mk("spike", Seq.fill(24)(5) :+ 50)
    val flat = mk("flat", Seq.fill(25)(5))
    // drift: counts 1..25 — last point is within 3 sigma of the ramp
    val ramp = mk("ramp", (1 to 25))
    val events = (spikey ++ flat ++ ramp).toDF("ts", "event_type")
    val got = Core.rollupAnomaly(events).collect()
    val byType = got.groupBy(_.getAs[String]("event_type"))
    assert(byType.contains("spike"), s"spike not flagged: ${got.toSeq}")
    val s = byType("spike").head
    assert(s.getAs[Long]("cnt") == 50 && s.getAs[Long]("mean_milli") == 5000)
    assert(!byType.contains("flat"), "flat series must stay quiet")
    // flat-base + deviation edge: variance 0 means ANY dev flags
    val flatDev = mk("flatdev", Seq.fill(24)(5) :+ 6)
    val got2 = Core.rollupAnomaly(flatDev.toDF("ts", "event_type")).collect()
    assert(got2.exists(r => r.getAs[String]("event_type") == "flatdev" &&
      r.getAs[Long]("cnt") == 6), "zero-variance base must flag any dev")
  }
}
