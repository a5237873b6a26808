package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = sf("documents")

  test("hexThreshold quantizes fractions onto the 16-bit key space") {
    assert(Sampling.hexThreshold(0.0) == "0000")
    assert(Sampling.hexThreshold(0.5) == "8000")
    assert(Sampling.hexThreshold(0.8) == "cccc")
    // 1.0 must sort after every hex key, including "ffff..." prefixes
    assert(Sampling.hexThreshold(1.0) == "g")
    assert("ffff" < Sampling.hexThreshold(1.0))
  }

  test("split covers every row, is deterministic, and tracks weights") {
    val out = Sampling.deterministicSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val n = docs.count()
    assert(out.count() == n) // total preserved, no rounding gap
    val byName = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(byName.keySet == Set("train", "val", "test"))
    // 16-bit uniform key: expect ~binomial; allow wide tolerance at n=50
    assert(byName("train") > n / 2)
    // rerun is bit-identical
    val again = Sampling.deterministicSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("different seeds give different assignments") {
    val a = Sampling.deterministicSplit(docs, "doc_id",
      Seq("x" -> 0.5, "y" -> 0.5), seed = 1L)
    val b = Sampling.deterministicSplit(docs, "doc_id",
      Seq("x" -> 0.5, "y" -> 0.5), seed = 2L)
    assert(a.join(b, Seq("doc_id"))
      .filter(a("split") =!= b("split")).count() > 0)
  }

  test("stratified sample only keeps listed fractions per stratum") {
    val out = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0), default = 0.0)
    // en fully kept, every other stratum dropped
    val langs = out.select("lang").distinct().as[String].collect().toSet
    assert(langs == Set("en"))
    assert(out.count() == docs.filter($"lang" === "en").count())
  }

  test("mixture sample hits target proportions, binding stratum kept whole") {
    // 300 a / 120 b / 90 c with weights 1:1:3 -> binding stratum is c
    // (90/3 = 30 < 120/1 < 300/1): keep ~30 of a, ~30 of b, all 90 of c
    val rows = (0 until 300).map(i => (i.toLong, "a")) ++
      (1000 until 1120).map(i => (i.toLong, "b")) ++
      (2000 until 2090).map(i => (i.toLong, "c"))
    val df = rows.toDF("id", "src")
    val out = Sampling.mixtureSample(df, "id", "src",
      Seq("a" -> 1L, "b" -> 1L, "c" -> 3L), seed = 5L)
    val got = out.groupBy("src").count().as[(String, Long)].collect().toMap
    // binding stratum: exact (threshold == 1.0 keeps every row)
    assert(got("c") == 90L, s"got $got")
    // sampled strata: 16-bit-quantized Bernoulli around 30; the draw is
    // deterministic, the band only guards against formula regressions
    assert(got("a") > 15 && got("a") < 50, s"got $got")
    assert(got("b") > 15 && got("b") < 50, s"got $got")
    // deterministic replay and repartition-stability
    val again = Sampling.mixtureSample(df.repartition(7), "id", "src",
      Seq("a" -> 1L, "b" -> 1L, "c" -> 3L), seed = 5L)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
    // knownCounts path must reproduce the computed-counts run exactly
    val known = Sampling.mixtureSample(df, "id", "src",
      Seq("a" -> 1L, "b" -> 1L, "c" -> 3L), seed = 5L,
      knownCounts = Some(Map("a" -> 300L, "b" -> 120L, "c" -> 90L)))
    assert(out.except(known).isEmpty && known.except(out).isEmpty)
    // unlisted strata are dropped
    val dropped = Sampling.mixtureSample(df, "id", "src",
      Seq("a" -> 1L), seed = 5L)
    assert(dropped.select("src").distinct().as[String].collect().toSet
      == Set("a"))
  }

  test("split membership is stable under repartitioning") {
    val base = Sampling.deterministicSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.2)).select("doc_id", "split")
    val shuffled = Sampling.deterministicSplit(docs.repartition(13), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.2)).select("doc_id", "split")
    assert(base.except(shuffled).isEmpty && shuffled.except(base).isEmpty)
  }

  test("shuffle-shard: a bijective deal onto balanced, well-mixed shards") {
    val out = Sampling.shuffleShard(docs, "doc_id", shards = 8)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    val n = docs.count()
    assert(out.length == n, "every row assigned exactly once")
    // (shard, pos) is a bijection onto 0..n-1 dealt round-robin
    assert(out.map(r => r._2 + r._3 * 8).toSet == (0L until n).toSet)
    val sizes = out.groupBy(_._2).view.mapValues(_.size).values.toSeq
    assert(sizes.size == 8 && sizes.max - sizes.min <= 1,
      s"unbalanced shards: $sizes")
    // shuffled, not id order: consecutive ids land apart
    val shardOf = out.map(r => r._1 -> r._2).toMap
    val sameAsNext = (0L until n - 1)
      .count(i => shardOf(i) == shardOf(i + 1)).toDouble / (n - 1)
    assert(sameAsNext < 0.3, s"consecutive ids co-sharded $sameAsNext")
  }

  test("exportShards: per-shard files carry full rows in pos order, " +
      "balanced, covering the corpus exactly") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    Sampling.exportShards(docs, "doc_id", out, shards = 4, seed = 42L)
    val dirs = new java.io.File(out).listFiles
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(dirs.length == 4)
    val total = docs.count()
    val assign = Sampling.shuffleShard(docs, "doc_id", shards = 4,
      seed = 42L)
    var seenIds = Set.empty[Long]
    for (d <- dirs) {
      val k = d.getName.stripPrefix("shard=").toInt
      val rows = spark.read.parquet(d.toString)
      // full column set survives (+ pos), shard is the directory
      assert(rows.columns.toSet ==
        docs.columns.toSet + "pos")
      val got = rows.select("doc_id", "pos").as[(Long, Long)]
        .collect().toSeq
      // balanced deal: sizes differ by at most one
      assert(math.abs(got.size - total / 4.0) <= 1.0)
      // pos is exactly 0..m-1 and matches the C19 assignment
      assert(got.map(_._2).sorted == (0L until got.size.toLong))
      val expect = assign.filter(col("shard") === k)
        .select("doc_id", "pos").as[(Long, Long)].collect().toMap
      got.foreach { case (id, p) => assert(expect(id) == p) }
      // file order IS pos order: a loader needs no sort
      val inFileOrder = spark.read.parquet(d.toString)
        .select("pos").as[Long].collect().toSeq
      assert(inFileOrder == inFileOrder.sorted,
        s"shard $k rows not pos-ordered on disk")
      seenIds ++= got.map(_._1)
    }
    assert(seenIds.size.toLong == total)
  }

  test("shuffle-shard assignment is independent of input partitioning") {
    val base = Sampling.shuffleShard(docs, "doc_id", shards = 5)
    val repart = Sampling.shuffleShard(docs.repartition(13), "doc_id",
      shards = 5, numPartitions = 3)
    assert(base.except(repart).isEmpty && repart.except(base).isEmpty)
  }

  /** The naive single-window form of the budget rule — the semantics
    * [[Sampling.budgetSelect]]'s histogram-cutoff plan must reproduce
    * row for row.
    */
  private def naiveBudget(df: org.apache.spark.sql.DataFrame,
                          budget: Long, seed: Long) = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("s"))
      .orderBy(Sampling.hashKey(col("id"), seed), col("id"))
    df.withColumn("cum", sum(col("w")).over(win))
      .filter(col("cum") - col("w") < budget)
      .select("id", "s", "w")
  }

  test("budgetSelect matches the naive global window row for row") {
    // 400 rows, 3 strata, varied weights — boundary buckets land
    // differently per stratum
    val df = spark.range(0, 400)
      .select(col("id"), concat(lit("s"), pmod(col("id"), lit(3)))
        .as("s"), (pmod(col("id"), lit(7)) + 1).as("w"))
    for (budget <- Seq(5L, 50L, 170L, 100000L)) {
      val got = Sampling.budgetSelect(df, "id", "s", "w", budget)
        .as[(Long, String, Long)].collect().toSet
      val want = naiveBudget(df, budget, 42L)
        .as[(Long, String, Long)].collect().toSet
      assert(got == want, s"budget=$budget: " +
        s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    }
  }

  test("budgetSelect includes the crossing doc and drops the rest") {
    val df = spark.range(0, 100)
      .select(col("id"), lit("x").as("s"), lit(10L).as("w"))
    val out = Sampling.budgetSelect(df, "id", "s", "w", budget = 55L)
      .as[(Long, String, Long)].collect()
    // 10-token docs against a 55 budget: 5 docs fit under it and the
    // 6th crosses the line — greedy keeps exactly 6
    assert(out.length == 6)
    // a stratum under budget keeps everything
    val all = Sampling.budgetSelect(df, "id", "s", "w", budget = 100000L)
    assert(all.count() == 100)
  }

  test("budgetSelect is independent of input partitioning") {
    val df = spark.range(0, 300)
      .select(col("id"), concat(lit("s"), pmod(col("id"), lit(4)))
        .as("s"), (pmod(col("id"), lit(5)) + 1).as("w"))
    val a = Sampling.budgetSelect(df, "id", "s", "w", 80L)
    val b = Sampling.budgetSelect(df.repartition(17), "id", "s", "w", 80L)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("interleaveOrder: closed-form positions equal the naive " +
      "double-window rank, including cross-stratum key ties") {
    import org.apache.spark.sql.expressions.Window
    // equal weights force key ties at EVERY rank (K = 2r-1 for both),
    // the third stratum stresses the unequal-stride interleave; sizes
    // deliberately unequal so the n_s' caps bind
    val weights = Seq("a" -> 2, "b" -> 2, "c" -> 3)
    val df = spark.range(0, 211)
      .select(col("id"),
        element_at(array(lit("a"), lit("b"), lit("c"), lit("zzz")),
          (pmod(col("id"), lit(7)) % 4 + 1).cast("int")).as("s"))
    val out = Sampling.interleaveOrder(df, "id", "s", weights,
        seed = 9L, numPartitions = 5)
      .as[(Long, Long, String)].collect().sortBy(_._1)
    // weightless stratum rows are dropped, everything else is kept
    val kept = df.filter(col("s") =!= "zzz").count()
    assert(out.length == kept && !out.exists(_._3 == "zzz"))
    // ord is a permutation of 0..n-1
    assert(out.map(_._1).toSeq == (0L until kept).toSeq)
    // naive replay: rank within stratum, exact key, global double rank
    val L = 6L
    val wcol = when(col("s") === "a", 2L).when(col("s") === "b", 2L)
      .otherwise(3L)
    val r = df.filter(col("s") =!= "zzz")
      .withColumn("_k", Sampling.hashKey(col("id"), 9L))
      .withColumn("r", row_number().over(
        Window.partitionBy("s").orderBy(col("_k"), col("id"))))
      .withColumn("key", (lit(2L) * col("r") - 1L) * (lit(L) / wcol)
        .cast("long"))
      .withColumn("ord", row_number().over(
        Window.orderBy(col("key"), col("s"), col("id"))) - 1L)
      .select(col("ord"), col("id"), col("s"))
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == r.toSeq,
      "closed form must equal the naive double-window order")
    // proportionality: in a long prefix the 2:2:3 weights hold ±1 slot
    // per L-window; check a loose global bound on the first 140 rows
    val prefix = out.take(140).groupBy(_._3).view.mapValues(_.length)
    assert(math.abs(prefix("a") - 40) <= 6 &&
      math.abs(prefix("c") - 60) <= 6, s"prefix shares: $prefix")
  }

  test("annealOrder: positions equal the naive per-phase replay, phase " +
      "windows follow the cumulative-floor rule, blocks are contiguous, " +
      "leftovers and unweighted sources drop") {
    import org.apache.spark.sql.expressions.Window
    // same tie-stressed fixture as interleaveOrder's spec; phase 2
    // re-weights a and c only (b's second half is LEFTOVER), and its
    // equal-K ties stress the cross-stratum tie-break inside a phase
    val df = spark.range(0, 211)
      .select(col("id"),
        element_at(array(lit("a"), lit("b"), lit("c"), lit("zzz")),
          (pmod(col("id"), lit(7)) % 4 + 1).cast("int")).as("s"))
    val phases = Seq(
      Sampling.AnnealPhase("warm", Seq("a" -> 2, "b" -> 2, "c" -> 3),
        Map("a" -> 0.6, "b" -> 0.5, "c" -> 0.7)),
      Sampling.AnnealPhase("anneal", Seq("a" -> 1, "c" -> 3),
        Map("a" -> 0.4, "c" -> 0.2)))
    val out = Sampling.annealOrder(df, "id", "s", phases, seed = 9L,
        numPartitions = 5)
      .as[(Long, Long, String, String)].collect().sortBy(_._1)
    assert(!out.exists(_._3 == "zzz"), "unweighted source must drop")
    // driver replay: rank within source on (hashKey, id), boundaries
    // b_k = floor(cumFrac * n_s), phase k consumes ranks (b_{k-1}, b_k]
    val ranked = df.filter(col("s").isin("a", "b", "c"))
      .withColumn("_k", Sampling.hashKey(col("id"), 9L))
      .withColumn("r", row_number().over(
        Window.partitionBy("s").orderBy(col("_k"), col("id"))))
      .select("id", "s", "r")
      .as[(Long, String, Int)].collect()
    val ns = ranked.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    def bound(s: String, cum: Double) = // exact decimal, like the engine
      math.min(ns(s), (BigDecimal(cum.toString) * ns(s))
        .setScale(0, BigDecimal.RoundingMode.FLOOR).toLong)
    val b1 = Map("a" -> bound("a", 0.6), "b" -> bound("b", 0.5),
      "c" -> bound("c", 0.7))
    val b2 = Map("a" -> bound("a", 1.0), "c" -> bound("c", 0.9))
    val m1 = Map("a" -> 3L, "b" -> 3L, "c" -> 2L) // L=6 over 2:2:3
    val m2 = Map("a" -> 3L, "c" -> 1L)            // L=3 over 1:3
    val expected = ranked.flatMap { case (id, s, r) =>
      if (r <= b1(s))
        Some((0, (2L * r - 1) * m1(s), s, id))
      else if (b2.contains(s) && r <= b2(s))
        Some((1, (2L * (r - b1(s)) - 1) * m2(s), s, id))
      else None
    }.sortBy(t => (t._1, t._2, t._3))
      .zipWithIndex
      .map { case ((k, _, s, id), i) =>
        (i.toLong, id, s, if (k == 0) "warm" else "anneal") }
    assert(out.toSeq == expected.toSeq,
      "closed form must equal the naive per-phase double-window order")
    // dense positions, contiguous phase blocks, leftovers dropped
    assert(out.map(_._1).toSeq == (0L until expected.length).toSeq)
    val warmMax = out.filter(_._4 == "warm").map(_._1).max
    val annealMin = out.filter(_._4 == "anneal").map(_._1).min
    assert(warmMax < annealMin, "phase blocks must be contiguous")
    assert(!out.exists(t => t._4 == "anneal" && t._3 == "b"),
      "b is unweighted in phase 2")
    assert(out.count(_._3 == "b") == b1("b"),
      "b's second half is leftover and must drop")
    // every source's phase-1 rows are exactly its first b1 ranks
    val warmIds = out.filter(t => t._4 == "warm" && t._3 == "a")
      .map(_._2).toSet
    val firstRanksA = ranked.filter(t => t._2 == "a" && t._3 <= b1("a"))
      .map(_._1).toSet
    assert(warmIds == firstRanksA,
      "phase-1 window must be the source's first b1 ranks")
  }
}
