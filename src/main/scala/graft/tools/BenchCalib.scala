package graft.tools

import java.io.{File, PrintWriter}

import graft.Bench

/** One-round calibration of the batched sub-second bench statistic
  * (VERDICT r16 #4): the round-16 wall-budget protocol moved ~100
  * cheap rows from per-query forks + median-of-3 to batched 8-per-JVM
  * + min-of-2 — correct for the budget, but (a) min ≤ median biases
  * cheap rows slightly fast vs the historical statistic, and (b) the
  * in-suite-drift risk that forced round 7's per-query forks was only
  * ever OBSERVED on multi-second rows, never re-measured for batched
  * sub-second rows. This main pins both questions once:
  *
  *   1. `min2` vs `med3` SIDE BY SIDE from the SAME batched session
  *      (Bench's "calib" child mode: 1 warmup, 3 timed runs — min of
  *      the first two is bit-exactly what the shipping fast path
  *      would report) for every cheap row;
  *   2. `solo` (per-query forked JVM, 2 warmups, median-of-3 — the
  *      round-7..15 methodology) for a fixed sample, so batched-vs-
  *      solo agreement is measured at this duration class.
  *
  * Output: one JSON object at `outPath` — per row {min2, med3
  * [, solo]} plus the two agreement summaries. The fold step embeds
  * it into BENCH_r{N}_runs.json as the committed calibration table.
  *
  * usage: runMain graft.tools.BenchCalib [outPath]
  *   SPARK_GRAFT_SF_DIR        data dir     (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS          threads      (default 32)
  *   SPARK_GRAFT_BENCH_PRIOR   committed bench_out.json for the
  *                             cheap/heavy split (default bench_out.json)
  *   SPARK_GRAFT_SOLO_SAMPLE   comma-separated solo-sample override
  */
object BenchCalib {
  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("/tmp/bench_calib.json")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val priors = Bench.loadPriors(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PRIOR", "bench_out.json"))
    val cheap = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => priors.get(n).exists(_ < Bench.CheapPriorSec))
    require(cheap.nonEmpty, "no cheap rows under the prior artifact - " +
      "set SPARK_GRAFT_BENCH_PRIOR to a committed bench_out.json")
    // deterministic ~10-row solo sample spanning the cheap duration
    // range: every ceil(n/10)-th row of the prior-sorted list
    val soloSample: Seq[String] = sys.env.get("SPARK_GRAFT_SOLO_SAMPLE")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse {
        val byPrior = cheap.sortBy(priors)
        val step = math.max(1, (byPrior.size + 9) / 10)
        byPrior.grouped(step).map(_.head).toSeq
      }

    val min2 = scala.collection.mutable.Map[String, Double]()
    val med3 = scala.collection.mutable.Map[String, Double]()
    cheap.grouped(Bench.CheapBatch).foreach { batch =>
      val (m2, m3) = Bench.forkBatchMode(batch, sfDir, cpus, "calib")
      min2 ++= m2; med3 ++= m3
      Console.err.println(s"calib batch done: ${batch.mkString(",")}")
    }
    val solo = scala.collection.mutable.Map[String, Double]()
    soloSample.foreach { n =>
      Bench.forkBatch(Seq(n), sfDir, cpus, full = true).get(n)
        .foreach(solo(n) = _)
      Console.err.println(s"calib solo done: $n")
    }

    // an empty pair set (every sample row failed) must emit JSON null,
    // never a bare NaN — `%.4f` on NaN would render invalid JSON and
    // block the whole fold step downstream. (median, min, max): for
    // min2/med3 the ratio is <= 1 BY CONSTRUCTION (min of 2 <= median
    // of the same 3), so the worst-case fast bias of the shipping
    // statistic is the MIN, not the max — the max is pinned at 1.0 and
    // reading it as "bias zero" misreads the table (ADVICE r17).
    def ratios(pairs: Seq[(Double, Double)])
        : (String, String, String) =
      if (pairs.isEmpty) ("null", "null", "null")
      else {
        val rs = pairs.map { case (a, b) => a / b }.sorted
        (f"${rs(rs.size / 2)}%.4f", f"${rs.head}%.4f", f"${rs.last}%.4f")
      }
    val both = cheap.filter(n => min2.contains(n) && med3.contains(n))
    val (mmMed, mmMin, mmMax) = ratios(both.map(n => (min2(n), med3(n))))
    val soloBoth = soloSample.filter(n =>
      min2.contains(n) && solo.contains(n))
    val (bsMed, bsMin, bsMax) = ratios(soloBoth.map(n => (min2(n), solo(n))))

    val rows = cheap.filter(min2.contains).map { n =>
      val soloPart = solo.get(n)
        .map(s => f""","solo":$s%.6f""").getOrElse("")
      f""""$n":{"min2":${min2(n)}%.6f,"med3":${med3(n)}%.6f$soloPart}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"protocol":"calib batched 8/JVM, 1 warmup, 3 timed runs: min2 = shipping fast-path statistic (min of first 2), med3 = median of 3; solo = per-query fork, 2 warmups, median of 3 (round-7..15 methodology)",""" +
        s""""sf":"$sfDir","rows":$rows,""" +
        // min2_over_med3_min is THE headline bias stat: min2 <= med3 by
        // construction, so the max is always 1.0 and only the min (the
        // worst fast-bias row) carries information
        s""""min2_over_med3_median":$mmMed,"min2_over_med3_min":$mmMin,""" +
        s""""min2_over_med3_max":$mmMax,""" +
        s""""min2_over_solo_median":$bsMed,"min2_over_solo_min":$bsMin,""" +
        s""""min2_over_solo_max":$bsMax,""" +
        s""""solo_sample":${soloSample.map("\"" + _ + "\"").mkString("[", ",", "]")}}"""
    val pw = new PrintWriter(new File(outPath))
    try pw.println(json) finally pw.close()
    println(json)
  }
}
