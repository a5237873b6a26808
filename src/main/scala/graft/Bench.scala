package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: every SparkEntry query, wall seconds, ONE JSON line
  * on stdout for the driver to parse — and an artifact file rewritten
  * incrementally so a timeout still yields a parseable majority result.
  *
  * Isolation, the hard-won version. Rounds 4-6 showed in-suite timings
  * drifting up to ~1.6x of the same query's isolated cost; clearCache +
  * unpersist + GC between queries did not fix it, and a fresh
  * SparkContext per query in ONE JVM made it worse (51 contexts' worth
  * of heap churn, and `localCheckpoint`/persist blocks from a query's
  * own earlier runs degrade its later runs — ContextCleaner reclaims
  * them only after the old Dataset is GC'd, i.e. asynchronously). So
  * HEAVY queries (prior median >= 1.5 s, or no prior) each run in their
  * OWN FORKED JVM with 2 untimed warmups then median-of-3 timed runs,
  * cache cleared between runs — unchanged from rounds 7-15, so those
  * rows stay directly comparable across rounds.
  *
  * Round 16 wall-budget fix (the r15 driver artifact was rc=124 with
  * zero rows: 127 queries x fresh-JVM x 5 runs outgrew the harness
  * timeout): the ~100 SUB-second rows are fork-floor-dominated, where
  * per-query JVM isolation buys nothing and 5 runs oversample. Those
  * rows now run BATCHED (8 per forked JVM, alphabetical), 1 untimed
  * warmup + 2 timed runs, min of 2 reported (min suppresses one-off GC
  * noise at this duration; drift risk that motivated per-query forks
  * was only ever observed on multi-second rows). Cheap/heavy is decided
  * from the PRIOR round's committed bench_out.json — self-maintaining,
  * and a query with no prior defaults to the safe solo path. Batches
  * run FIRST so an early kill still covers most of the inventory; the
  * artifact file is rewritten after every fork and a shutdown hook
  * prints the partial JSON line if the final one never ran.
  */
object Bench {

  /** The cheap/heavy split (prior median under this many seconds runs
    * batched) and the batch size — ONE definition shared with
    * [[tools.BenchCalib]], so the calibration can never quietly
    * measure a different query population / batching than the
    * shipping fast path. */
  private[graft] val CheapPriorSec = 1.5
  private[graft] val CheapBatch = 8

  /** Optimizer rules excluded in every engine session (Bench, Verify,
    * specs). `InferFiltersFromGenerate` duplicates a generator's child
    * expression into a `size(e) > 0 AND isnotnull(e)` filter BELOW the
    * projection that computes it; every explode in this engine
    * generates from a COMPUTED kernel (shingle hashes, BPE ids, cell
    * structs — never a stored array column, so the inferred filter can
    * never reach a parquet scan), which made the most expensive
    * per-row expressions run twice per row in the scan stage.
    * Measured at sf0.1 (warm, per query): corpus_boilerplate −31%,
    * dedup_minhash_lsh −20%, text_top_terms −17%; no query regressed.
    * Results are unchanged by construction (optimizer rules are
    * semantics-preserving) and the full oracle suite pins it.
    */
  private[graft] val ExcludedOptimizerRules =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

  /** Fresh local session. Callers own the stop(). */
  def newSession(cpus: String): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules", ExcludedOptimizerRules)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def clearLeftovers(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  /** In-process measurement (the child side). `full = true`: 2 untimed
    * warmups then median of 3 timed runs (the round-7..15 protocol,
    * used for heavy rows and by [[tools.BenchScale]] so scale ratios
    * keep one methodology across factors). `full = false`: 1 warmup +
    * min of 2 — the batched sub-second path. Leftover cached/persisted
    * blocks are cleared between every run either way. None if any run
    * failed — a failed query must never be timed as a (fast) success;
    * that would make a broken round bench BETTER.
    */
  def timeQuery(name: String, fn: (SparkSession, String) => DataFrame,
                sfDir: String, spark: SparkSession,
                full: Boolean = true): Option[Double] = {
    val warmups = if (full) 2 else 1
    val runs = if (full) 3 else 2
    timeRuns(name, fn, sfDir, spark, warmups, runs).flatMap { times =>
      if (full) Some(times.sorted.apply(runs / 2))
      else if (times.max <= times.min * 1.5) Some(times.min)
      else {
        // bimodality guard (VERDICT r17 #6): the calibration found
        // min-of-2 == median-of-3 at the MEDIAN but p10 ~0.82 — when
        // the two runs disagree >1.5x the row is in a bimodal fork and
        // min-of-2 would commit its fast mode; one extra run + median
        // of 3 resolves it at negligible suite cost (few rows trip)
        Console.err.println(f"bench $name fast-path runs disagree " +
          f">1.5x (${times.min}%.3f vs ${times.max}%.3f) - running a " +
          "third, reporting median of 3")
        timeRuns(name, fn, sfDir, spark, warmups = 0, runs = 1)
          .map(extra => (times ++ extra).sorted.apply(1))
      }
    }
  }

  /** The raw timed-run vector behind [[timeQuery]] — the calibration
    * mode reads it directly so one batched session can report BOTH
    * statistics (min-of-2 and median-of-3) side by side.
    */
  def timeRuns(name: String, fn: (SparkSession, String) => DataFrame,
               sfDir: String, spark: SparkSession,
               warmups: Int, runs: Int): Option[Seq[Double]] = {
    var failed = false
    def once(): Double = {
      val t0 = System.nanoTime()
      // noop sink, NOT count(): count() lets Catalyst prune everything
      // the row count doesn't need — a final left join back to the
      // corpus on a unique aggregate key is eliminated outright (the
      // whole dedup subtree vanished from dedup_substring_trim's count
      // plan), aggregate FUNCTIONS are dropped (only group keys
      // survive), and pure per-row ops collapse to a zero-column scan.
      // The noop sink consumes every output column of every row.
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          Console.err.println(s"bench $name FAILED: ${e.getMessage}")
          failed = true
      }
      val t = (System.nanoTime() - t0) / 1e9
      clearLeftovers(spark)
      t
    }
    val warm = (1 to warmups).map(_ => once())
    if (failed) return None // don't burn timed runs on a broken query
    val times = (1 to runs).map(_ => once())
    Console.err.println(
      f"bench $name warm=${warm.map(t => f"$t%.3f").mkString(",")} " +
        f"runs=${times.map(t => f"$t%.3f").mkString(",")}")
    if (failed) None else Some(times)
  }

  /** Parent side: measure queries in a freshly forked JVM under the
    * SAME JVM configuration as this one — all parent input arguments
    * (heap sizing, GC choice, -XX: tuning, every -D system property,
    * module opens) are forwarded except flags that must not leak into a
    * child (debug/agent attachments, which would fight over ports or
    * pause the child). Returns per-query medians; a name absent from
    * the result failed (or the child died before reaching it).
    */
  def forkBatch(names: Seq[String], sfDir: String, cpus: String,
                full: Boolean): Map[String, Double] =
    forkBatchMode(names, sfDir, cpus, if (full) "full" else "fast")._1

  /** [[forkBatch]] with the child mode explicit; the second map is the
    * calibration statistic (median-of-3), non-empty only in "calib"
    * mode. */
  def forkBatchMode(names: Seq[String], sfDir: String, cpus: String,
                    mode: String)
      : (Map[String, Double], Map[String, Double]) = {
    import scala.sys.process._
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    def conflicts(a: String): Boolean =
      a.startsWith("-agentlib") || a.startsWith("-agentpath") ||
        a.startsWith("-javaagent") || a.startsWith("-Xdebug") ||
        a.startsWith("-Xrunjdwp") || a.startsWith("-XX:StartFlightRecording") ||
        // port- and file-binding flags would collide with the parent
        a.startsWith("-Dcom.sun.management.jmxremote") ||
        a.startsWith("-Xlog")
    val jvmArgs = {
      val in = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments
      val buf = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < in.size()) {
        val a = in.get(i)
        if (a == "--add-opens" && i + 1 < in.size()) {
          buf += a += in.get(i + 1); i += 2
        } else {
          if (!conflicts(a)) buf += a
          i += 1
        }
      }
      buf.toSeq
    }
    val cmd = Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", System.getProperty("java.class.path"),
        "graft.Bench", "--child", sfDir, cpus, mode, names.mkString(","))
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val code = Process(cmd).!(ProcessLogger(out += _, Console.err.println))
    if (code != 0)
      Console.err.println(s"bench child [${names.mkString(",")}] exit $code")
    (out.collect { case ChildResult(n, t) => n -> t.toDouble }.toMap,
      out.collect { case ChildCalib(n, t) => n -> t.toDouble }.toMap)
  }

  /** Single-query full-methodology fork — the round-7..15 shape, kept
    * for [[tools.BenchScale]] and heavy rows.
    */
  def forkQuery(name: String, sfDir: String, cpus: String): Option[Double] =
    forkBatch(Seq(name), sfDir, cpus, full = true).get(name)

  private val ChildResult = """CHILD_RESULT (\S+) ([0-9.]+)""".r
  private val ChildCalib = """CHILD_CALIB (\S+) ([0-9.]+)""".r

  private def childMain(sfDir: String, cpus: String, mode: String,
                        names: Seq[String]): Unit = {
    // an unrecognized mode must die loudly, not silently run the fast
    // methodology under a full-methodology caller's assumptions
    require(Set("full", "fast", "calib")(mode),
      s"unknown child mode '$mode' - want full|fast|calib")
    val spark = newSession(cpus)
    try names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      if (mode == "calib")
        // calibration shape (VERDICT r16 #4): batched like the fast
        // path (1 warmup) but THREE timed runs, reporting BOTH the
        // shipping statistic (min of the first two — exactly what the
        // fast path would have seen) and the median of all three
        timeRuns(name, fn, sfDir, spark, warmups = 1, runs = 3) match {
          case Some(ts) =>
            println(f"CHILD_RESULT $name ${ts.take(2).min}%.6f")
            println(f"CHILD_CALIB $name ${ts.sorted.apply(1)}%.6f")
          case None => println(s"CHILD_FAILED $name")
        }
      else timeQuery(name, fn, sfDir, spark, mode == "full") match {
        case Some(t) => println(f"CHILD_RESULT $name $t%.6f")
        case None    => println(s"CHILD_FAILED $name")
      }
    } finally spark.stop()
  }

  /** The fixed-work splitmix64 mixing kernel behind [[hostProbe]] —
    * pure integer ALU work, no allocation, no IO, so its wall time is
    * a deterministic function of the host core's speed alone. Returns
    * the accumulator so the JIT cannot dead-code the loop.
    */
  private def probeKernel(iters: Long, seed: Long): Long = {
    var x = seed
    var acc = 0L
    var i = 0L
    while (i < iters) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      acc ^= z ^ (z >>> 31)
      i += 1
    }
    acc
  }

  /** Iterations per probe run — sized for ~1 s single-thread on a
    * typical 2020s server core, long enough that scheduler jitter is
    * noise and short enough to be free next to a 129-query suite. */
  private[graft] val ProbeIters = 400000000L

  @volatile private var probeSink = 0L // defeats dead-code elimination
  /** Measured host-speed anchor committed with every bench artifact
    * (VERDICT r17 #2): the SAME fixed-iteration kernel, (a) on one
    * thread and (b) on `threads` concurrent threads (each running the
    * full iteration count — wall seconds then reflect sustained
    * all-core throughput, the regime the 32-thread query suite runs
    * in). Cross-round bench ratios divide by the probe ratio BEFORE
    * the 1.25x mover rule (tools/fold_bench.py), turning "the box is
    * ~1.2x slower this session" from a narrative derived off
    * untouched-row medians into arithmetic. Returns (single_sec,
    * multi_sec).
    */
  def hostProbe(threads: Int): (Double, Double) = {
    probeSink ^= probeKernel(ProbeIters / 10, 1L) // JIT warmup
    val t0 = System.nanoTime()
    probeSink ^= probeKernel(ProbeIters, 2L)
    val single = (System.nanoTime() - t0) / 1e9
    val accs = new java.util.concurrent.atomic.AtomicLong()
    val ts = (1 to threads).map { k =>
      new Thread(() => accs.getAndAdd(probeKernel(ProbeIters, k.toLong)))
    }
    val t1 = System.nanoTime()
    ts.foreach(_.start())
    ts.foreach(_.join())
    val multi = (System.nanoTime() - t1) / 1e9
    probeSink ^= accs.get()
    (single, multi)
  }

  /** Prior medians from the previous round's committed artifact — used
    * only to sort queries into the cheap-batched vs heavy-solo paths.
    * Absent/unreadable prior (or a query new this round) => solo.
    */
  private[graft] def loadPriors(path: String): Map[String, Double] =
    try {
      val text = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8)
      // Tolerate both this main's compact output and a re-serialized
      // (space-after-colon) committed copy of it.
      val obj = """"queries"\s*:\s*\{""".r.findFirstMatchIn(text)
      obj match {
        case None => Map.empty
        case Some(m) =>
          val body = text.substring(m.end, text.indexOf('}', m.end))
          """"([A-Za-z0-9_]+)"\s*:\s*([0-9.Ee+-]+)""".r.findAllMatchIn(body)
            .map(g => g.group(1) -> g.group(2).toDouble).toMap
      }
    } catch { case _: Throwable => Map.empty }

  def main(args: Array[String]): Unit = {
    if (args.length >= 1 && args(0) == "--child") {
      // a hand-invoked child missing an operand gets a usage line,
      // not an ArrayIndexOutOfBoundsException (the parent always
      // passes all five)
      require(args.length >= 5, "usage: --child <sfDir> <cpus> " +
        s"<full|fast|calib> <name[,name...]> - got ${args.length - 1} " +
        "operands")
      return childMain(args(1), args(2), args(3),
        args(4).split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // optional comma-separated filter for local iteration, e.g.
    // SPARK_GRAFT_ONLY=dedup_minhash_lsh,dedup_simhash
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val priors = loadPriors(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PRIOR", outFile))
    val selected = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val (cheap, heavy) = selected.partition(n =>
      priors.get(n).exists(_ < CheapPriorSec))
    val planned = cheap.size + heavy.size

    val methodology =
      "heavy rows (prior>=1.5s or new): per-query forked JVM, 2 warmups, " +
        "median of 3; sub-second rows: 8 per forked JVM, 1 warmup, min of 2 " +
        "(if the 2 disagree >1.5x: a 3rd run, median of 3 - bimodality " +
        "guard); inter-run cache clear throughout; artifact rewritten per " +
        "fork; host-speed probe (fixed-work splitmix64 kernel, 1 thread + " +
        "all threads) recorded per session"
    // the probe runs FIRST, in this (parent) JVM, before any Spark
    // session exists — a clean-machine anchor every artifact carries
    val probeThreads = cpus.toInt
    Console.err.println(s"bench: host probe ($probeThreads threads)...")
    val (probeSingle, probeMulti) = hostProbe(probeThreads)
    Console.err.println(
      f"bench: probe single=$probeSingle%.3fs multi=$probeMulti%.3fs")
    val probeJson =
      f"""{"kernel":"splitmix64","iters":$ProbeIters,"threads":$probeThreads,""" +
        f""""single_sec":$probeSingle%.4f,"multi_sec":$probeMulti%.4f}"""
    val lock = new Object
    val results = scala.collection.mutable.TreeMap[String, Double]()
    val failed = scala.collection.mutable.TreeSet[String]()
    @volatile var finalDone = false
    def render(partial: Boolean): String = lock.synchronized {
      // per-query seconds at 3 decimals (1 ms — below the noise floor of
      // any row here): the one-line JSON must stay small enough that the
      // driver's tail-buffer parse can never truncate it (the r17 PERF
      // diff was lost to exactly that). Measurement unchanged — only the
      // rendered precision. The total keeps full precision.
      val qs = results.toSeq
        .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
      val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      s"""{"metric":"total","value":${results.values.sum},"unit":"sec",""" +
        s""""action":"noop-sink write","queries":$qs,"failed":$failedJson,""" +
        s""""sf":"$sfDir","partial":$partial,"completed":${results.size + failed.size},""" +
        s""""planned":$planned,"probe":$probeJson,"methodology":"$methodology"}"""
    }
    def writeArtifact(partial: Boolean): Unit = lock.synchronized {
      // temp-file + ATOMIC_MOVE, serialized on the same lock the
      // shutdown hook takes: a SIGKILL mid-write (timeout -k, OOM
      // killer) or a hook racing an in-flight record() must never
      // leave the artifact torn mid-JSON — an unparseable file would
      // also break the next round's cheap/heavy prior split
      val json = render(partial)
      try {
        val out = java.nio.file.Paths.get(outFile)
        val tmp = java.nio.file.Paths.get(outFile + ".tmp")
        java.nio.file.Files.write(tmp,
          (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        java.nio.file.Files.move(tmp, out,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } catch { case e: Throwable =>
        Console.err.println(s"bench: could not write $outFile: ${e.getMessage}")
      }
    }
    // A driver timeout (SIGTERM) must still yield a parseable artifact:
    // r15's official bench arrived rc=124 with zero rows. The hook
    // prints whatever has finished so far as a partial JSON line.
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      if (!finalDone) { println(render(partial = true)); writeArtifact(partial = true) }
    }))

    def record(batch: Seq[String], got: Map[String, Double]): Seq[String] = {
      val missing = batch.filterNot(got.contains)
      lock.synchronized { results ++= got }
      writeArtifact(partial = true)
      missing
    }
    // Cheap batches first: max inventory coverage if the clock runs out.
    val retry = cheap.grouped(CheapBatch).toSeq.flatMap { batch =>
      record(batch, forkBatch(batch, sfDir, cpus, full = false))
    }
    // A name missing from its batch's output either failed or was
    // skipped because a batchmate killed the child JVM — re-run each
    // solo (full methodology) so one bad query can't erase 7 rows.
    (retry ++ heavy).foreach { name =>
      val got = forkBatch(Seq(name), sfDir, cpus, full = true)
      if (!got.contains(name)) lock.synchronized { failed += name }
      record(Seq(name), got)
    }
    finalDone = true
    println(render(partial = false))
    writeArtifact(partial = false)
  }
}
