package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: every SparkEntry query, median-of-3 wall seconds, ONE
  * JSON line on stdout for the driver to parse.
  *
  * Isolation, the hard-won version. Rounds 4-6 showed in-suite timings
  * drifting up to ~1.6x of the same query's isolated cost; clearCache +
  * unpersist + GC between queries did not fix it, and a fresh
  * SparkContext per query in ONE JVM made it worse (51 contexts' worth
  * of heap churn, and `localCheckpoint`/persist blocks from a query's
  * own earlier runs degrade its later runs — ContextCleaner reclaims
  * them only after the old Dataset is GC'd, i.e. asynchronously). So:
  *
  *   - each query runs in its OWN FORKED JVM (fresh heap, fresh
  *     context): an in-suite number IS an isolated number by
  *     construction, whatever ran before it;
  *   - inside the child, untimed warmup runs absorb JIT / codegen /
  *     parquet-footer / fixture-build cost, then 3 timed runs with
  *     cache + persisted blocks cleared BETWEEN runs, so run N's leaked
  *     blocks can't tax run N+1. Median of 3 reported.
  *
  * This measures warm steady-state latency per query — the quantity
  * that is stable run-to-run and comparable round-to-round.
  */
object Bench {

  /** Fresh local session. Callers own the stop(). */
  def newSession(cpus: String): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
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

  /** In-process measurement (the child side): `warmups` untimed runs,
    * then 3 timed runs with leftover cached/persisted blocks cleared
    * between them; median of the 3, or None if any run failed — a
    * failed query must never be timed as a (fast) success; that would
    * make a broken round bench BETTER.
    */
  def timeQuery(name: String, fn: (SparkSession, String) => DataFrame,
                sfDir: String, spark: SparkSession,
                warmups: Int = 2): Option[Double] = {
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
      (System.nanoTime() - t0) / 1e9
    }
    val warm = (1 to warmups).map { _ =>
      val t = once(); clearLeftovers(spark); t
    }
    val times = (1 to 3).map { _ =>
      val t = once(); clearLeftovers(spark); t
    }
    Console.err.println(
      f"bench $name warm=${warm.map(t => f"$t%.3f").mkString(",")} " +
        f"runs=${times.map(t => f"$t%.3f").mkString(",")}")
    if (failed) None else Some(times.sorted.apply(1))
  }

  /** Parent side: measure one query in a freshly forked JVM under the
    * SAME JVM configuration as this one — all parent input arguments
    * (heap sizing, GC choice, -XX: tuning, every -D system property,
    * module opens) are forwarded except flags that must not leak into a
    * child (debug/agent attachments, which would fight over ports or
    * pause the child). Returns the child's median, or None on failure.
    */
  def forkQuery(name: String, sfDir: String, cpus: String): Option[Double] = {
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
        "graft.Bench", "--child", name, sfDir, cpus)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val code = Process(cmd).!(ProcessLogger(out += _, Console.err.println))
    if (code != 0) { Console.err.println(s"bench $name child exit $code"); None }
    else out.collectFirst { case ChildResult(t) => t.toDouble }
  }

  private val ChildResult = """CHILD_RESULT ([0-9.]+)""".r

  private def childMain(name: String, sfDir: String, cpus: String): Unit = {
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    val spark = newSession(cpus)
    try timeQuery(name, fn, sfDir, spark) match {
      case Some(t) => println(f"CHILD_RESULT $t%.6f")
      case None    => sys.exit(3)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.length >= 4 && args(0) == "--child")
      return childMain(args(1), args(2), args(3))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // optional comma-separated filter for local iteration, e.g.
    // SPARK_GRAFT_ONLY=dedup_minhash_lsh,dedup_simhash
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val failed = scala.collection.mutable.ListBuffer[String]()
    val results = selected.flatMap { case (name, _) =>
      forkQuery(name, sfDir, cpus) match {
        case Some(t) => Some(name -> t)
        case None    => failed += name; None
      }
    }.toMap
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","action":"noop-sink write","queries":$qs,"failed":$failedJson,"sf":"$sfDir","methodology":"per-query forked JVM, 2 warmups, median of 3 with inter-run cache clear"}"""
    println(json)
    // The driver captures a BOUNDED stdout/stderr tail: with 70+ queries
    // the single JSON line can outgrow it and the round artifact arrives
    // truncated mid-object (BENCH_r09.json lost its own total). Persist
    // the full result to a file as well so the artifact is complete
    // regardless of output volume.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    catch { case e: Throwable =>
      Console.err.println(s"bench: could not write $outFile: ${e.getMessage}")
    }
  }
}
