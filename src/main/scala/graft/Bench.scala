package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: every SparkEntry query, median-of-3 wall seconds, ONE
  * JSON line on stdout for the driver to parse.
  *
  * Each query runs in a FRESH SparkContext. Rounds 4-6 showed in-suite
  * timings drifting up to ~1.6x of the same query's isolated cost even
  * with clearCache + unpersist + GC between queries: block-manager,
  * shuffle-file and ContextCleaner state from 50 earlier queries still
  * shares the context. A per-query context makes every number an
  * isolated number by construction; JIT/codegen warmth is JVM-wide
  * (CodeGenerator's cache is static), so only the throwaway warmup
  * context pays compilation, and context startup happens outside the
  * timed region.
  */
object Bench {

  /** Fresh local session. Callers own the stop(). */
  def newSession(cpus: String): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Median-of-3 wall seconds for one query in its own context, or None
    * if any run failed — a failed query must never be timed as a (fast)
    * success; that would make a broken round bench BETTER.
    */
  def timeQuery(name: String, fn: (SparkSession, String) => DataFrame,
                sfDir: String, cpus: String): Option[Double] = {
    val spark = newSession(cpus)
    try {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            Console.err.println(s"bench $name FAILED: ${e.getMessage}")
            false
        }
        (ok, (System.nanoTime() - t0) / 1e9)
      }
      Console.err.println(
        f"bench $name runs=${times.map(t => f"${t._2}%.3f").mkString(",")}")
      if (times.forall(_._1)) Some(times.map(_._2).sorted.apply(1)) else None
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // throwaway warmup context: JIT, codegen paths, shuffle machinery —
    // so the first timed query's context doesn't absorb JVM startup cost
    locally {
      val warm = newSession(cpus)
      try { warm.sparkContext.setLogLevel("WARN"); SparkEntry.entry(warm).count() }
      catch { case _: Throwable => }
      finally { warm.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession() }
    }
    // optional comma-separated filter for local iteration, e.g.
    // SPARK_GRAFT_ONLY=dedup_minhash_lsh,dedup_simhash
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val failed = scala.collection.mutable.ListBuffer[String]()
    val results = selected.flatMap { case (name, fn) =>
      timeQuery(name, fn, sfDir, cpus) match {
        case Some(t) => Some(name -> t)
        case None    => failed += name; None
      }
    }.toMap
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
  }
}
