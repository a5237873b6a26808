package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (JIT, codegen paths, shuffle machinery) so the
    // first timed query doesn't absorb startup cost
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // median of 3 runs per query (per-run times logged to stderr):
    // robust to one-off GC pauses / JIT recompiles in either direction,
    // unlike min-of-2 which is at the mercy of two samples
    // optional comma-separated filter for local iteration, e.g.
    // SPARK_GRAFT_ONLY=dedup_minhash_lsh,dedup_simhash
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // a failed query must never be timed as a (fast) success — that
    // would make a broken round bench BETTER; report failures instead
    val failed = scala.collection.mutable.ListBuffer[String]()
    val results = selected.flatMap { case (name, fn) =>
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
      // queries must not contaminate each other: drop any cache/persist the
      // query left behind (shingle caches, localCheckpoint blocks) and let
      // the ContextCleaner reclaim shuffle files before the next timing
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      Thread.sleep(200)
      if (times.forall(_._1)) Some(name -> times.map(_._2).sorted.apply(1))
      else { failed += name; None }
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
