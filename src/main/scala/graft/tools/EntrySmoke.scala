package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main replaying the DRIVER's flagship smoke check:
  * `SparkEntry.entry(spark)` must return rows > 0
  * (`runMain graft.tools.EntrySmoke`; the fixture is hard-wired to
  * sf0.001 inside `entry` itself — the driver's contract — so no
  * sfDir argument is accepted). Exit 1 on zero rows so a broken
  * entry contract fails loudly before the driver sees it.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[8]")
      .config("spark.sql.extensions",
        classOf[graft.GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val n = graft.SparkEntry.entry(spark).count()
      println(s"ENTRY_ROWS $n")
      if (n <= 0) sys.exit(1)
    } finally spark.stop()
  }
}
