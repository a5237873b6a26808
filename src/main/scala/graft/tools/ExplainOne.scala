package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main: print the formatted physical plan of one SparkEntry
  * query (`runMain graft.tools.ExplainOne <name> <sfDir>`).
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder.master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // match the engine sessions (Bench/Verify) so captured plans are
      // the plans the driver actually runs
      .config("spark.sql.optimizer.excludedRules",
        graft.Bench.ExcludedOptimizerRules)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
