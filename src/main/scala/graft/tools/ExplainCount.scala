package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main: print the physical plan Bench's `.count()` action
  * actually executes for one SparkEntry query
  * (`runMain graft.tools.ExplainCount <name> <sfDir>`) — a query whose
  * expensive subtree disappears under count() is being mis-benched.
  */
object ExplainCount {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder.master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.groupBy().count().explain("formatted")
    spark.stop()
  }
}
