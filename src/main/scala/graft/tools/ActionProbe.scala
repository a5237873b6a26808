package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main: time count() vs noop-write vs toRdd-foreach for one
  * SparkEntry query, same JVM, to isolate per-action overhead.
  */
object ActionProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder.master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"$label run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val fn = graft.SparkEntry.queries(name)
    time("count")(fn(spark, dir).count())
    time("noop")(fn(spark, dir).write.format("noop").mode("overwrite").save())
    time("toRdd")(fn(spark, dir).queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next()))
    spark.stop()
  }
}
