package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  * Always read via these so column pruning / filter pushdown reach the
  * parquet scan (the reads stay lazy DataFrames).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts has been TIMESTAMP(NANOS) parquet (reject-by-default in
    // Spark; nanosAsLong reads it as a raw long) and TIMESTAMP(MICROS)
    // in later driver drops. The engine's time math is integer NANOS
    // throughout (`ts DIV 1000000` → ms, etc.), so a micros-era drop is
    // re-read with the schema overridden to LONG for `ts` — the
    // vectorized reader hands back the raw INT64 micros with NO
    // timestamp decode/rebase work (measured ~10-40% off events scans
    // vs decoding + unix_micros) — and one codegen multiply restores
    // nanos. The raw micros survive as `ts_raw`: a range predicate must
    // sit on a RAW attribute to reach the scan as a PushedFilter (see
    // [[tsRange]]); everywhere else column pruning drops it at the scan.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType | TimestampNTZType) =>
        val overridden = StructType(df.schema.map(f =>
          if (f.name == "ts") f.copy(dataType = LongType) else f))
        spark.read.schema(overridden).parquet(s"$dir/$name.parquet")
          .withColumn("ts_raw", col("ts"))
          .withColumn("ts", col("ts") * 1000L)
      case _ => df // long nanos already (nanosAsLong or GenData's int64)
    }
  }

  /** `[loNs, hiNs)` time-range predicate in the form parquet row-group
    * pruning can consume: on the raw micros attribute when this drop of
    * the data has one (comparisons against a derived column never reach
    * PushedFilters), else on the long-nanos `ts` attribute (which IS
    * the raw column for nanos-era drops). Bounds are exact whenever
    * they are whole microseconds — true for the whole-hour / whole-ms
    * bounds every caller uses.
    */
  def tsRange(df: DataFrame, loNs: Long, hiNs: Long): DataFrame =
    if (df.columns.contains("ts_raw")) {
      require(loNs % 1000L == 0 && hiNs % 1000L == 0,
        s"tsRange bounds must be whole microseconds, got [$loNs, $hiNs)")
      df.filter(col("ts_raw") >= lit(loNs / 1000L) &&
        col("ts_raw") < lit(hiNs / 1000L))
    } else
      df.filter(col("ts") >= lit(loNs) && col("ts") < lit(hiNs))
}
