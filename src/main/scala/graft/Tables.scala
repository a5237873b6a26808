package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

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
    // throughout (`ts DIV 1000000` → ms, etc.), so normalize whichever
    // physical type this drop uses to long nanos. The raw timestamp
    // survives as `ts_raw`: a range predicate must sit on the RAW
    // attribute to reach the parquet scan as a PushedFilter (see
    // [[tsRange]]); everywhere else column pruning drops it at the scan.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) =>
        df.withColumn("ts_raw", col("ts"))
          .withColumn("ts", unix_micros(col("ts")) * 1000L)
      case Some(TimestampNTZType) =>
        // NTZ micros are a wall-clock reading; the generator writes UTC
        // instants and every graft session runs UTC, so the NTZ→instant
        // cast below is exact
        df.withColumn("ts_raw", col("ts"))
          .withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df // long nanos already (nanosAsLong or GenData's int64)
    }
  }

  /** `[loNs, hiNs)` time-range predicate in the form parquet row-group
    * pruning can consume: on the raw timestamp attribute when this drop
    * of the data has one (comparisons against a derived column never
    * reach PushedFilters), else on the long-nanos `ts` attribute (which
    * IS the raw column for nanos-era drops). Bounds are exact whenever
    * they are whole microseconds — true for the whole-hour / whole-ms
    * bounds every caller uses.
    */
  def tsRange(df: DataFrame, loNs: Long, hiNs: Long): DataFrame =
    if (!df.columns.contains("ts_raw"))
      df.filter(col("ts") >= lit(loNs) && col("ts") < lit(hiNs))
    else {
      def tsLit(ns: Long): Column = {
        val sec = Math.floorDiv(ns, 1000000000L)
        val nano = Math.floorMod(ns, 1000000000L).toInt
        df.schema("ts_raw").dataType match {
          case TimestampNTZType => lit(java.time.LocalDateTime.ofEpochSecond(
            sec, nano, java.time.ZoneOffset.UTC))
          case _ => lit(java.time.Instant.ofEpochSecond(sec, nano.toLong))
        }
      }
      df.filter(col("ts_raw") >= tsLit(loNs) && col("ts_raw") < tsLit(hiNs))
    }
}
