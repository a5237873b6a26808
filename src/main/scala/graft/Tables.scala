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
        // Spark maps both TIMESTAMP(MILLIS) and TIMESTAMP(MICROS)
        // annotations to TimestampType, so the ×1000 below would be
        // silently 1000× wrong on a millis drop — check the actual
        // parquet annotation and fail loudly on anything but micros
        require(tsUnitIsMicros(spark, s"$dir/$name.parquet"),
          s"$dir/$name.parquet: ts is timestamp-typed but not " +
            "MICROS-annotated — the raw-long fast path would mis-scale; " +
            "teach Tables this drop's unit before using it")
        val overridden = StructType(df.schema.map(f =>
          if (f.name == "ts") f.copy(dataType = LongType) else f))
        spark.read.schema(overridden).parquet(s"$dir/$name.parquet")
          .withColumn("ts_raw", col("ts"))
          .withColumn("ts", col("ts") * 1000L)
      case _ => df // long nanos already (nanosAsLong or GenData's int64)
    }
  }

  /** True iff the parquet `ts` column carries a TIMESTAMP(MICROS)
    * logical annotation — read from one file's footer (the file itself,
    * or the first part-file of a directory-shaped table).
    */
  private def tsUnitIsMicros(spark: SparkSession, path: String): Boolean = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (!fs.getFileStatus(p).isDirectory) p
      else fs.listStatus(p).map(_.getPath)
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
        .getOrElse(throw new IllegalArgumentException(
          s"no parquet part files under $path"))
    val rdr = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val schema = rdr.getFooter.getFileMetaData.getSchema
      if (!schema.containsField("ts")) false
      else schema.getType(schema.getFieldIndex("ts")).asPrimitiveType()
        .getLogicalTypeAnnotation match {
        case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          ts.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS
        case _ => false
      }
    } finally rdr.close()
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
