package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.hb

/** TSDB-style rowkey salting (TsdbBulkload.java:81-114,167-173).
  *
  * The reference computes `|Arrays.hashCode(metric ⊕ tags)| % bucketCount`
  * and prepends `bucket(2B) + time(4B)` to the rowkey so concurrent writers
  * spread across regions while keys stay time-sorted within a bucket.
  */
object Salt {

  /** Reference-parity bucket: abs(Arrays.hashCode(saltBase)) % buckets.
    * (abs, not pmod — TsdbBulkload.java:94-98 negates a negative modulo.)
    */
  def bucket(saltBase: Column, buckets: Int): Column =
    abs(hb.arraysHashCode(saltBase) % buckets)

  /** 6-byte salt prefix: bucket as 2 big-endian bytes + 4 time bytes
    * (epoch seconds of the containing hour), per getSaltBytes
    * (TsdbBulkload.java:167-173).
    */
  def saltPrefix(bucket: Column, epochSec: Column): Column =
    concat(
      hb.encode(bucket.cast("short")),
      hb.encode(epochSec.cast("int")))
}

/** DataFrame → HFile-shaped bulk output.
  *
  * Spark-first replacement for the reference's pipeline
  * (TsdbBulkload.java:81-155 + HadoopOutputFormat2.java:88-100):
  * instead of Flink's per-task `sortPartition` + a single writer that
  * rolls files on salt-prefix change, we `repartitionByRange` on
  * (bucket, rowkey) — a distributed range sort with sampled bounds — and
  * `sortWithinPartitions`, so every task owns a contiguous, fully-sorted
  * key range and each bucket's files form non-overlapping sorted runs:
  * exactly the invariant HBase bulk import (LoadIncrementalHFiles) needs.
  * No global single-point sort; parallelism scales with data size.
  *
  * The physical file format here is parquet (HFile writing needs hbase
  * jars, which are out of scope per the build constraints); the layout —
  * `bucket=NNN/part-*.parquet`, rows sorted by (rowkey, family, qualifier)
  * — is the bulk-load contract.
  */
object BulkLoad {

  /** Salt + globally order a cell stream. `cells` needs columns
    * (rowkey, family, qualifier, value); `saltBase` defaults to the rowkey.
    */
  def prepare(cells: DataFrame, buckets: Int, numPartitions: Int,
              saltBase: Option[Column] = None,
              epochSec: Option[Column] = None): DataFrame = {
    val base = saltBase.getOrElse(col("rowkey"))
    val b = Salt.bucket(base, buckets)
    val salted = cells
      .withColumn("bucket", b)
      .withColumn("salted_key",
        epochSec match {
          case Some(t) => concat(Salt.saltPrefix(col("bucket"), t), col("rowkey"))
          case None    => concat(hb.encode(col("bucket").cast("short")), col("rowkey"))
        })
    salted
      .repartitionByRange(numPartitions, col("bucket"), col("salted_key"),
        col("family"), col("qualifier"))
      .sortWithinPartitions(col("bucket"), col("salted_key"), col("family"),
        col("qualifier"))
  }

  /** Write the prepared stream as per-bucket sorted runs. */
  def write(prepared: DataFrame, path: String): Unit =
    prepared.write
      .partitionBy("bucket")
      .mode("overwrite")
      .parquet(path)

  /** Per-file stats of a written bulk output — the HFile info-block
    * analogue: (bucket, file, n_cells, min/max key). Input to
    * [[regionPlan]].
    */
  def manifest(spark: org.apache.spark.sql.SparkSession,
               path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("bucket"), input_file_name().as("file"))
      .agg(count(lit(1)).as("n_cells"),
        min(hex(col("salted_key"))).as("min_key_hex"),
        max(hex(col("salted_key"))).as("max_key_hex"))

  /** Greedy region assignment over the manifest: pack files (already
    * sorted, non-overlapping within a bucket) into regions of
    * ~`targetCells` each — the reference's pre-split-table sizing and
    * merge-small-regions admin ops (HBaseManager.java) re-expressed as
    * a pure plan. The manifest is tiny (one row per file), so the
    * single-window cumulative sum is driver-scale work regardless of
    * data volume.
    */
  def regionPlan(manifest: DataFrame, targetCells: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("bucket"), col("min_key_hex"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    manifest
      .withColumn("_cum", sum(col("n_cells")).over(w))
      .withColumn("region_id",
        floor((col("_cum") - col("n_cells")) / targetCells))
      .groupBy(col("region_id"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_cells")).as("n_cells"),
        min(col("min_key_hex")).as("start_key_hex"),
        max(col("max_key_hex")).as("end_key_hex"))
      .orderBy(col("region_id"))
  }
}
