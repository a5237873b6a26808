package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-maintenance cores shared by the persisted index stores (the
  * IVF×PQ codes dir, the SQ8 flat codes dir, the LSH bucket dir).
  * Every append in those lifecycles is a pure file-add — the property
  * the byte-identity specs pin — so a long-running ingest loop
  * accumulates one small parquet file per (batch, partition): on a
  * 1000-executor cluster that is the classic small-files failure
  * (every search/probe pays per-file open + footer read + task
  * schedule for KB-sized splits). Compaction is the missing lifecycle
  * verb: rewrite ONLY the fragmented partitions (or flat small files)
  * into one file each, leave everything else byte-identical, change
  * no row. The reference delegates the equivalent maintenance to
  * HBase's own minor compactions (reference HBaseManager.java keeps
  * region health external); here the store is parquet, so the engine
  * owns it.
  *
  * Single-writer posture, like every maintenance API in this repo:
  * callers serialize compaction against append/remove/search on the
  * same dir.
  */
private[graft] object StoreMaintenance {

  /** Data files directly under `dir` (parquet parts only — `_SUCCESS`
    * and other markers excluded), as (path, bytes). */
  def dataFiles(spark: SparkSession, dir: Path): Seq[(Path, Long)] = {
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath, s.getLen))
  }

  /** Hive-style partition directories `col=value` under `root`, with
    * their int partition values — bounded by the store's partition
    * cardinality (coarse cells / LSH bands), so driver-side listing
    * is O(partitions), never O(corpus). */
  def partitionDirs(spark: SparkSession, root: Path,
                    partCol: String): Seq[(Int, Path)] = {
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(s"$partCol="))
      .map(s => (s.getPath.getName.stripPrefix(s"$partCol=").toInt,
        s.getPath))
      .sortBy(_._1)
  }

  /** Compact a Hive-partitioned store (`root/col=v/part-*.parquet`):
    * partitions holding more than `maxFilesPerPartition` data files
    * are rewritten to ONE file each via dynamic partition overwrite;
    * partitions at or under the threshold are not read, not written,
    * and their files stay byte-identical (spec-pinned by callers).
    * Row set is unchanged — the read is partition-pruned to exactly
    * the fragmented values, and the rewrite is `repartition` on the
    * partition column so each partition's rows land in a single task
    * (hence a single output file). Returns
    * (partitionsCompacted, dataFilesBefore, dataFilesAfter).
    */
  def compactPartitioned(spark: SparkSession, root: String,
                         partCol: String,
                         maxFilesPerPartition: Int = 1,
                         maxRecordsPerFile: Long = 0L): (Int, Long, Long) = {
    require(maxFilesPerPartition >= 1,
      s"maxFilesPerPartition must be >= 1, got $maxFilesPerPartition")
    val rootPath = new Path(root)
    def census(): Map[Int, Int] =
      partitionDirs(spark, rootPath, partCol)
        .map { case (v, p) => v -> dataFiles(spark, p).size }.toMap
    val before = census()
    val fragged = before.filter(_._2 > maxFilesPerPartition).keys
      .toSeq.sorted
    val nBefore = before.values.map(_.toLong).sum
    if (fragged.isEmpty) return (0, nBefore, nBefore)
    // localCheckpoint, not persist: the dynamic overwrite below
    // replaces the very files this frame's lineage reads; a cached
    // plan that loses blocks mid-commit would recompute from
    // partially-swapped sources (the removeFromIvfPqIndex hazard).
    // The checkpoint's RDD blocks are freed explicitly in the
    // finally — Dataset.unpersist never releases them.
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val rows = spark.read.parquet(root)
      .filter(col(partCol).isin(fragged.map(Integer.valueOf): _*))
      .localCheckpoint()
    try {
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "dynamic")
      // maxRecordsPerFile > 0 re-splits a giant partition's single
      // task output into bounded files (at 100 TB a hot cell compacted
      // to literally ONE file would recreate the unsplittable-blob
      // problem compaction exists to avoid); default 0 = one file per
      // partition, right at test/ops scale
      val w = rows.repartition(fragged.size, col(partCol))
        .write.mode("overwrite")
      val w2 = if (maxRecordsPerFile > 0L)
        w.option("maxRecordsPerFile", maxRecordsPerFile) else w
      try w2.partitionBy(partCol).parquet(root)
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case scala.None => spark.conf.unset(key)
      }
    } finally {
      val rdds = spark.sparkContext.getPersistentRDDs
      (rdds.keySet diff persistedBefore)
        .foreach(id => rdds.get(id).foreach(_.unpersist(blocking = false)))
    }
    (fragged.size, nBefore, census().values.map(_.toLong).sum)
  }

  /** Compact a FLAT store (`dir/part-*.parquet`, no partition dirs):
    * data files smaller than `minBytes` are read (by explicit path —
    * nothing else is scanned), their rows appended back as one
    * combined file, and the originals deleted; files at or over
    * `minBytes` stay byte-identical. Needs at least two small files
    * to act. Append-before-delete, the removeFromSqIndex crash
    * posture: a crash between the append and the deletes leaves
    * DUPLICATE rows (the old small files plus the combined file) —
    * unlike the LSH probe path, a codes store's consumers do not
    * dedup, so recovery after a mid-compaction crash is `remove` the
    * duplicated ids and re-append them, or restore from the previous
    * files; the single-writer contract makes the window one
    * maintenance call, not steady state. Returns
    * (filesCompacted, dataFilesBefore, dataFilesAfter).
    */
  def compactFlat(spark: SparkSession, dir: String,
                  minBytes: Long,
                  targetBytes: Long = 128L << 20): (Int, Long, Long) = {
    val dirPath = new Path(dir)
    val before = dataFiles(spark, dirPath)
    val smallStats = before.filter(_._2 < minBytes)
    val small = smallStats.map(_._1)
    if (small.size < 2) return (0, before.size.toLong, before.size.toLong)
    // combined output lands in ~targetBytes files, not one blob — a
    // year of small appends should not merge into a single
    // unsplittable giant
    val nOut = math.max(1L,
      (smallStats.map(_._2).sum + targetBytes - 1) / targetBytes).toInt
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val rows = spark.read.parquet(small.map(_.toString): _*)
      .coalesce(nOut).localCheckpoint()
    try {
      rows.write.mode("append").parquet(dir)
      val fs = dirPath.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      small.foreach(fs.delete(_, false))
    } finally {
      val rdds = spark.sparkContext.getPersistentRDDs
      (rdds.keySet diff persistedBefore)
        .foreach(id => rdds.get(id).foreach(_.unpersist(blocking = false)))
    }
    (small.size, before.size.toLong,
      dataFiles(spark, dirPath).size.toLong)
  }

  /** Per-partition health report for a Hive-partitioned store:
    * (value, n_files, bytes) per `col=value` directory, driver-side
    * and O(partitions). Callers join row counts on top when they want
    * them (a column-pruned count, not a listing concern). */
  def partitionFileStats(spark: SparkSession, root: String,
                         partCol: String): Seq[(Int, Int, Long)] =
    partitionDirs(spark, new Path(root), partCol).map { case (v, p) =>
      val fs = dataFiles(spark, p)
      (v, fs.size, fs.map(_._2).sum)
    }
}
