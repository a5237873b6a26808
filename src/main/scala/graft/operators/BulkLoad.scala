package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.hb
import graft.sources.{HFile, HFileReader, HFileWriter}

/** One row per cell read back from an HFile by [[BulkLoad.readHFiles]].
  * `tags`/`mvcc` are empty/0 for files written without the tags layout;
  * cluster-written files carry them through so rewrites (compaction)
  * can preserve cell TTL tags and sequence ids.
  */
case class HFileCellRow(file: String, bucket: Int, rowkey: Array[Byte],
                        family: String, qualifier: String, ts: Long,
                        value: Array[Byte], key_type: Int,
                        tags: Array[Byte], mvcc: Long)

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
    // range-partition on (bucket, key) ONLY: rows equal on the partition
    // key always land together, so one rowkey's cells (multi-qualifier /
    // multi-version) can never straddle a partition boundary and produce
    // overlapping files; family/qualifier order is fixed by the local sort
    salted
      .repartitionByRange(numPartitions, col("bucket"), col("salted_key"))
      .sortWithinPartitions(col("bucket"), col("salted_key"), col("family"),
        col("qualifier"))
  }

  /** Write the prepared stream as per-bucket sorted runs. */
  def write(prepared: DataFrame, path: String): Unit =
    prepared.write
      .partitionBy("bucket")
      .mode("overwrite")
      .parquet(path)

  /** Writes the prepared cell stream as real HFile v3 binaries — the
    * reference's actual output format (HadoopOutputFormat2.java:85-100),
    * re-expressed without hbase jars via [[graft.sources.HFile]].
    *
    * Each range partition streams its rows through one [[HFileWriter]]
    * at a time, rolling to a new file whenever the bucket changes —
    * the same roll-on-salt-prefix-change rule as the reference's
    * `writeRecord` — so every emitted file holds one bucket's
    * contiguous, fully-sorted key range with non-overlapping files per
    * bucket (the LoadIncrementalHFiles invariant). Memory per task is
    * one 64 KiB block; IO goes through the Hadoop FileSystem API, so
    * `path` may be any supported scheme at cluster scale.
    *
    * Multi-version streams are re-sorted here with `ts` descending and
    * type descending inside each cell (the CellComparator order the
    * writer enforces); exact duplicate full cell keys are still
    * rejected — collapse them first with [[Cells.latestVersion]] /
    * [[Cells.lastVersions]].
    *
    * Output is task-committed: each task writes to an attempt-unique
    * temp file under `_inprogress/` and renames into place when the
    * file is complete, so a failed or speculative duplicate attempt
    * never interleaves bytes into a final file (first finished rename
    * wins; output is deterministic, so the winner's bytes equal the
    * loser's). The driver clears `_inprogress/` after the job.
    */
  def writeHFiles(prepared: DataFrame, path: String,
                  tsCol: Option[String] = None,
                  typeCol: Option[String] = None,
                  blockSize: Int = HFile.DefaultBlockSize,
                  compression: String = "none",
                  bloomChunkKeys: Int = HFile.DefaultBloomChunkKeys,
                  maxFileBytes: Long = HFile.DefaultMaxFileBytes,
                  encoding: String = "none",
                  tagsCol: Option[String] = None,
                  mvccCol: Option[String] = None): Unit = {
    val codec = HFile.codecOf(compression) // fail fast, on the driver
    val encodingId = graft.sources.BlockEncoding.idOf(encoding)
    val spark = prepared.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fsRoot = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fsRoot.exists(root)) fsRoot.delete(root, true)
    fsRoot.mkdirs(root)
    val confMap = broadcastHadoopConf(spark)

    // tagsCol/mvccCol switch every file to the tags+mvcc cell layout
    // (the cluster's KEY_VALUE_VERSION=1 format) — what a compaction of
    // cluster-written files uses so cell TTL tags and sequence ids
    // survive the rewrite
    val withTagsAndMvcc = tagsCol.isDefined || mvccCol.isDefined
    val ts = tsCol.map(col(_).cast("long")).getOrElse(lit(0L))
    val typ = typeCol.map(col(_).cast("int"))
      .getOrElse(lit(HFile.KeyTypePut.toInt))
    val tags = tagsCol.map(c => coalesce(col(c).cast("binary"),
      lit(Array.emptyByteArray))).getOrElse(lit(Array.emptyByteArray))
    val mvcc = mvccCol.map(c => coalesce(col(c).cast("long"), lit(0L)))
      .getOrElse(lit(0L))
    val rows = prepared.select(col("bucket").cast("int"),
      col("salted_key").cast("binary"), col("family").cast("string"),
      col("qualifier").cast("string"), ts.as("ts"),
      col("value").cast("binary"), typ.as("key_type"),
      tags.as("tags"), mvcc.as("mvcc"))
      // equal (bucket, key, family, qualifier) tuples always land in one
      // range partition, so this local sort fixes version order globally
      .sortWithinPartitions(col("bucket"), col("salted_key"), col("family"),
        col("qualifier"), col("ts").desc, col("key_type").desc)

    try {
      import spark.implicits._
      // one stat tuple per committed file — the input to the `_manifest`
      // sidecar, recorded here where the writer already knows it all
      // (re-reading 100k trailers at plan time is what the sidecar kills)
      val stats = rows.mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
        val acc = scala.collection.mutable.ArrayBuffer
          .empty[(String, Int, Long, Long, String, String)]
        if (it.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          val fs = new org.apache.hadoop.fs.Path(path)
            .getFileSystem(hadoopConfOf(confMap.value))
          val pid = tc.partitionId()
          val attempt = tc.taskAttemptId()
          var bucket = Int.MinValue
          var seq = 0
          var out: org.apache.hadoop.fs.FSDataOutputStream = null
          var writer: HFileWriter = null
          var tmp: org.apache.hadoop.fs.Path = null
          var dest: org.apache.hadoop.fs.Path = null
          def commitCurrent(): Unit = if (writer != null) {
            writer.finish(); out.close()
            fs.mkdirs(dest.getParent)
            // first completed attempt wins; losers hold identical bytes,
            // so an existing dest means success — just drop our temp
            if (!fs.rename(tmp, dest)) {
              if (!fs.exists(dest))
                throw new java.io.IOException(s"could not commit $dest")
              fs.delete(tmp, false)
            }
            acc += ((graft.sources.HFileManifest.relOf(dest), bucket,
              writer.bytesWritten, writer.cellCount,
              graft.sources.HFileManifest.toHex(writer.firstRowkey),
              graft.sources.HFileManifest.toHex(writer.lastRowkey)))
            writer = null
          }
          def roll(b: Int): Unit = {
            commitCurrent()
            dest = new org.apache.hadoop.fs.Path(path,
              f"bucket=$b%d/part-$pid%05d-$seq%03d.hfile")
            tmp = new org.apache.hadoop.fs.Path(path,
              f"_inprogress/attempt-$attempt%d-part-$pid%05d-$seq%03d.hfile")
            seq += 1
            out = fs.create(tmp, true)
            writer = new HFileWriter(out, blockSize, codec, bloomChunkKeys,
              withTagsAndMvcc = withTagsAndMvcc, encoding = encodingId)
            bucket = b
          }
          it.foreach { r =>
            val b = r.getInt(0)
            val rk = r.getAs[Array[Byte]](1)
            // size cap (hbase.hregion.max.filesize analogue): roll to a
            // new file in the SAME bucket, but only between rowkeys —
            // splitting one row across files would overlap their ranges
            if (b != bucket ||
                (writer.bytesWritten >= maxFileBytes &&
                  !java.util.Arrays.equals(writer.lastRowkey, rk)))
              roll(b)
            writer.append(HFile.HCell(rk,
              r.getString(2).getBytes("UTF-8"),
              r.getString(3).getBytes("UTF-8"),
              r.getLong(4), r.getAs[Array[Byte]](5),
              r.getInt(6).toByte,
              if (withTagsAndMvcc) r.getAs[Array[Byte]](7)
              else Array.emptyByteArray,
              if (withTagsAndMvcc) r.getLong(8) else 0L))
          }
          commitCurrent()
        }
        acc.iterator
      }
        // one row per FILE, not per cell — driver-scale at any data size
        .collect()
        .map(t => graft.sources.HFileManifest.Entry(t._1, t._2, t._3, t._4,
          t._5, t._6))
      graft.sources.HFileManifest.write(fsRoot, root, stats.toSeq)
    } finally {
      // always clear temp files — a failed job must not leave attempt
      // files for readHFiles to trip over (its glob also excludes them)
      fsRoot.delete(new org.apache.hadoop.fs.Path(root, "_inprogress"), true)
      confMap.destroy()
    }
  }

  /** The session's Hadoop settings as a broadcastable map — executors
    * must see credentials / fs.defaultFS etc.; a bare
    * `new Configuration()` on an executor would not.
    */
  private def broadcastHadoopConf(spark: SparkSession)
      : org.apache.spark.broadcast.Broadcast[Map[String, String]] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val m = scala.collection.mutable.Map[String, String]()
    val it = hconf.iterator()
    while (it.hasNext) { val e = it.next(); m += e.getKey -> e.getValue }
    spark.sparkContext.broadcast(m.toMap)
  }

  private def hadoopConfOf(m: Map[String, String])
      : org.apache.hadoop.conf.Configuration = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    m.foreach { case (k, v) => conf.set(k, v) }
    conf
  }

  /** Distributed scan of a [[writeHFiles]] directory back into a cell
    * DataFrame. One executor thread streams one file block-at-a-time
    * (O(block) memory) with every structural check from
    * [[graft.sources.HFileReader]] active, so a scan doubles as an
    * integrity audit of the bulk output.
    */
  def readHFiles(spark: SparkSession, path: String): DataFrame =
    readHFiles(spark, path, "bucket=*/*.hfile")

  /** [[readHFiles]] with an explicit file glob under `path` — e.g. the
    * `epoch=N`-prefixed hfile glob, to scan every micro-batch run a
    * streaming sink accumulated as ONE constant-size plan (the run a
    * cell came from is recoverable from the `file` column), instead of
    * an N-way union whose analysis cost grows with the epoch count.
    */
  def readHFiles(spark: SparkSession, path: String, glob: String): DataFrame = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(path)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(hconf)
    // bucket=* (not */) so leftover _inprogress attempt files are never
    // read back as data; globStatus returns null when the path is absent
    val files = Option(
        fs.globStatus(new org.apache.hadoop.fs.Path(root, glob)))
      .getOrElse(Array.empty)
      .map(_.getPath.toString).toSeq
    require(files.nonEmpty, s"no HFiles found under $path")
    val confMap = broadcastHadoopConf(spark)
    val par = math.max(1, math.min(files.size,
      spark.sparkContext.defaultParallelism))
    spark.createDataset(files).repartition(par).flatMap { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val fsx = p.getFileSystem(hadoopConfOf(confMap.value))
      val len = fsx.getFileStatus(p).getLen
      val in = fsx.open(p)
      val rr = new HFileReader.RandomRead {
        def length: Long = len
        def readFully(pos: Long, n: Int): Array[Byte] = {
          val buf = new Array[Byte](n)
          in.readFully(pos, buf)
          buf
        }
        override def close(): Unit = in.close()
      }
      val bucket = graft.sources.HFileSource.bucketOf(f)
      HFileReader.scan(rr).map(c => HFileCellRow(f, bucket, c.rowkey,
        new String(c.family, "UTF-8"), new String(c.qualifier, "UTF-8"),
        c.ts, c.value, c.keyType.toInt, c.tags, c.mvcc))
    }.toDF()
  }

  /** Whether ANY file under `path`/`glob` stores the tags+mvcc cell
    * layout — the bit a compaction needs to decide whether its rewrite
    * must preserve them. One file-info short read per file through a
    * bounded pool (file-count scale, no data reads), the same pattern
    * as the manifest fallback.
    */
  def dirHasTagsOrMvcc(spark: SparkSession, path: String,
                       glob: String = "bucket=*/*.hfile"): Boolean = {
    val root = new org.apache.hadoop.fs.Path(path)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(hconf)
    val files = Option(fs.globStatus(new org.apache.hadoop.fs.Path(root, glob)))
      .getOrElse(Array.empty).map(_.getPath.toString)
    if (files.isEmpty) return false
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, files.length))
    val found = new java.util.concurrent.atomic.AtomicBoolean(false)
    try {
      files.map { f =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            if (found.get()) return false // short-circuit queued probes
            val rr = openRead(f, hconf)
            try {
              val t = HFileReader.readTrailer(rr)
              val l = HFileReader.cellLayoutOf(rr, t)
              val hit = l.tags || l.mvcc
              if (hit) found.set(true)
              hit
            } finally rr.close()
          }
        })
      }.exists(_.get())
      // shutdownNow (not shutdown) so a hit doesn't leave thousands of
      // queued probes reading trailers the answer no longer needs
    } finally pool.shutdownNow()
  }

  /** Distributed keyed lookup (multi-get) against a [[writeHFiles]]
    * directory — the reference's point-GET-by-rowkey lookup
    * (HBaseRowDataLookupFunction.java) as a batch operator. The driver
    * reads each file's key range through a bounded pool and broadcasts
    * the tiny (file, bucket, range) manifest; each key routes to the
    * files whose range covers it; each task then opens its file ONCE and
    * probes its whole sorted key batch through the bloom and the
    * multi-level index ([[HFileReader.multiGet]]) — a handful of short
    * reads per key, never a file scan. Keys and files both scale
    * horizontally; result schema matches [[readHFiles]].
    */
  def multiGet(spark: SparkSession, path: String, keys: DataFrame,
               keyCol: String = "rowkey"): DataFrame = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(path)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(hconf)
    val listing = Option(
        fs.globStatus(new org.apache.hadoop.fs.Path(root, "bucket=*/*.hfile")))
      .getOrElse(Array.empty)
    val files = listing.map(_.getPath.toString)
    require(files.nonEmpty, s"no HFiles found under $path")
    val confMap = broadcastHadoopConf(spark)
    // key ranges from the `_manifest` sidecar when it matches the
    // listing; pooled per-file short reads only when it doesn't
    val fileRanges = graft.sources.HFileManifest
      .readValid(fs, root, listing.toSeq)
      .map { entries =>
        files.toSeq.zip(entries).collect {
          case (f, e) if e.minHex.nonEmpty =>
            (f, e.bucket, e.minKey, e.maxKey)
        }
      }
      .getOrElse {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(16, files.length))
        try {
          files.map { f =>
            pool.submit(
              new java.util.concurrent.Callable[Option[(String, Int, Array[Byte], Array[Byte])]] {
                def call(): Option[(String, Int, Array[Byte], Array[Byte])] = {
                  val rr = openRead(f, hconf)
                  try HFileReader.rowkeyRange(rr).map { case (lo, hi) =>
                    (f, graft.sources.HFileSource.bucketOf(f), lo, hi)
                  } finally rr.close()
                }
              })
          }.flatMap(_.get()).toSeq
        } finally pool.shutdown()
      }
    // key → covering files in O(log F + matches), not O(F): ranges sorted
    // by first key, with a prefix running-max of last keys so the left
    // walk stops as soon as no earlier run can still reach the key
    // (ranges overlap only across append runs)
    val sorted = fileRanges.sortWith((a, b) =>
      java.util.Arrays.compareUnsigned(a._3, b._3) < 0).toArray
    val prefixMaxHi = new Array[Array[Byte]](sorted.length)
    sorted.indices.foreach { i =>
      prefixMaxHi(i) =
        if (i == 0) sorted(0)._4
        else if (java.util.Arrays.compareUnsigned(
          sorted(i)._4, prefixMaxHi(i - 1)) >= 0) sorted(i)._4
        else prefixMaxHi(i - 1)
    }
    val bc = spark.sparkContext.broadcast((sorted, prefixMaxHi))
    keys.select(col(keyCol).cast("binary")).as[Array[Byte]]
      .flatMap { k =>
        val (ranges, maxHi) = bc.value
        def cmp(a: Array[Byte], b: Array[Byte]) =
          java.util.Arrays.compareUnsigned(a, b)
        // last range whose first key <= k
        var lo = 0; var hi = ranges.length - 1; var idx = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (cmp(ranges(mid)._3, k) <= 0) { idx = mid; lo = mid + 1 }
          else hi = mid - 1
        }
        val out = scala.collection.mutable.ArrayBuffer[(String, Int, Array[Byte])]()
        var j = idx
        while (j >= 0 && cmp(maxHi(j), k) >= 0) {
          if (cmp(ranges(j)._4, k) >= 0) out += ((ranges(j)._1, ranges(j)._2, k))
          j -= 1
        }
        out
      }
      .groupByKey(t => (t._1, t._2))
      .flatMapGroups { (fb: (String, Int),
                        batch: Iterator[(String, Int, Array[Byte])]) =>
        val (f, b) = fb
        val rr = openRead(f, hadoopConfOf(confMap.value))
        // multiGet materializes its result, so closing before returning
        // the iterator is safe
        try HFileReader.multiGet(rr, batch.map(_._3).toSeq)
          .map(c => HFileCellRow(f, b, c.rowkey,
            new String(c.family, "UTF-8"), new String(c.qualifier, "UTF-8"),
            c.ts, c.value, c.keyType.toInt, c.tags, c.mvcc)).iterator
        finally rr.close()
      }.toDF()
  }

  /** Distributed, validating backup of a bulk-load directory — the
    * reference's backup admin op (HBaseManager.java:186,293), ONE
    * SUBSYSTEM with the store-maintenance backup lifecycle: this verb
    * contributes the HFile-specific STRUCTURAL AUDIT as a pre-copy
    * validation gate — every hfile under `bucket=N/` gets the full audit
    * (trailer, checksums, index descent, blooms, cell order) as a
    * Spark job, failing loudly on the first corrupt file BEFORE any
    * byte is copied (a backup of bad bytes is worse than no backup) —
    * and then delegates the snapshot itself to
    * [[StoreMaintenance.backupStore]]. A bulkload backup is therefore
    * a first-class snapshot: `_backup_manifest` (rel_path, bytes,
    * CRC32C hashed inside the copy stream, mtime),
    * [[StoreMaintenance.verifyStoreBackup]] deep verification,
    * [[StoreMaintenance.restoreStore]] /[[restore]],
    * [[StoreMaintenance.pruneStoreBackups]] retention, and the
    * `graft_store_backups` catalog TVF all work on it unchanged.
    * `base = Some(priorSnapshot)` chains an INCREMENTAL snapshot —
    * unchanged files carry by (rel_path, bytes, mtime) identity,
    * sound here because bulkload dirs are pure-file-add (writers roll
    * new files; compaction publishes under new names) — the audit
    * still validates EVERY current hfile (validation is this verb's
    * point; incrementality saves the transfer/write, which is the
    * expensive half against remote backup storage). The snapshot
    * carries the whole directory — sidecars (`_manifest`) included,
    * so a restored dir is the complete point-in-time state — and the
    * destination must be empty (snapshots are append-only artifacts).
    * Returns the per-file audit report `(file, bucket, n_cells,
    * bytes)` over the hfiles.
    */
  def backup(spark: SparkSession, srcDir: String, dstDir: String,
             base: Option[String] = None): DataFrame = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(srcDir)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(hconf)
    val files = Option(
        fs.globStatus(new org.apache.hadoop.fs.Path(root, "bucket=*/*.hfile")))
      .getOrElse(Array.empty)
      .map(_.getPath.toString).toSeq
    require(files.nonEmpty, s"no HFiles found under $srcDir")
    val confMap = broadcastHadoopConf(spark)
    val par = math.max(1, math.min(files.size,
      spark.sparkContext.defaultParallelism))
    // the audit job runs (and materializes) BEFORE the copy job: a
    // corrupt source file must fail the backup before any byte moves
    val audit = spark.createDataset(files).repartition(par).map { f =>
      val conf = hadoopConfOf(confMap.value)
      val src = new org.apache.hadoop.fs.Path(f)
      val stats = {
        val rr = openRead(f, conf)
        try HFileReader.validate(rr) finally rr.close()
      }
      val rel = s"${src.getParent.getName}/${src.getName}"
      val len = src.getFileSystem(conf).getFileStatus(src).getLen
      (rel, graft.sources.HFileSource.bucketOf(f), stats.nCells, len)
    }.collect().toSeq
    StoreMaintenance.backupStore(spark, srcDir, dstDir, base)
    audit.toDF("file", "bucket", "n_cells", "bytes")
  }

  /** Recovery verb (the reference exposes restore endpoints next to
    * backup, HBaseController.java:148-178; HBaseManager.java:293),
    * unified with the store-maintenance lifecycle: the refusal gate is
    * [[StoreMaintenance.requireVerified]] — the snapshot must verify
    * DEEP green (every manifest row present, every byte re-hashing to
    * the backup-time CRC32C; carried rows checked at their base), so
    * a tampered or truncated backup refuses before a byte moves. No
    * structural re-audit is needed: [[backup]] audited the bytes when
    * the snapshot was taken, and CRC equality proves the restored
    * bytes ARE those audited bytes. The copy is the manifest plan
    * ([[StoreMaintenance.restorePlan]] — an incremental's carried
    * rows restore from their base snapshot's tree), overwriting
    * same-name files under `dir` in place — the overlay semantics a
    * disaster recovery wants: a file under `dir` absent from the
    * backup (written after the snapshot — possibly itself corrupt) is
    * left untouched, a newer same-name file is rolled back without
    * warning. Run [[repair]] afterwards if unbackuped files may also
    * be damaged; use [[StoreMaintenance.restoreStore]] to restore
    * into an empty dir instead.
    *
    * The destination's `_manifest` sidecar is dropped after the
    * overlay: restore rewrites contents under unchanged names — the
    * one mutation the sidecar's (path, bytes) freshness check cannot
    * detect — and the snapshot's own sidecar copy may be stale
    * against post-backup files the overlay leaves in place. The next
    * planner read falls back to pooled trailer reads; the next bulk
    * write rebuilds it. Returns the restore plan `(file, bucket,
    * bytes)` (cell counts live in [[backup]]'s audit report — restore
    * moves verified bytes, it does not re-parse them).
    */
  def restore(spark: SparkSession, backupDir: String, dir: String): DataFrame = {
    import spark.implicits._
    StoreMaintenance.requireVerified(spark, backupDir)
    val plan = StoreMaintenance.restorePlan(spark, backupDir)
    val root = new org.apache.hadoop.fs.Path(dir)
    val hconf = spark.sparkContext.hadoopConfiguration
    val rfs = root.getFileSystem(hconf)
    val qd = rfs.makeQualified(root)
    StoreMaintenance.copyFilesDistributed(spark,
      plan.map { case (rel, _, phys) =>
        (phys, new org.apache.hadoop.fs.Path(qd, rel).toString) })
    graft.sources.HFileManifest.delete(rfs, root)
    plan.map { case (rel, n, _) =>
      (rel, graft.sources.HFileSource.bucketOf(rel), n) }
      .toDF("file", "bucket", "bytes")
  }

  /** Distributed integrity repair sweep (HbaseRepairRunner.java:41
    * re-scoped to file integrity): every file gets the full structural
    * audit; corrupt files are moved into `quarantineDir` so the
    * directory scans clean again. Returns `(file, ok, n_cells, error)`
    * per file.
    */
  def repair(spark: SparkSession, dir: String,
             quarantineDir: String): DataFrame = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(dir)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(hconf)
    val files = Option(
        fs.globStatus(new org.apache.hadoop.fs.Path(root, "bucket=*/*.hfile")))
      .getOrElse(Array.empty)
      .map(_.getPath.toString).toSeq
    require(files.nonEmpty, s"no HFiles found under $dir")
    val confMap = broadcastHadoopConf(spark)
    val par = math.max(1, math.min(files.size,
      spark.sparkContext.defaultParallelism))
    spark.createDataset(files).repartition(par).map { f =>
      val conf = hadoopConfOf(confMap.value)
      val src = new org.apache.hadoop.fs.Path(f)
      val sfs = src.getFileSystem(conf)
      val audit: Either[String, Long] =
        try {
          val rr = openRead(f, conf)
          Right(try HFileReader.validate(rr).nCells finally rr.close())
        } catch { case e: Exception => Left(String.valueOf(e.getMessage)) }
      audit match {
        case Right(n) => (f, true, n, null: String)
        case Left(err) =>
          val q = new org.apache.hadoop.fs.Path(quarantineDir,
            s"${src.getParent.getName}-${src.getName}")
          val qfs = q.getFileSystem(conf)
          qfs.mkdirs(q.getParent)
          // copy+delete, not rename: works across filesystems and does
          // not depend on checksum-sidecar state of the corrupt file
          require(org.apache.hadoop.fs.FileUtil.copy(sfs, src, qfs, q,
            true, true, conf), s"could not quarantine $f")
          (f, false, 0L, err)
      }
    }
      // quarantine moves files — execute exactly once, report materialized
      .collect().toSeq
      .toDF("file", "ok", "n_cells", "error")
  }

  private def openRead(f: String, conf: org.apache.hadoop.conf.Configuration)
      : HFileReader.RandomRead = {
    val p = new org.apache.hadoop.fs.Path(f)
    val fsx = p.getFileSystem(conf)
    val len = fsx.getFileStatus(p).getLen
    val in = fsx.open(p)
    new HFileReader.RandomRead {
      def length: Long = len
      def readFully(pos: Long, n: Int): Array[Byte] = {
        val buf = new Array[Byte](n)
        in.readFully(pos, buf)
        buf
      }
      override def close(): Unit = in.close()
    }
  }

  /** Per-file stats of a [[writeHFiles]] directory read straight from
    * the trailers and key ranges (bounded-pool short reads — no data
    * block IO at any directory size): same shape as [[manifest]], so
    * [[regionPlan]] consumes either. The file-layout half of the
    * reference's pre-split/merge admin ops (HBaseManager.java) over real
    * HFile output.
    */
  def hfileManifest(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(path)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(hconf)
    val listing = Option(
        fs.globStatus(new org.apache.hadoop.fs.Path(root, "bucket=*/*.hfile")))
      .getOrElse(Array.empty)
    val files = listing.map(_.getPath.toString)
    require(files.nonEmpty, s"no HFiles found under $path")
    // the `_manifest` sidecar IS this manifest — read it when it matches
    // the listing, fall back to pooled trailer reads when it doesn't
    val rows = graft.sources.HFileManifest
      .readValid(fs, root, listing.toSeq)
      .map { entries =>
        files.toSeq.zip(entries).map { case (f, e) =>
          (e.bucket, f, e.entryCount, e.minHex, e.maxHex)
        }
      }
      .getOrElse {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(16, files.length))
        try {
          files.toSeq.map { f =>
            pool.submit(new java.util.concurrent.Callable[(Int, String, Long, String, String)] {
              def call(): (Int, String, Long, String, String) = {
                val rr = openRead(f, hconf)
                try {
                  val n = HFileReader.readTrailer(rr).entryCount
                  val (lo, hi) = HFileReader.rowkeyRange(rr)
                    .map { case (a, b) =>
                      (a.map(x => f"$x%02X").mkString, b.map(x => f"$x%02X").mkString)
                    }.getOrElse(("", ""))
                  (graft.sources.HFileSource.bucketOf(f), f, n, lo, hi)
                } finally rr.close()
              }
            })
          }.map(_.get())
        } finally pool.shutdown()
      }
    rows.toDF("bucket", "file", "n_cells", "min_key_hex", "max_key_hex")
  }

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
