package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.functions.hb
import graft.operators.BulkLoad
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, In}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("graft-hfile")`: schema, parity with readHFiles,
  * column pruning, and bucket/rowkey file pruning.
  */
class HFileSourceSpec extends SparkSpec {
  import spark.implicits._

  // one shared bulk-load directory: 4 buckets, small blocks
  private lazy val out: String = {
    val events = sf("events")
    val cells = events.select(
      concat(hb.encode(col("user_id")), hb.encode(col("event_id")))
        .as("rowkey"),
      lit("f").as("family"),
      lit("value").as("qualifier"),
      hb.encode(col("value")).as("value"),
      expr("(ts DIV 1000000000 DIV 3600) * 3600").cast("int").as("hour_sec"),
      col("user_id"))
    val prepared = BulkLoad.prepare(cells, buckets = 4, numPartitions = 4,
      saltBase = Some(hb.encode(col("user_id"))),
      epochSec = Some(col("hour_sec")))
    val dir = Files.createTempDirectory("hfile_dsv2").toString
    BulkLoad.writeHFiles(prepared, dir, tsCol = Some("hour_sec"),
      blockSize = 1024)
    dir
  }

  private def nFiles: Int =
    new java.io.File(out).listFiles.filter(_.getName.startsWith("bucket="))
      .flatMap(_.listFiles).count(_.getName.endsWith(".hfile"))

  private def partitionsIn(dir: String,
                           filters: org.apache.spark.sql.sources.Filter*) = {
    val sb = new HFileTable(dir)
      .newScanBuilder(CaseInsensitiveStringMap.empty())
      .asInstanceOf[HFileScanBuilder]
    sb.pushFilters(filters.toArray)
    sb.build().toBatch.planInputPartitions()
      .map(_.asInstanceOf[HFileInputPartition])
  }

  private def partitionsFor(filters: org.apache.spark.sql.sources.Filter*) =
    partitionsIn(out, filters: _*)

  test("reads back exactly what readHFiles reads") {
    val v2 = spark.read.format("graft-hfile").load(out)
    assert(v2.schema == HFileSource.Schema)
    val a = v2.select(col("bucket"), hex(col("rowkey")).as("k"),
      col("family"), col("qualifier"), col("ts"), hex(col("value")).as("v"))
    val b = BulkLoad.readHFiles(spark, out)
      .select(col("bucket"), hex(col("rowkey")).as("k"),
        col("family"), col("qualifier"), col("ts"), hex(col("value")).as("v"))
    assert(a.count() == b.count() && a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("file is readable as a metadata column and never demanded on write") {
    val df = spark.read.format("graft-hfile").load(out)
      .select(col("file"), col("bucket"))
    assert(df.select("file").distinct().count() == nFiles)
  }

  test("column pruning reaches the scan") {
    val df = spark.read.format("graft-hfile").load(out).select("qualifier")
    val scans = df.queryExecution.executedPlan.collect {
      case s: BatchScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("qualifier"))
  }

  test("bucket filters prune whole directories at plan time") {
    val all = partitionsFor()
    assert(all.length == nFiles && all.length > 1)
    val one = partitionsFor(EqualTo("bucket", 2))
    assert(one.nonEmpty && one.length < all.length)
    assert(one.forall(_.bucket == 2))
    val two = partitionsFor(In("bucket", Array(0, 2)))
    assert(two.forall(p => p.bucket == 0 || p.bucket == 2))
    // end-to-end: pruned read returns the same rows as a full-scan filter
    val pruned = spark.read.format("graft-hfile").load(out)
      .filter($"bucket" === 2)
    assert(pruned.count() ==
      BulkLoad.readHFiles(spark, out).filter($"bucket" === 2).count())
    assert(pruned.count() > 0)
  }

  test("bucket is parsed from the parent directory only") {
    assert(HFileSource.bucketOf("/data/bucket=3/part-0.hfile") == 3)
    // an ancestor dir that happens to contain bucket= must not win
    assert(HFileSource.bucketOf("/data/bucket=9/out/bucket=1/f.hfile") == 1)
    assert(HFileSource.bucketOf("/data/bucket=9/out/f.hfile") == -1)
    assert(HFileSource.bucketOf("f.hfile") == -1)
  }

  test("existing-but-empty directory is a valid empty scan") {
    val dir = Files.createTempDirectory("hfile_empty").toString
    assert(spark.read.format("graft-hfile").load(dir).count() == 0)
    intercept[Exception] {
      spark.read.format("graft-hfile").load(s"$dir/never_created").count()
    }
  }

  test("rowkey pruning over 120 files stays sub-second (parallel trailer " +
      "reads) and still prunes to one file") {
    val dir = Files.createTempDirectory("hfile_many").toString
    (0 until 120).foreach { i =>
      val d = new java.io.File(s"$dir/bucket=${i % 4}"); d.mkdirs()
      val fos = new java.io.FileOutputStream(
        new java.io.File(d, f"part-$i%05d.hfile"))
      val w = new HFileWriter(fos, 256)
      (0 until 10).foreach { j =>
        w.append(HFile.HCell(f"row${i * 10 + j}%06d".getBytes, "f".getBytes,
          "q".getBytes, 0L, "v".getBytes))
      }
      w.finish(); fos.close()
    }
    val key = f"row${57 * 10 + 3}%06d".getBytes
    // best-of-3: the first call pays one-time pool/classload cost, and a
    // loaded machine (the full suite runs many Spark jobs in parallel)
    // can tax any single run — the MINIMUM is the structural number, and
    // a regression to per-file sequential data-block reads would miss
    // the bound in every run, not just one
    val (hit, sec) = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val h = partitionsIn(dir,
        org.apache.spark.sql.sources.EqualTo("rowkey", key))
      (h, (System.nanoTime() - t0) / 1e9)
    }.minBy(_._2)
    assert(hit.length == 1 && hit.head.file.contains("part-00057"))
    assert(sec < 2.0, f"plan-time pruning took $sec%.2fs for 120 files")
  }

  // --- `_manifest` sidecar ---------------------------------------------

  /** 4 buckets × 10 keys with DISJOINT per-bucket key ranges, so rowkey
    * range pruning discriminates between files.
    */
  private def writeRangedDir(): String = {
    val dir = Files.createTempDirectory("hfile_manifest").toString
    val prepared = (0 until 40)
      .map(i => (i / 10, f"k$i%04d".getBytes("UTF-8"), "f", "q", Array[Byte](1)))
      .toDF("bucket", "salted_key", "family", "qualifier", "value")
      .repartition(4, $"bucket")
    BulkLoad.writeHFiles(prepared, dir)
    dir
  }

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def listingOf(dir: String) = fsOf(dir).globStatus(
    new org.apache.hadoop.fs.Path(dir, "bucket=*/*.hfile")).toSeq

  test("writeHFiles commits a _manifest that matches the files exactly") {
    val dir = writeRangedDir()
    val entries = HFileManifest.readValid(fsOf(dir),
      new org.apache.hadoop.fs.Path(dir), listingOf(dir))
    assert(entries.isDefined, "sidecar must validate against the listing")
    val es = entries.get
    assert(es.map(_.entryCount).sum == 40)
    assert(es.map(_.bucket).toSet == Set(0, 1, 2, 3))
    // stats in the sidecar equal stats read from the trailers
    val fromTrailers = BulkLoad.hfileManifest(spark, dir)
    HFileManifest.delete(fsOf(dir), new org.apache.hadoop.fs.Path(dir))
    val pooled = BulkLoad.hfileManifest(spark, dir)
    assert(fromTrailers.collect().toSet == pooled.collect().toSet)
  }

  test("_manifest: planning and trailer stats need zero per-file reads") {
    val dir = writeRangedDir()
    // bucket 0 holds k0000..k0009 — this filter keeps only its file(s)
    val le = org.apache.spark.sql.sources
      .LessThanOrEqual("rowkey", "k0005".getBytes("UTF-8"))
    val withManifest = partitionsIn(dir, le).map(_.file).toSet
    // pooled ground truth: same filter with the sidecar removed
    val manifestBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_manifest"))
    HFileManifest.delete(fsOf(dir), new org.apache.hadoop.fs.Path(dir))
    val pooledTruth = partitionsIn(dir, le).map(_.file).toSet
    assert(withManifest == pooledTruth)
    assert(withManifest.nonEmpty &&
      withManifest.forall(_.contains("bucket=0")))
    // restore the sidecar, then zero out every hfile's CONTENT in place
    // (same length) — any per-file read now sees garbage and throws, so
    // planning and pushed-down count(*) succeeding proves zero reads
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_manifest"), manifestBytes)
    listingOf(dir).foreach { st =>
      val p = java.nio.file.Paths.get(st.getPath.toUri)
      java.nio.file.Files.write(p, new Array[Byte](st.getLen.toInt))
    }
    assert(partitionsIn(dir, le).map(_.file).toSet == pooledTruth)
    val n = spark.read.format("graft-hfile").load(dir)
      .agg(count(lit(1))).as[Long].head()
    assert(n == 40, "count(*) must answer from the sidecar alone")
    // a point-GET must consult blooms = per-file reads on garbage -> fails
    intercept[Exception] {
      partitionsIn(dir, EqualTo("rowkey", "k0003".getBytes("UTF-8")))
    }
  }

  test("stale _manifest falls back to pooled reads, never wrong") {
    val dir = writeRangedDir()
    // add a file the sidecar does not know (copy of an existing one)
    val st = listingOf(dir).head
    val src = java.nio.file.Paths.get(st.getPath.toUri)
    java.nio.file.Files.copy(src, src.resolveSibling("part-extra.hfile"))
    assert(HFileManifest.readValid(fsOf(dir),
      new org.apache.hadoop.fs.Path(dir), listingOf(dir)).isEmpty)
    // planning still works (pooled), and sees the new file
    val all = partitionsIn(dir)
    assert(all.length == listingOf(dir).size)
    val le = org.apache.spark.sql.sources
      .LessThanOrEqual("rowkey", "k0005".getBytes("UTF-8"))
    assert(partitionsIn(dir, le).nonEmpty)
  }

  test("DSv2 write commits a _manifest; append keeps it valid") {
    val dir = Files.createTempDirectory("hfile_dsv2_manifest").toString
    def rows(ids: Range) = ids
      .map(i => (i % 2, f"r$i%04d".getBytes("UTF-8"), "f", "q", 0L,
        Array[Byte](1), 4))
      .toDF("bucket", "rowkey", "family", "qualifier", "ts", "value",
        "key_type")
    rows(0 until 20).write.format("graft-hfile").mode("overwrite").save(dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    assert(HFileManifest.readValid(fsOf(dir), root, listingOf(dir)).isDefined)
    rows(20 until 30).write.format("graft-hfile").mode("append").save(dir)
    val merged = HFileManifest.readValid(fsOf(dir), root, listingOf(dir))
    assert(merged.isDefined, "append must merge, not invalidate")
    assert(merged.get.map(_.entryCount).sum == 30)
    assert(spark.read.format("graft-hfile").load(dir).count() == 30)
  }

  test("restore drops the destination _manifest (content rewritten in place)") {
    val dir = writeRangedDir()
    val bak = Files.createTempDirectory("hfile_bak").toString
    BulkLoad.backup(spark, dir, bak)
    BulkLoad.restore(spark, bak, dir)
    assert(!new java.io.File(dir, "_manifest").exists())
    // next planner read falls back to pooled and still answers
    assert(spark.read.format("graft-hfile").load(dir).count() == 40)
  }

  test("DSv2 write: write-then-read parity, Spark plans the range sort") {
    val src = spark.read.format("graft-hfile").load(out).drop("file")
    val dir = Files.createTempDirectory("hfile_dsv2_w").toString
    src.write.format("graft-hfile").mode("overwrite").save(dir)
    assert(!new java.io.File(s"$dir/_inprogress").exists())
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("bucket"), hex(col("rowkey")).as("k"), col("family"),
        col("qualifier"), col("ts"), hex(col("value")).as("v"))
    val a = canon(src)
    val b = canon(spark.read.format("graft-hfile").load(dir))
    assert(a.count() == b.count() && a.except(b).isEmpty && b.except(a).isEmpty)
    // append adds a second run set (distinct query-id file names)…
    src.write.format("graft-hfile").mode("append").save(dir)
    assert(spark.read.format("graft-hfile").load(dir).count() == 2 * src.count())
    // …and overwrite truncates back down to a subset
    src.filter($"bucket" === 2).write.format("graft-hfile")
      .mode("overwrite").save(dir)
    val left = spark.read.format("graft-hfile").load(dir)
    assert(left.count() == src.filter($"bucket" === 2).count())
    assert(left.select("bucket").distinct().collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("SQL over a temp view works, including the pushed count") {
    // direct `format`.`path` SQL is reserved for built-in file sources;
    // a view over the DSv2 load is the supported SQL surface
    spark.read.format("graft-hfile").load(out)
      .createOrReplaceTempView("hfile_cells")
    val n = spark.sql("SELECT count(*) FROM hfile_cells").head().getLong(0)
    assert(n == BulkLoad.readHFiles(spark, out).count())
    val rows = spark.sql(
      "SELECT qualifier, count(*) AS c FROM hfile_cells GROUP BY 1")
      .collect()
    assert(rows.length == 1 && rows.head.getLong(1) == n)
  }

  test("DSv2 write: maxFileBytes option rolls files within a bucket") {
    val src = spark.read.format("graft-hfile").load(out).drop("file")
    val dir = Files.createTempDirectory("hfile_dsv2_roll").toString
    src.write.format("graft-hfile").mode("overwrite")
      .option("blockSize", "1024").option("maxFileBytes", "8192").save(dir)
    val perBucket = spark.read.format("graft-hfile").load(dir)
      .select(col("file"), col("bucket")).distinct()
      .groupBy("bucket").count().collect().map(_.getLong(1))
    assert(perBucket.exists(_ > 1))
    assert(spark.read.format("graft-hfile").load(dir).count() == src.count())
  }

  test("DSv2 write: gz/snappy compression options round-trip") {
    val src = spark.read.format("graft-hfile").load(out).drop("file")
    for ((name, id) <- Seq("gz" -> HFile.CodecGz,
                           "snappy" -> HFile.CodecSnappy)) {
      val dir = Files.createTempDirectory(s"hfile_dsv2_$name").toString
      src.write.format("graft-hfile").mode("overwrite")
        .option("compression", name).option("blockSize", "1024").save(dir)
      val back = spark.read.format("graft-hfile").load(dir)
      assert(back.count() == src.count(), name)
      // the written files really carry the codec ordinal in the trailer
      // (skip the local-FS .crc sidecars)
      val f = new java.io.File(dir).listFiles
        .filter(_.getName.startsWith("bucket=")).head.listFiles
        .filter(_.getName.endsWith(".hfile")).head
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val t = HFileReader.readTrailer(new HFileReader.BytesRead(bytes))
      assert(t.compressionCodec == id, name)
    }
  }

  test("DSv2 write: encoding option produces DATABLKE files that read back") {
    val src = spark.read.format("graft-hfile").load(out).drop("file")
    for (name <- Seq("prefix", "diff", "fast_diff")) {
      val dir = Files.createTempDirectory(s"hfile_dsv2_enc_$name").toString
      src.write.format("graft-hfile").mode("overwrite")
        .option("encoding", name).option("blockSize", "1024").save(dir)
      val back = spark.read.format("graft-hfile").load(dir)
      assert(back.count() == src.count(), name)
      assert(back.drop("file").except(src).isEmpty &&
        src.except(back.drop("file")).isEmpty, name)
      val f = new java.io.File(dir).listFiles
        .filter(_.getName.startsWith("bucket=")).head.listFiles
        .filter(_.getName.endsWith(".hfile")).head
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      assert(bytes.slice(0, 8).sameElements(HFile.BlockMagicEncodedData), name)
    }
    // unknown encoding names fail on the driver, before any task runs
    intercept[IllegalArgumentException] {
      src.write.format("graft-hfile").mode("overwrite")
        .option("encoding", "row_index_v1")
        .save(Files.createTempDirectory("hfile_dsv2_enc_bad").toString)
    }
  }

  test("DSv2 write: unknown and mistyped columns are rejected loudly") {
    val src = spark.read.format("graft-hfile").load(out).drop("file")
    val dir = Files.createTempDirectory("hfile_dsv2_bad").toString
    intercept[Exception] {
      src.withColumn("extra", lit(1)).write.format("graft-hfile")
        .mode("overwrite").save(dir)
    }
    // ts as int is fine (Spark upcasts on by-name resolution); a binary
    // column fed an int is not castable and must fail
    intercept[Exception] {
      src.withColumn("value", lit(1)).write.format("graft-hfile")
        .mode("overwrite").save(dir)
    }
  }

  test("hfile_point_lookup: scans fewer partitions than files and matches " +
      "the raw events table") {
    val events = sf("events")
    val sfDir = "/root/testdata/sf0.001"
    val df = graft.queries.HModel.hfilePointLookup(events, sfDir)
    val rows = df.collect()
    val expected = events.filter(col("user_id") === 7)
      .select(col("event_id"), expr("ts DIV 1000000").as("ts_ms"), col("value"))
      .orderBy("event_id").collect()
    assert(rows.nonEmpty && rows.length == expected.length)
    rows.zip(expected).foreach { case (a, b) => assert(a == b) }
    // plan shape: bucket + rowkey pushdown leave a near-point scan
    val dir = graft.queries.HModel.ensureLookupDir(events, sfDir, 4)
    val totalFiles = new java.io.File(dir).listFiles
      .filter(_.getName.startsWith("bucket="))
      .flatMap(_.listFiles).count(_.getName.endsWith(".hfile"))
    // the orderBy makes this an AQE plan; the scan hides inside query-stage
    // leaves, so collect recursively
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[BatchScanExec] =
      p.collect {
        case s: BatchScanExec => Seq(s)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansOf(q.plan)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansOf(a.executedPlan)
      }.flatten
    val scans = scansOf(df.queryExecution.executedPlan)
    val nParts = scans.head.inputRDD.getNumPartitions
    assert(nParts >= 1 && nParts < totalFiles,
      s"expected pruned scan, got $nParts of $totalFiles files")
  }

  test("bloom prunes point-GETs that key ranges cannot: overlapping files") {
    // two files in one bucket whose key RANGES fully overlap (even keys in
    // one, odd in the other) — range pruning keeps both, the bloom does not
    val dir = Files.createTempDirectory("hfile_bloom").toString
    val d = new java.io.File(s"$dir/bucket=0"); d.mkdirs()
    Seq(0, 1).foreach { parity =>
      val fos = new java.io.FileOutputStream(
        new java.io.File(d, s"part-$parity.hfile"))
      val w = new HFileWriter(fos, 1024)
      (0 until 200).filter(_ % 2 == parity).foreach { j =>
        w.append(HFile.HCell(f"key$j%05d".getBytes, "f".getBytes,
          "q".getBytes, 0L, "v".getBytes))
      }
      w.finish(); fos.close()
    }
    val even = partitionsIn(dir,
      org.apache.spark.sql.sources.EqualTo("rowkey", "key00042".getBytes))
    assert(even.length == 1 && even.head.file.contains("part-0"))
    val odd = partitionsIn(dir,
      org.apache.spark.sql.sources.EqualTo("rowkey", "key00043".getBytes))
    assert(odd.length == 1 && odd.head.file.contains("part-1"))
    // a key in neither file: both pruned at plan time
    val none = partitionsIn(dir,
      org.apache.spark.sql.sources.EqualTo("rowkey", "key00042x".getBytes))
    assert(none.isEmpty)
    // and the end-to-end read still returns the right row
    val got = spark.read.format("graft-hfile").load(dir)
      .filter($"rowkey" === lit("key00042".getBytes))
    assert(got.count() == 1)
  }

  test("count(*) answers from trailers without scanning a data block") {
    val df = spark.read.format("graft-hfile").load(out)
    val full = df.count()
    assert(full == BulkLoad.readHFiles(spark, out).count())
    // the plan is a local (driver) scan, not a file-reading batch scan
    val plan = df.groupBy().count().queryExecution.executedPlan.toString
    assert(plan.contains("count-from-trailers") || !plan.contains("BatchScan"),
      plan)
    // bucket filters are consumed exactly and still push the count
    val b2 = df.filter($"bucket" === 2).count()
    assert(b2 == BulkLoad.readHFiles(spark, out)
      .filter($"bucket" === 2).count())
    // rowkey filters keep the row scan (no bogus trailer count)
    val someKey = spark.read.format("graft-hfile").load(out)
      .select($"rowkey").head().getAs[Array[Byte]](0)
    assert(df.filter($"rowkey" === lit(someKey)).count() >= 1)
  }

  test("min/max(rowkey) and per-bucket counts answer from key ranges") {
    val df = spark.read.format("graft-hfile").load(out)
    val full = BulkLoad.readHFiles(spark, out)
    // global min/max + count in one pushed aggregate
    val g = df.agg(min($"rowkey"), max($"rowkey"), count(lit(1))).head()
    val e = full.agg(min($"rowkey"), max($"rowkey"), count(lit(1))).head()
    assert(g.getAs[Array[Byte]](0).sameElements(e.getAs[Array[Byte]](0)))
    assert(g.getAs[Array[Byte]](1).sameElements(e.getAs[Array[Byte]](1)))
    assert(g.getLong(2) == e.getLong(2))
    // grouped by bucket
    val gb = df.groupBy($"bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getLong(1)))
    val eb = full.groupBy($"bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(gb.toSeq == eb.toSeq)
    val plan = df.groupBy($"bucket").count().queryExecution.executedPlan.toString
    assert(plan.contains("stats-from-trailers") || !plan.contains("BatchScan"),
      plan)
  }

  test("rowkey range filters skip files by trailer key range") {
    val full = spark.read.format("graft-hfile").load(out)
    val maxKey = full.agg(max($"rowkey")).head().getAs[Array[Byte]](0)
    // strictly above the global max: every file pruned
    assert(partitionsFor(GreaterThan("rowkey", maxKey)).isEmpty)
    // a specific existing key lives in exactly one file (sorted
    // non-overlapping runs per bucket, bucket is the key's salt prefix)
    val someKey = full.select($"rowkey").head().getAs[Array[Byte]](0)
    val hit = partitionsFor(EqualTo("rowkey", someKey))
    assert(hit.length == 1)
    // and the row-level filter still applies above the pruned scan
    val got = full.filter($"rowkey" === lit(someKey))
    assert(got.count() >= 1)
    val scans = got.queryExecution.executedPlan.collect {
      case s: BatchScanExec => s
    }
    assert(scans.head.inputRDD.getNumPartitions == 1)
  }
}
