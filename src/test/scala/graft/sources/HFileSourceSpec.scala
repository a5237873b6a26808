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

  private def partitionsFor(filters: org.apache.spark.sql.sources.Filter*) = {
    val sb = new HFileTable(out)
      .newScanBuilder(CaseInsensitiveStringMap.empty())
      .asInstanceOf[HFileScanBuilder]
    sb.pushFilters(filters.toArray)
    sb.build().toBatch.planInputPartitions()
      .map(_.asInstanceOf[HFileInputPartition])
  }

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
