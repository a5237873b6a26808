package graft.streaming

import graft.SparkSpec
import graft.model.{HColumn, HTableSchema}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import java.sql.Timestamp

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("streaming rollup matches batch rollup on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("event_ts", "event_type", "value")
    val q = Streams.rollupStream(events, "hour")
      .writeStream.format("memory").queryName("rollup_out")
      .outputMode("complete").start()
    try {
      val h0 = 1704067200000L // 2024-01-01T00:00Z
      input.addData(
        (ts(h0 + 1000), "click", 1.0), (ts(h0 + 2000), "click", 2.0),
        (ts(h0 + 3600 * 1000 + 1), "click", 5.0), (ts(h0 + 10), "view", 7.0))
      q.processAllAvailable()
      val out = spark.table("rollup_out")
        .orderBy("bucket_ms", "event_type").collect()
      assert(out.length == 3)
      assert(out(0).getAs[Long]("bucket_ms") == h0)
      assert(out(0).getAs[String]("event_type") == "click")
      assert(out(0).getAs[Long]("n_events") == 2)
      assert(out(0).getAs[Double]("sum_value") == 3.0)
      assert(out(1).getAs[String]("event_type") == "view")
      assert(out(2).getAs[Long]("bucket_ms") == h0 + 3600 * 1000)
    } finally q.stop()
  }

  test("streaming dedup drops same-fingerprint docs within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("event_ts", "doc_id", "text")
    val q = Streams.dedupStream(docs, "event_ts")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val t0 = 1704067200000L
      input.addData(
        (ts(t0), 1L, "same content"), (ts(t0 + 1000), 2L, "same content"),
        (ts(t0 + 2000), 3L, "other content"))
      q.processAllAvailable()
      // advance watermark far enough to emit results
      input.addData((ts(t0 + 7200 * 1000), 4L, "late marker"))
      q.processAllAvailable()
      val texts = spark.table("dedup_out").select("text")
        .as[String].collect().toSeq.sorted
      assert(texts.count(_ == "same content") == 1)
      assert(texts.contains("other content"))
    } finally q.stop()
  }

  test("upsert stream flushes sorted cell mutations per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val schema = HTableSchema(
      rowKey = Seq("id"),
      columns = Seq(HColumn("f", "v", "v", LongType)))
    val input = MemoryStream[(Long, Long)]
    val rows = input.toDF().toDF("id", "v")
    val batches = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    val q = Streams.upsertStream(rows, schema, (cells: DataFrame, _: Long) =>
      batches.synchronized {
        batches += cells.select(hex(col("rowkey"))).as[String].collect()
      }).start()
    try {
      input.addData((2L, 20L), (1L, 10L))
      q.processAllAvailable()
      val flushed = batches.synchronized(batches.filter(_.nonEmpty))
      assert(flushed.nonEmpty)
      // rowkey order within the flush (the HBase batch-Put invariant)
      assert(flushed.head.toSeq == flushed.head.toSeq.sorted)
      assert(flushed.head.length == 2)
    } finally q.stop()
  }
}
