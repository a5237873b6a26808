package graft.operators

import graft.SparkSpec
import graft.model.{HColumn, HTableSchema}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

class MutationsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = HTableSchema(
    rowKey = Seq("id"),
    columns = Seq(
      HColumn("f", "name", "name", StringType),
      HColumn("f", "score", "score", LongType)))

  private def rows = Seq(
    (1L, "alice", 10L, "I"),
    (2L, "bob", 20L, "U"),
    (3L, "carol", 30L, "D"),
    (1L, "alice2", 11L, "U")
  ).toDF("id", "name", "score", "row_kind")

  test("row kinds map to PUT cells and DELETE markers") {
    val m = Mutations.toMutations(rows, schema)
    val byOp = m.groupBy("op").count().as[(String, Long)].collect().toMap
    assert(byOp(Mutations.OpPut) == 6)    // 3 upsert rows × 2 columns
    assert(byOp(Mutations.OpDelete) == 1)
    val del = m.filter(col("op") === Mutations.OpDelete).head()
    assert(del.getAs[String]("family") == null)
    assert(del.getAs[Array[Byte]]("rowkey").toSeq ==
      graft.functions.BytesCodec.encodeLong(3L).toSeq)
  }

  test("typed cells bulk-load as delete-marker HFiles (B8 -> B11)") {
    // collapse to the latest mutation per key first — the HFile writer
    // rejects duplicate full cell keys by design (same id twice at the
    // same ts is a version conflict the stream must resolve upstream)
    val latest = rows.groupBy("id")
      .agg(max_by(struct(col("name"), col("score"), col("row_kind")),
        col("name")).as("m"))
      .select(col("id"), col("m.name"), col("m.score"), col("m.row_kind"))
      .withColumn("event_ms", col("id") * 1000L + 7L)
    val typed = Mutations.toTypedCells(
      Mutations.toMutations(latest, schema, tsCol = Some("event_ms")),
      schema, tsCol = Some("event_ms"))
    val prepared = BulkLoad.prepare(typed, buckets = 2, numPartitions = 2)
    val out = java.nio.file.Files.createTempDirectory("mut_hfiles").toString
    BulkLoad.writeHFiles(prepared, out, tsCol = Some("event_ms"),
      typeCol = Some("key_type"))
    val back = BulkLoad.readHFiles(spark, out)
    // 2 surviving upsert keys x 2 columns = 4 puts; 1 delete row x 1
    // family marker
    assert(back.filter($"key_type" === 4).count() == 4)
    val markers = back.filter($"key_type" === 14).collect()
    assert(markers.length == 1)
    assert(markers.head.getAs[String]("family") == "f")
    assert(markers.head.getAs[String]("qualifier").isEmpty)
    assert(markers.head.getAs[Array[Byte]]("value").isEmpty)
    // real event time survives onto the marker (ts=0 would mask nothing)
    assert(markers.head.getAs[Long]("ts") == 3007L)
    assert(back.filter($"key_type" === 4).collect()
      .forall(_.getAs[Long]("ts") > 0L))
  }

  test("flush batches respect maxMutations and rowkey order") {
    val m = Mutations.toMutations(rows.repartition(1), schema)
    MutationsSpec.clear()
    Mutations.flushBatches(m, maxMutations = 3)(MutationsSpec.collectBatch)
    val batches = MutationsSpec.toSeq
    assert(batches.nonEmpty)
    assert(batches.forall(_.size <= 3))
    assert(batches.map(_.size).sum == 7)
    // rowkey order inside each flush call (batch-Put invariant)
    batches.foreach { b =>
      val keys = b.map(_.getAs[Array[Byte]]("rowkey").map("%02x".format(_)).mkString)
      assert(keys == keys.sorted)
    }
  }
}

/** Static sink shared with executor threads (local-mode single JVM). */
object MutationsSpec {
  private val buf =
    java.util.Collections.synchronizedList(new java.util.ArrayList[Seq[Row]]())
  def collectBatch(rows: Seq[Row]): Unit = buf.add(rows)
  def clear(): Unit = buf.clear()
  def toSeq: Seq[Seq[Row]] = {
    import scala.jdk.CollectionConverters._
    buf.asScala.toSeq
  }
}
