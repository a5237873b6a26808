package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = sf("documents")
    .select(col("doc_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))

  test("manifest: kind cycle, sizes, content ids") {
    val out = Multimodal.manifest(sf("documents"), "doc_id", "text")
      .orderBy("doc_id").limit(3).collect()
    assert(out.map(_.getAs[String]("kind")).toSeq ==
      Seq("image", "audio", "video"))
    assert(out.forall(_.getAs[Long]("size_bytes") > 0))
    assert(out.forall(_.getAs[String]("content_id").length == 32))
  }

  test("decodeFeatures: schema, determinism, no shuffle, full coverage") {
    val n = media.count()
    val out = Multimodal.decodeFeatures(media)
    assert(out.schema == Multimodal.FeatureSchema)
    assert(out.count() == n)
    // partitioning preserved: mapPartitions must not add an exchange
    assert(out.rdd.getNumPartitions == media.rdd.getNumPartitions)
    // deterministic stub: same payload -> same features on a re-run
    val a = out.orderBy("doc_id").limit(5).collect()
    val b = Multimodal.decodeFeatures(media).orderBy("doc_id").limit(5).collect()
    assert(a.sameElements(b))
    // features are pure functions of the payload bytes
    val r = a.head
    assert(r.getSeq[Double](r.fieldIndex("features")).length == 8)
    assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("width") < 128)
  }
}
