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

  test("sampleFrames: stride-spaced frame rows per video, videos only") {
    val feats = Multimodal.decodeFeatures(media)
    val frames = Multimodal.sampleFrames(feats, stride = 4).collect()
    val videos = feats.filter($"kind" === "video")
      .select("doc_id", "n_frames").as[(Long, Int)].collect().toMap
    assert(frames.nonEmpty)
    // every row is a video doc with an in-range, stride-aligned index
    frames.foreach { r =>
      val (id, idx) = (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_idx"))
      assert(videos.contains(id))
      assert(idx % 4 == 0 && idx >= 0 && idx < videos(id))
    }
    // count per video = ceil(n_frames / stride)
    val perDoc = frames.groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.length)
    perDoc.foreach { case (id, n) =>
      assert(n == (videos(id) + 3) / 4, s"doc $id")
    }
    assert(perDoc.size == videos.size)
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

  test("payload dedup: the placeholder asset collapses per kind with " +
      "exact copy counts; unique payloads stay singletons") {
    val docs = sf("documents")
    val got = graft.queries.Pipeline.mmDedup(docs)
      .select("kind", "keep_id", "n_copies").as[(String, Long, Long)]
      .collect().toSeq
    val ids = docs.select("doc_id").as[Long].collect().toSeq
    val kinds = Seq("image", "audio", "video")
    val phByKind = ids.filter(_ % 10 == 0)
      .groupBy(id => kinds((id % 3).toInt)).view.mapValues(_.sorted).toMap
    // per kind, the placeholder group's copy count and min-id canonical
    phByKind.foreach { case (k, members) =>
      val grp = got.filter(g => g._1 == k && g._3 == members.size &&
        g._2 == members.min)
      assert(grp.size >= 1, s"placeholder group missing for $k")
    }
    // total rows = unique text payloads + one group per placeholder kind
    val nonPh = ids.filterNot(_ % 10 == 0).size
    assert(got.size.toLong >= nonPh, "unique payloads must stay singletons")
    assert(got.map(_._3).sum == ids.size, "every payload accounted once")
  }

  test("dedupPayloads dedups exactly the payload column it is given — " +
      "no hidden test-corpus substitution in the operator") {
    import org.apache.spark.sql.functions._
    val media = Seq(
      (1L, "image", "AAA"), (2L, "image", "AAA"), (3L, "image", "BBB"),
      (10L, "audio", "CCC") // id%10==0 must NOT be rewritten
    ).toDF("doc_id", "kind", "s")
      .withColumn("payload", encode(col("s"), "UTF-8")).drop("s")
    val got = Multimodal.dedupPayloads(media, "doc_id", "kind", "payload")
      .select("kind", "keep_id", "n_copies").as[(String, Long, Long)]
      .collect().toSeq
    assert(got.toSet == Set(("image", 1L, 2L), ("image", 3L, 1L),
      ("audio", 10L, 1L)))
  }

  test("nearDupPayloads: identical payloads at hamming 0, a few-byte " +
      "edit within the bound, different content silent, kinds scoped") {
    val base = ("the quick brown fox jumps over the lazy dog " * 8).trim
    val edited = base.updated(10, 'X').updated(200, 'Y') // tiny local edit
    val media = Seq(
      (1L, "image", base), (2L, "image", base),      // exact copy pair
      (3L, "image", edited),                          // near-dup of 1, 2
      (4L, "image", "completely different content about other topics " +
        "with unrelated words throughout this whole payload body text"),
      (5L, "audio", base))                            // other kind: scoped
      .toDF("doc_id", "kind", "s")
      .withColumn("payload", encode(col("s"), "UTF-8")).drop("s")
    val got = Multimodal
      .nearDupPayloads(media, "doc_id", "kind", "payload")
      .collect()
      .map(r => (r.getAs[String]("kind"), r.getAs[Long]("doc_a"),
        r.getAs[Long]("doc_b"), r.getAs[Int]("hamming")))
    val pairs = got.map(t => (t._2, t._3)).toSet
    assert(pairs.contains((1L, 2L)), s"exact copies must pair: ${got.toSeq}")
    assert(got.find(t => t._2 == 1L && t._3 == 2L).get._4 == 0,
      "identical payloads must be hamming 0")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)),
      s"few-byte edit must stay within the bound: ${got.toSeq}")
    assert(!got.exists(t => t._2 == 4L || t._3 == 4L),
      "different content must not pair")
    assert(!got.exists(t => t._3 == 5L),
      "pairs must be scoped per kind")
    // kernel sanity: hash is a pure function, edit moves few bits
    val h1 = graft.functions.MediaHashes.avgHash64(base.getBytes("UTF-8"))
    val h3 = graft.functions.MediaHashes.avgHash64(edited.getBytes("UTF-8"))
    assert(h1 == graft.functions.MediaHashes.avgHash64(base.getBytes("UTF-8")))
    assert(java.lang.Long.bitCount(h1 ^ h3) <= 3,
      s"local edit moved ${java.lang.Long.bitCount(h1 ^ h3)} bits")
  }
}
