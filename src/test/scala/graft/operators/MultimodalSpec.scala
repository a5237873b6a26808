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

  test("REAL image decode: pngPayload renders a decodable PNG whose " +
      "raster round-trips the closed form exactly; features are the " +
      "exact 4x2 integer cell means") {
    import graft.functions.MediaCodec
    Seq(0L, 12345L, 999999L).foreach { id =>
      val png = MediaCodec.pngPayload(id)
      // real container: PNG signature bytes
      assert((png(0) & 0xFF) == 0x89 && png(1) == 'P'.toByte &&
        png(2) == 'N'.toByte && png(3) == 'G'.toByte)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      val (w, h) = (MediaCodec.imageWidth(id), MediaCodec.imageHeight(id))
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) ==
          MediaCodec.imagePixel(id, x, y), s"id=$id px($x,$y)")
      // features = exact integer cell means of the closed form
      val f = MediaCodec.decodeImage(png).get
      assert(f.width == w && f.height == h)
      val sums = new Array[Long](8); val cnts = new Array[Long](8)
      for (y <- 0 until h; x <- 0 until w) {
        val g = (y * 2 / h) * 4 + (x * 4 / w)
        sums(g) += MediaCodec.imagePixel(id, x, y); cnts(g) += 1
      }
      (0 until 8).foreach(g =>
        assert(f.features(g) == sums(g).toDouble / cnts(g), s"id=$id g=$g"))
    }
    // undecodable bytes are None, not an exception
    assert(MediaCodec.decodeImage("not a png".getBytes("UTF-8")).isEmpty)
    assert(MediaCodec.decodeImage(Array.empty[Byte]).isEmpty)
  }

  test("REAL audio decode: wavPayload writes a RIFF/WAVE container " +
      "whose parsed format and PCM frames round-trip the closed form, " +
      "CONFORMANT both ways against javax.sound itself") {
    import graft.functions.MediaCodec
    import javax.sound.sampled.{AudioFileFormat, AudioFormat,
      AudioInputStream, AudioSystem}
    Seq(1L, 777L, 424242L).foreach { id =>
      val wav = MediaCodec.wavPayload(id)
      assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
        new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
      val a = MediaCodec.decodeWav(wav).get
      val n = MediaCodec.audioSamples(id)
      assert(a.sampleRate == MediaCodec.AudioRateHz && a.bits == 16 &&
        a.nSamples == n)
      val sums = new Array[Long](8); val cnts = new Array[Long](8)
      (0 until n).foreach { i =>
        val g = (i.toLong * 8 / n).toInt
        sums(g) += MediaCodec.audioSample(id, i); cnts(g) += 1
      }
      (0 until 8).foreach(g =>
        assert(a.features(g) == sums(g).toDouble / cnts(g), s"id=$id g=$g"))
      // conformance, direction 1: javax.sound parses OUR container
      // back to the exact format and PCM frames (the writer is a real
      // WAV, not a private format that only our parser accepts)
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      try {
        val f = ais.getFormat
        assert(f.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
          f.getSampleRate.toInt == MediaCodec.AudioRateHz &&
          f.getSampleSizeInBits == 16 && f.getChannels == 1 &&
          !f.isBigEndian, s"javax.sound disagrees on format: $f")
        val pcm = ais.readAllBytes()
        assert(pcm.length == n * 2)
        (0 until n).foreach { i =>
          val v = (((pcm(2 * i) & 0xFF) | (pcm(2 * i + 1) << 8)))
            .toShort.toInt
          assert(v == MediaCodec.audioSample(id, i), s"id=$id pcm[$i]")
        }
      } finally ais.close()
    }
    // conformance, direction 2: our parser decodes a WAV that
    // javax.sound WROTE (provider header layout, not ours) identically
    locally {
      val n = 96
      val pcm = new Array[Byte](n * 2)
      (0 until n).foreach { i =>
        val v = MediaCodec.audioSample(5L, i)
        pcm(2 * i) = (v & 0xFF).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      val fmt = new AudioFormat(MediaCodec.AudioRateHz.toFloat, 16, 1,
        true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      finally ais.close()
      val a = MediaCodec.decodeWav(bos.toByteArray).get
      assert(a.sampleRate == MediaCodec.AudioRateHz && a.nSamples == n)
      val sums = new Array[Long](8); val cnts = new Array[Long](8)
      (0 until n).foreach { i =>
        val g = (i.toLong * 8 / n).toInt
        sums(g) += MediaCodec.audioSample(5L, i); cnts(g) += 1
      }
      (0 until 8).foreach(g =>
        assert(a.features(g) == sums(g).toDouble / cnts(g)))
    }
    assert(MediaCodec.decodeWav("not a wav".getBytes("UTF-8")).isEmpty)
    assert(MediaCodec.decodeWav(Array.empty[Byte]).isEmpty)
    // a stereo/8-bit/non-PCM fmt is rejected, not mis-decoded
    val stereo = MediaCodec.wavPayload(1L).clone()
    stereo(22) = 2 // channels = 2
    assert(MediaCodec.decodeWav(stereo).isEmpty)
  }

  test("imageAHash64 hashes what the image LOOKS like: a re-encoded " +
      "copy lands at hamming 0, a small local edit within a few bits, " +
      "different content far, undecodable bytes null") {
    import graft.functions.MediaCodec
    val id = 54321L
    val (w, h) = (MediaCodec.imageWidth(id), MediaCodec.imageHeight(id))
    val orig = MediaCodec.pngPayload(id)
    val a = MediaCodec.imageAHash64(orig)
    assert(a != null)
    // re-encode the SAME pixels (fresh encoder run): different bytes
    // are possible, identical pixels are certain -> hamming 0
    val reenc = MediaCodec.pngOf(w, h, MediaCodec.imagePixel(id, _, _))
    assert(MediaCodec.imageAHash64(reenc) == a)
    // a small local edit (one corner cell brightened) moves few bits
    val edited = MediaCodec.pngOf(w, h, (x, y) =>
      if (x < w / 8 && y < h / 8) 255 else MediaCodec.imagePixel(id, x, y))
    val e = MediaCodec.imageAHash64(edited)
    val d = java.lang.Long.bitCount(a ^ e)
    assert(d >= 1 && d <= 8, s"local edit moved $d bits")
    // structurally different content is far
    val other = MediaCodec.pngOf(w, h, (x, y) =>
      if ((x + y) % 2 == 0) 255 else 0)
    assert(java.lang.Long.bitCount(
      a ^ MediaCodec.imageAHash64(other)) > 8)
    assert(MediaCodec.imageAHash64("junk".getBytes("UTF-8")) == null)
  }

  test("decodeFeatures takes the REAL codec path for decodable image/" +
      "audio payloads and the stub path for video and undecodable " +
      "bytes") {
    import graft.functions.MediaCodec
    val rows = Seq(
      (3L, "image", MediaCodec.pngPayload(3L)),            // real PNG
      (4L, "audio", MediaCodec.wavPayload(4L)),            // real WAV
      (5L, "video", "fake video bytes".getBytes("UTF-8")), // no JDK codec
      (6L, "image", "corrupt".getBytes("UTF-8")))          // quarantine
    val media = spark.createDataFrame(rows).toDF("doc_id", "kind", "payload")
    val got = Multimodal.decodeFeatures(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // image: real decoded dims (16..32 by construction, below the
    // stub's 64..128 band) and the closed-form cell means
    assert(got(3L).getAs[Int]("width") == MediaCodec.imageWidth(3L))
    assert(got(3L).getAs[Int]("height") == MediaCodec.imageHeight(3L))
    assert(got(3L).getAs[Int]("n_frames") == 1)
    // audio: container-parsed rate/bits/frame-count
    assert(got(4L).getAs[Int]("width") == MediaCodec.AudioRateHz)
    assert(got(4L).getAs[Int]("height") == 16)
    assert(got(4L).getAs[Int]("n_frames") == MediaCodec.audioSamples(4L))
    // video + corrupt image: the deterministic stub band
    Seq(5L, 6L).foreach { id =>
      val wd = got(id).getAs[Int]("width")
      assert(wd >= 64 && wd < 128, s"doc $id must take the stub path")
    }
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
