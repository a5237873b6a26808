package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (SURVEY.md §2 F-series): media payloads
  * as opaque BINARY columns with typed metadata, plus the
  * batch-decode/feature-extract plumbing a training pipeline hangs off
  * them.
  *
  * [[decodeFeatures]]'s decode is REAL for images and audio: images
  * via the JDK's headless `javax.imageio` (PNG/JPEG/BMP/GIF/TIFF),
  * audio via [[graft.functions.MediaCodec]]'s conformant RIFF/WAVE
  * chunk parser (hand-rolled — `AudioSystem`'s provider registry
  * serializes concurrent callers, a global lock a 32-thread decode
  * kernel cannot afford; conformance spec-pinned both ways against
  * `javax.sound` itself) — oracle-checked end-to-end by the
  * mm_decode / mm_decode_audio / mm_phash_image rows. Only VIDEO falls
  * back to a clearly-marked deterministic stub (the JDK has no video
  * codec), as does any payload the real decoders cannot parse — a
  * corrupt file must yield a quarantinable row, not kill a 100 TB job.
  */
object Multimodal {

  /** Modality assignment used by the manifest (doc_id mod 3). */
  private val Kinds = Seq("image", "audio", "video")

  /** F1: manifest over payload columns: byte size, content id, kind,
    * per-kind sizing stats derivable by any reader of the same bytes.
    */
  def manifest(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = encode(col(textCol), "UTF-8") // stand-in binary payload
    docs.select(
      col(idCol),
      element_at(typedLit(Kinds), (pmod(col(idCol), lit(3)) + 1).cast("int"))
        .as("kind"),
      octet_length(payload).cast("long").as("size_bytes"),
      md5(payload).as("content_id"))
  }

  /** F4: exact payload dedup — the FIRST pass of every real image/media
    * dedup pipeline (byte-identical files: re-posted assets, default
    * thumbnails, placeholder images — the dominant duplicate class in
    * web media corpora). Fingerprint = md5 of the raw payload bytes in
    * `payloadCol` (BINARY), grouped per `kindCol`; each group reports
    * its min-id canonical and copy count, so curation drops
    * `n_copies - 1` files per group without decoding anything. One
    * partial-agg shuffle keyed on 16-byte fingerprints — payload bytes
    * die at the map side. The operator dedups whatever payload column it
    * is given; synthetic-corpus construction (the placeholder-asset
    * substitution the benchmark query uses) lives in the query wrapper,
    * not here.
    */
  def dedupPayloads(media: DataFrame, idCol: String, kindCol: String,
                    payloadCol: String): DataFrame = {
    media.select(col(idCol), col(kindCol).as("kind"),
        col(payloadCol).as("p"))
      .groupBy(col("kind"), md5(col("p")).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"),
        min(octet_length(col("p")).cast("long")).as("size_bytes"))
      .orderBy(col("kind"), col("fp"))
  }

  /** F5: perceptual near-dup — the SECOND pass of a media dedup
    * pipeline, after F4's exact byte dedup: re-encoded / slightly
    * edited copies of the same asset that md5 can never group. Each
    * payload gets a 64-bit average-hash
    * ([[graft.functions.MediaHashes.avgHash64]] — aHash thresholding
    * over raw byte windows, the format-agnostic pass that needs no
    * codec; the pixel-level sibling over REAL decoded images is
    * [[graft.functions.MediaCodec.imageAHash64]], exercised by the
    * mm_phash_image row), and pairs within
    * `maxHamming` bits surface per kind via the C4 pigeonhole-exact
    * banding (no near pair can be missed; buckets scoped by kind and
    * capped at `maxBucket`). Output: (kind, doc_a, doc_b, hamming) —
    * hamming 0 pairs are byte-permutation-level copies, 1..maxHamming
    * the perceptual near-dups. Scale shape = C4's: 8-byte sigs ride
    * the banding shuffle, verification is join-free, payload bytes die
    * at the map side after hashing.
    */
  def nearDupPayloads(media: DataFrame, idCol: String, kindCol: String,
                      payloadCol: String, maxHamming: Int = 3,
                      maxBucket: Int = 1000): DataFrame = {
    // empty payloads carry no perceptual content and would otherwise
    // hash to 0 and pair with constant-byte payloads (also sig 0) —
    // drop them, which is also the oracle's byte-expansion semantics.
    // Oversized payloads (>= 2^27 bytes, avgHash64's exact-integer
    // bound) are skipped the same way instead of failing the whole
    // job on one jumbo asset; the mm_phash oracle mirrors the bound
    // (strlen(pay) < 134217728) so engine and replay can never
    // silently diverge on a jumbo asset.
    val sigs = media
      .filter(octet_length(col(payloadCol)) > 0 &&
        octet_length(col(payloadCol)) < (1 << 27))
      .select(col(idCol), col(kindCol).as("kind"),
        graft.functions.media.avgHash64(col(payloadCol)).as("sig"))
    Dedup.hammingPairs(sigs, idCol, "sig", Seq("kind"), maxHamming,
        maxBucket)
      .select(col("kind"), col("a").as("doc_a"), col("b").as("doc_b"),
        col("hamming"))
      .orderBy(col("kind"), col("doc_a"), col("doc_b"))
  }

  /** Kind column derivation shared by [[manifest]] and the mm queries. */
  def kindOf(idCol: String): org.apache.spark.sql.Column =
    element_at(typedLit(Kinds), (pmod(col(idCol), lit(3)) + 1).cast("int"))

  /** Feature row produced per media payload. Column semantics are
    * per-kind: images — (width, height) = real decoded pixel dims,
    * n_frames = 1, features = the 4x2 mean-luma grid; audio —
    * width = sample rate (Hz), height = bits per sample, n_frames =
    * sample count, features = 8 segment-mean amplitudes; video /
    * undecodable — the deterministic stub's values. One fixed schema
    * rather than per-kind structs so the frame keeps a single
    * columnar layout through shuffles at any modality mix. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  /** Batch size handed to the decoder (real codecs amortize per-batch
    * setup — model load, GPU transfer — across this many payloads).
    */
  val DecodeBatchSize = 64

  /** F2: mapPartitions batch decode → feature pipeline. Input must have
    * (doc_id LONG, kind STRING, payload BINARY). Partitioning is
    * preserved (no shuffle); each partition is processed in
    * [[DecodeBatchSize]] groups.
    *
    * Decode is REAL for kind=image (ImageIO) and kind=audio
    * (AudioSystem) via [[graft.functions.MediaCodec]]; kind=video and
    * undecodable payloads take the deterministic stub path
    * ([[stubRow]]) — total over corrupt inputs by design.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("doc_id", "kind", "payload").rdd
      .mapPartitions { rows =>
        rows.grouped(DecodeBatchSize).flatMap { batch => decodeBatch(batch) }
      }
    spark.createDataFrame(rdd, FeatureSchema)
  }

  /** F3: frame sampling — one row per kept frame of each video at a
    * fixed `stride`, the standard pre-processing shape for video
    * training data. Pure narrow plumbing (`sequence` + explode), so it
    * fuses with the scan; the row count amplifies by ~n_frames/stride,
    * so callers repartition AFTER sampling if a heavy per-frame stage
    * follows (doc'd here rather than auto-repartitioned — the right
    * partition count depends on that stage, not on this one).
    * Frame decode follows the same stub rule as [[decodeFeatures]].
    */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, "stride must be positive")
    // n_frames = 0 (corrupt/empty media) yields zero rows, not an
    // illegal sequence(0, -1) error
    features.filter(col("kind") === "video" && col("n_frames") > 0)
      .select(col("doc_id"), col("width"), col("height"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
  }

  /** Per-batch decode: real codecs first, stub fallback. The batch
    * grouping exists for codecs that amortize per-batch setup (model
    * load, GPU transfer); the JDK codecs are per-payload, so the
    * grouping is pure plumbing here — but it is the contract a
    * heavier decoder slots into.
    */
  private def decodeBatch(batch: Seq[Row]): Seq[Row] = batch.map { r =>
    val id = r.getLong(0)
    val kind = r.getString(1)
    val payload = r.getAs[Array[Byte]](2)
    import graft.functions.MediaCodec
    kind match {
      case "image" => MediaCodec.decodeImage(payload) match {
        case Some(f) =>
          Row(id, kind, f.width, f.height, 1, f.features.toSeq)
        case scala.None => stubRow(id, kind, payload)
      }
      case "audio" => MediaCodec.decodeWav(payload) match {
        case Some(a) =>
          Row(id, kind, a.sampleRate, a.bits, a.nSamples, a.features.toSeq)
        case scala.None => stubRow(id, kind, payload)
      }
      case _ => stubRow(id, kind, payload)
    }
  }

  /** Deterministic decode STUB — the VIDEO path (the JDK has no video
    * codec; a real binding replaces exactly this function) and the
    * quarantine row for payloads the real decoders cannot parse.
    * Dimensions and features are pure functions of the payload bytes,
    * so tests can assert exact values.
    */
  private def stubRow(id: Long, kind: String, payload: Array[Byte]): Row = {
    val h = graft.functions.BytesCodec.javaArraysHashCode(payload)
    val width = 64 + math.floorMod(h, 64)
    val height = 64 + math.floorMod(h >> 8, 64)
    val frames = if (kind == "video") 1 + math.floorMod(h >> 16, 30) else 1
    val feats = Array.tabulate(8) { i =>
      math.floorMod(h.toLong * (i + 1), 1000L) / 1000.0
    }
    Row(id, kind, width, height, frames, feats.toSeq)
  }
}
