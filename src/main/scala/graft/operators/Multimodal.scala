package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (SURVEY.md §2 F-series): media payloads
  * as opaque BINARY columns with typed metadata, plus the
  * batch-decode/feature-extract plumbing a training pipeline hangs off
  * them.
  *
  * The container has no image/audio codecs, so [[decodeFeatures]]'s
  * decoder is a clearly-marked deterministic stub — the Spark-side
  * contract (schema, batching, partition preservation) is real and
  * tested, and swapping the stub for a JNI/codec call changes nothing
  * upstream.
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
    * ([[graft.functions.MediaHashes.avgHash64]] — real aHash
    * thresholding over the F2-stub "decoded grid"), and pairs within
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

  /** Feature row produced per media payload by the decode stub. */
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
    * STUB: `decodeBatch` fabricates deterministic dimensions/features
    * from the payload bytes instead of invoking a codec.
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

  /** Deterministic decode STUB — replace with a real codec binding.
    * Dimensions and features are pure functions of the payload bytes,
    * so tests can assert exact values.
    */
  private def decodeBatch(batch: Seq[Row]): Seq[Row] = batch.map { r =>
    val id = r.getLong(0)
    val kind = r.getString(1)
    val payload = r.getAs[Array[Byte]](2)
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
