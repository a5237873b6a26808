package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.txt

/** Deduplication suite (SURVEY.md §2 C-series): exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine — the operators a
  * large-scale training-data pipeline runs over a documents table.
  *
  * Scale posture (100 TB): every near-dup path is
  * signature → band-bucket groupBy → candidate pairs → verify,
  * so the only shuffles are keyed on band buckets and pair ids;
  * there is never an O(n²) crossjoin. Bucket sizes are capped
  * (`maxBucket`) so a degenerate key (e.g. the empty document) cannot
  * produce a quadratic pair explosion on one task.
  */
object Dedup {

  // ---- shingling -------------------------------------------------------

  /** Distinct `k`-word shingles of a text column (ARRAY<STRING>). */
  def shingles(text: Column, k: Int): Column = {
    val words = split(trim(text), "\\s+")
    val n = size(words)
    val starts = sequence(lit(1), n - (k - 1)) // 1-based start positions
    val sh = transform(starts, i => concat_ws(" ", slice(words, i, lit(k))))
    when(n >= k, array_distinct(sh)).otherwise(array())
  }

  /** Distinct shingle hash set (ARRAY<BIGINT>) — the native one-pass
    * kernel (no per-shingle string allocation; see
    * [[graft.functions.TextHashes.wordShingleHashes]]).
    */
  def shingleHashes(text: Column, k: Int): Column =
    txt.wordShingleHashes(text, k)

  // ---- exact dedup -----------------------------------------------------

  /** Exact dedup by content fingerprint: one hash-groupBy (map-side
    * partial min/count), keeps the minimum id per fingerprint.
    */
  def exact(docs: DataFrame, idCol: String, fp: Column): DataFrame =
    docs
      .groupBy(fp.as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Case/whitespace-normalized content key. */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** C22: incremental ingest dedup — dedup a NEW batch (delta) against
    * an existing corpus fingerprint index without reprocessing the
    * corpus. This is the shape a continuously-fed pipeline actually
    * runs: the crawl lands a daily batch, the corpus index (fp →
    * canonical id, the durable output of C1/C2 runs) already exists,
    * and re-shuffling 100 TB of history per batch is not an option.
    *
    * Per delta document: `dup_of` = the corpus canonical id sharing its
    * fingerprint (null if unseen), and `keep` = true iff the doc is
    * both new to the corpus AND the first (min-id) occurrence of its
    * fingerprint within the batch — exactly the set a curator appends
    * to the corpus (and whose fingerprints it appends to the index).
    *
    * Scale posture: the corpus-scale `index` is probed ONCE, map-side,
    * against the broadcast distinct fingerprint set of the batch (a
    * daily batch is GBs; its fingerprint set is MBs) — the index is
    * never shuffled and never aggregated, and the surviving hit set is
    * batch-bounded, so every subsequent join runs at batch scale. The
    * within-batch first-occurrence pass is a partial-agg `groupBy`
    * over the batch alone.
    */
  def incremental(index: DataFrame, delta: DataFrame, idCol: String,
                  fp: Column): DataFrame = {
    val dfp = delta.select(col(idCol), fp.as("fp"))
    val deltaSet = dfp.select("fp").distinct()
    // map-side probe: corpus index vs broadcast batch fingerprints
    val hits = index.join(broadcast(deltaSet), Seq("fp"))
      .select(col("fp"), col("keep_id"))
    val firstInDelta = dfp.groupBy("fp")
      .agg(min(col(idCol)).as("first_delta"))
    dfp
      .join(broadcast(hits), Seq("fp"), "left")
      .join(firstInDelta, Seq("fp"))
      .select(col(idCol), col("fp"), col("keep_id").as("dup_of"),
        (col("keep_id").isNull && col(idCol) === col("first_delta"))
          .as("keep"))
  }

  /** C25: incremental NEAR-dup — the fuzzy twin of [[incremental]],
    * the other half of a production crawl cycle: each incoming batch
    * doc is checked for MinHash-LSH near-duplicates against the
    * already-indexed corpus. The aggregated per-(band, key) corpus
    * bucket table built here IS the persisted LSH index such a cycle
    * maintains (build once, probe per batch); the BATCH side's band
    * keys are broadcast, so the index is probed map-side — history is
    * never re-shuffled when a batch arrives — and only colliding
    * (corpus, batch) pairs reach exact-Jaccard verification, bounded
    * by the batch's collision set. Degenerate buckets whose COMBINED
    * corpus + batch membership exceeds `maxBucket` emit NOTHING — the
    * SAME drop rule (and the same count) as [[lshCandidatePairs]], so
    * the incremental result stays exactly the full [[minhashLsh]] run
    * restricted to cross-set pairs (the parity the spec pins,
    * including a deliberately-flooded bucket) even when a boilerplate
    * text floods one bucket. The (id, shingles) projections are persisted for the run
    * (the [[lshVerifiedPairs]] cacheShingles rationale: the shingle
    * kernel feeds both the band keys and the verification join);
    * `cacheShingles = false` opts out. Batch-internal near-dups are
    * the batch's own [[minhashLsh]] run at batch scale.
    */
  def incrementalMinhash(corpus: DataFrame, batch: DataFrame,
                         idCol: String, textCol: String, k: Int = 3,
                         perms: Int = 128, bands: Int = 16,
                         threshold: Double = 0.7,
                         maxBucket: Int = 1000,
                         cacheShingles: Boolean = true,
                         broadcastBatch: Boolean = true,
                         bucketIndex: Option[DataFrame] = scala.None,
                         shingledCorpus: Option[DataFrame] = scala.None,
                         shingledBatch: Option[DataFrame] = scala.None)
      : DataFrame = {
    require(perms % bands == 0, "perms must be divisible by bands")
    val rpb = perms / bands
    // `broadcastBatch = true` asserts the ingest delta (keys, counts,
    // candidate set, AND shingle payloads) fits the broadcast budget —
    // the normal posture for an ingest cycle, and what keeps the
    // corpus index from ever re-shuffling on batch arrival. A caller
    // landing a jumbo batch passes false: the same plan runs with
    // unhinted joins (AQE picks sides; the corpus side then may
    // shuffle for that one oversized batch). Results are identical
    // either way (spec-pinned).
    def bc(df: DataFrame): DataFrame =
      if (broadcastBatch) broadcast(df) else df
    // pre-shingled `(batch_id|corpus_id, sh)` frames (caller-owned
    // persistence) replace the internal projections when given — a
    // caller that already computed the identical kernel for another
    // leg of its plan (the [[lshIndexRecall]] truth leg) shares ONE
    // cached pass instead of paying the kernel + a second cache entry
    def shingled(df: DataFrame, out: String) = {
      val p = df.select(col(idCol).as(out),
        shingleHashes(col(textCol), k).as("sh"))
      if (cacheShingles)
        p.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else p
    }
    val bs = shingledBatch.getOrElse(shingled(batch, "batch_id"))
    val batchKeys = bandKeysOf(bs, "batch_id", perms, rpb, bands)
      .select(col("band"), col("bkey"), col("batch_id")).distinct()
    // the per-(band, key) corpus bucket table: either built in-plan
    // from the corpus text (one minhash pass per call), or served from
    // a [[buildLshIndex]] layout — then the corpus text is never
    // re-hashed on batch arrival; the flat index is FILTERED to the
    // batch's colliding keys map-side (band-partition + broadcast-key
    // pruning) before aggregating, so the aggregation is
    // collision-bounded, and because the filter keeps every member of
    // a colliding bucket the maxBucket count below is still the FULL
    // bucket membership — cap parity with the in-plan form holds
    // the in-plan form shingles the corpus ONCE (persisted) and feeds
    // both the band keys and the verification join; the indexed form
    // never touches corpus text until the candidate set is known
    lazy val cs = shingledCorpus.getOrElse(shingled(corpus, "corpus_id"))
    val index = bucketIndex match {
      case Some(flat) =>
        flat.join(bc(batchKeys.select(col("band"), col("bkey")).distinct()),
            Seq("band", "bkey"))
          .groupBy(col("band"), col("bkey"))
          .agg(sort_array(collect_list(col("corpus_id"))).as("ids"))
      case scala.None =>
        bandKeysOf(cs, "corpus_id", perms, rpb, bands)
          .groupBy(col("band"), col("bkey"))
          .agg(sort_array(collect_list(col("corpus_id"))).as("ids"))
    }
    // the full-run cap counts BOTH sides' bucket members; replicate it
    // exactly so parity holds even on degenerate buckets
    val batchCnt = batchKeys.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("_bcnt"))
    val cand0 = index
      .join(bc(batchKeys), Seq("band", "bkey"))
      .join(bc(batchCnt), Seq("band", "bkey"))
      .filter(size(col("ids")) + col("_bcnt") <= maxBucket)
      .select(col("batch_id"), explode(col("ids")).as("corpus_id"))
      .distinct()
    // the indexed path consumes the candidate set twice (id derivation
    // + the verify join): persist it so the on-disk bucket read and
    // its aggregation run once per probe, not twice (MEMORY_AND_DISK,
    // evictable — the cs/bs posture)
    val cand =
      if (bucketIndex.isDefined)
        cand0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else cand0
    // verification: the corpus shingle table is probed BY the
    // batch-bounded candidate set — history is never shuffle-joined
    // on batch arrival under the default broadcast posture — then the
    // batch payloads attach, and the shared [[withJaccard]] rule
    // scores each pair. The indexed form shingles ONLY the candidate
    // docs: an INNER join with the broadcast candidate ids prunes
    // corpus rows map-side BEFORE the shingle kernel runs (inner, not
    // outer — an outer join preserving the small side cannot broadcast
    // it, and would shuffle the whole corpus text), so a probe's
    // corpus-side CPU is bounded by the batch's collision set — the
    // cost posture the persisted index exists for. Because the inner
    // join would SILENTLY drop a candidate id the passed corpus no
    // longer covers (index/corpus drift, e.g. probing an appended
    // index with a pre-append corpus snapshot), a separate bounded
    // check raises first: candIds is collision-bounded and the anti
    // join scans only the column-pruned corpus id column.
    val verifySh = bucketIndex match {
      case Some(_) =>
        val candIds = cand.select(col("corpus_id")).distinct()
        // coverage check against the pre-shingled frame when given (its
        // id set IS the corpus', and the scan reads the caller's cache
        // instead of re-running the corpus lineage)
        val coverage = shingledCorpus.map(_.select(col("corpus_id")))
          .getOrElse(corpus.select(col(idCol).as("corpus_id")))
        val missing = candIds
          .join(coverage, Seq("corpus_id"), "left_anti")
          .limit(1).collect()
        require(missing.isEmpty,
          s"LSH index corpus_id ${if (missing.nonEmpty) missing.head.get(0) else ""} " +
            "is absent from the passed corpus DataFrame — index and " +
            "corpus have drifted (probe with the corpus the index was " +
            "built/appended from)")
        shingledCorpus match {
          case Some(sc) => sc.join(bc(candIds), Seq("corpus_id"))
          case scala.None =>
            shingled(corpus.select(col(idCol), col(textCol))
              .join(bc(candIds.select(col("corpus_id").as(idCol))),
                Seq(idCol)),
              "corpus_id")
        }
      case scala.None => cs
    }
    withJaccard(verifySh.select(col("corpus_id"), col("sh").as("pa"))
        .join(bc(cand), "corpus_id")
        .join(bc(bs.select(col("batch_id"), col("sh").as("pb"))),
          "batch_id"))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("jaccard"))
  }

  /** Band keys of a shingled `(out, sh)` projection: minhash signature
    * → banded slices → one (band, bkey, out) row per band. The ONE
    * body behind the in-plan corpus index, the batch probe keys, and
    * the persisted [[buildLshIndex]] layout — any drift between those
    * three makes persisted buckets silently stop colliding with probe
    * keys, so they all call here.
    */
  private def bandKeysOf(sh: DataFrame, out: String, perms: Int,
                         rpb: Int, bands: Int): DataFrame =
    sh.select(col(out), txt.minhash(col("sh"), perms).as("sig"))
      .select(col(out),
        explode(minhashBandKeys("sig", bands, rpb)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bkey").as("bkey"),
        col(out))

  /** The flat (band, bkey, corpus_id) band-key table one LSH pass
    * produces — the row layout of the persisted index. */
  private def lshBandKeys(docs: DataFrame, idCol: String, textCol: String,
                          k: Int, perms: Int, bands: Int): DataFrame = {
    require(perms % bands == 0, "perms must be divisible by bands")
    bandKeysOf(
      docs.select(col(idCol).as("corpus_id"),
        shingleHashes(col(textCol), k).as("sh")),
      "corpus_id", perms, perms / bands, bands)
  }

  /** C25 lifecycle (build): PERSIST the corpus LSH bucket index a
    * crawl cycle maintains — the D8 posture (build once, probe every
    * batch, append survivors) applied to incremental near-dup:
    *
    *   dir/params/           (k, perms, bands)     — 1 row
    *   dir/buckets/band=B/   (bkey, corpus_id)     — flat band keys,
    *                         one Hive partition per band
    *
    * The layout is FLAT rows, not pre-aggregated (band, key) → ids
    * lists: every batch touches every band, so an aggregated layout
    * would rewrite the whole index per append, while flat rows make
    * append PURE file-adds (no partition rewritten, spec-pinned
    * byte-identical) and the probe aggregates only the batch's
    * colliding buckets. Signature params ride a sidecar so a probe or
    * append under different (k, perms, bands) fails loudly instead of
    * silently mixing incompatible signatures
    * ([[graft.operators.Knn]] requireIndexDim precedent).
    */
  def buildLshIndex(corpus: DataFrame, idCol: String, textCol: String,
                    dir: String, k: Int = 3, perms: Int = 128,
                    bands: Int = 16): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq((k, perms, bands)).toDF("k", "perms", "bands")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/params")
    lshBandKeys(corpus, idCol, textCol, k, perms, bands)
      .write.mode("overwrite").partitionBy("band")
      .parquet(s"$dir/buckets")
  }

  /** C25 lifecycle (params): read the index's signature sidecar. */
  def lshIndexParams(spark: org.apache.spark.sql.SparkSession,
                     dir: String): (Int, Int, Int) = {
    val r = spark.read.parquet(s"$dir/params").head()
    (r.getAs[Int]("k"), r.getAs[Int]("perms"), r.getAs[Int]("bands"))
  }

  /** C25 lifecycle (append): add a batch's surviving docs to the
    * index under its FROZEN signature — dynamic partition APPEND of
    * flat band-key rows; existing files are never rewritten (a pure
    * file-add per band directory).
    */
  def appendToLshIndex(survivors: DataFrame, idCol: String,
                       textCol: String, dir: String): Unit = {
    val (k, perms, bands) =
      lshIndexParams(survivors.sparkSession, dir)
    lshBandKeys(survivors, idCol, textCol, k, perms, bands)
      .write.mode("append").partitionBy("band")
      .parquet(s"$dir/buckets")
  }

  /** C25 lifecycle (remove): purge docs from a [[buildLshIndex]]
    * layout — the GDPR/retention path the IVF×PQ index got in
    * [[graft.operators.Knn.removeFromIvfPqIndex]], adapted to the
    * flat band-key format. A doc's rows land in EVERY `band=`
    * partition (one key per band), so partition-level rewrite would
    * always rewrite the whole index; instead the surgery is
    * FILE-level: `input_file_name()` finds the files that actually
    * contain a purged id (bounded by the purge batch's append files,
    * not the corpus), their surviving rows append back as new files,
    * and the old files are deleted — every untouched file stays
    * byte-identical (spec-pinned), and the probe path needs no
    * tombstone awareness because purged keys physically leave the
    * layout. Crash window: surviving rows are appended BEFORE the old
    * files are deleted, so a crash in between leaves duplicate bucket
    * rows (harmless — the probe's candidate set is `.distinct()`) and
    * purged rows still present; re-running the purge converges.
    * Single-writer posture, like every maintenance API here. Returns
    * the number of bucket rows removed.
    */
  def removeFromLshIndex(deleteIds: DataFrame, idCol: String,
                         dir: String): Long = {
    val spark = deleteIds.sparkSession
    val ids = deleteIds.select(col(idCol).cast("long").as("corpus_id"))
      .distinct()
    val buckets = spark.read.parquet(s"$dir/buckets")
      .withColumn("_file", input_file_name())
    val affected = buckets.join(broadcast(ids), "corpus_id")
      .select(col("_file")).distinct().collect()
      .map(_.getString(0)).sorted
    if (affected.isEmpty) return 0L
    val touched = buckets.filter(col("_file").isin(affected: _*))
    val removed = touched.join(broadcast(ids), "corpus_id").count()
    // localCheckpoint (eager) before deleting the very files the
    // lineage reads — the removeFromIvfPqIndex rationale; snapshot
    // the persistent-RDD set so exactly the checkpoint's blocks free
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val remaining = touched
      .join(broadcast(ids), Seq("corpus_id"), "left_anti")
      .select(col("bkey"), col("corpus_id"), col("band"))
      .localCheckpoint()
    try {
      remaining.write.mode("append").partitionBy("band")
        .parquet(s"$dir/buckets")
      val fs = new org.apache.hadoop.fs.Path(s"$dir/buckets")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      affected.foreach { f =>
        fs.delete(new org.apache.hadoop.fs.Path(new java.net.URI(f)), false)
      }
      // the deletes bypass the Spark writer: drop any cached listing
      StoreMaintenance.refreshPath(spark, s"$dir/buckets")
    } finally {
      val rdds = spark.sparkContext.getPersistentRDDs
      (rdds.keySet diff persistedBefore)
        .foreach(id => rdds.get(id).foreach(_.unpersist(blocking = false)))
    }
    removed
  }

  /** C25 lifecycle (compact): coalesce fragmented `band=` partitions —
    * every [[appendToLshIndex]] batch adds one file per band, so a
    * crawl loop that ingested B batches leaves B+1 files in EVERY band
    * directory and each probe pays the per-file open tax across all of
    * them. Only bands over `maxFilesPerBand` files are read
    * (partition-pruned) and rewritten to one file each; bands at or
    * under the threshold stay byte-identical (spec-pinned). Bucket
    * rows are unchanged, so probe results cannot move. Returns
    * (bandsCompacted, filesBefore, filesAfter).
    */
  def compactLshIndex(spark: org.apache.spark.sql.SparkSession,
                      dir: String, maxFilesPerBand: Int = 1)
      : (Int, Long, Long) =
    StoreMaintenance.compactPartitioned(spark, s"$dir/buckets", "band",
      maxFilesPerBand)

  /** C25 lifecycle (merge): combine indexes built under the SAME
    * (k, perms, bands) signature — parallel shard crawls merged into
    * one history, the [[graft.operators.Knn.mergeIvfPqIndexes]]
    * posture: signature identity VERIFIED against the params sidecars
    * (different signatures produce incompatible band keys — silent
    * missed-dup corruption), then pure file concatenation per `band=`
    * partition. No dedup across shards (run [[fsckLshIndex]] after;
    * its dup_rows check catches overlap). Returns files copied.
    * `dryRun=true`: admission check + enumeration only, returns the
    * would-copy count.
    */
  def mergeLshIndexes(spark: org.apache.spark.sql.SparkSession,
                      dst: String, srcs: Seq[String],
                      dryRun: Boolean = false): Long = {
    val want = lshIndexParams(spark, dst)
    srcs.foreach { s =>
      require(lshIndexParams(spark, s) == want,
        s"$s was built under a DIFFERENT (k, perms, bands) signature " +
          s"than $dst — band keys are incompatible")
    }
    val dstRoot = new org.apache.hadoop.fs.Path(s"$dst/buckets")
    // enumerate (src, dst) driver-side (O(bands × shards)), move the
    // BYTES as a Spark job — merge bandwidth scales with the cluster
    val pairs = srcs.filterNot(_ == dst).zipWithIndex.flatMap {
      case (src, i) =>
        StoreMaintenance.partitionDirs(spark,
            new org.apache.hadoop.fs.Path(s"$src/buckets"), "band")
          .flatMap { case (band, p) =>
            StoreMaintenance.dataFiles(spark, p).map { case (f, _) =>
              (f.toString, new org.apache.hadoop.fs.Path(dstRoot,
                s"band=$band/merge$i-${f.getName}").toString)
            }
          }
    }
    // dry run: signature admission ran above — count, don't copy
    if (dryRun) pairs.size.toLong
    else StoreMaintenance.copyFilesDistributed(spark, pairs)
  }

  /** C25 lifecycle (stats): per-band health of a [[buildLshIndex]]
    * layout — (band, n_rows, n_files, bytes), the
    * [[graft.operators.Knn.ivfPqIndexStats]] report for the bucket
    * store: file fragmentation drives [[compactLshIndex]], row
    * imbalance flags a hot band. Listing is O(bands) driver work; the
    * count side is one column-pruned partial agg.
    */
  def lshIndexStats(spark: org.apache.spark.sql.SparkSession,
                    dir: String): DataFrame = {
    import spark.implicits._
    val files = StoreMaintenance
      .partitionFileStats(spark, s"$dir/buckets", "band")
      .toDF("band", "n_files", "bytes")
    spark.read.parquet(s"$dir/buckets")
      .groupBy(col("band")).agg(count(lit(1)).as("n_rows"))
      .join(files, Seq("band"), "right")
      .withColumn("n_rows", coalesce(col("n_rows"), lit(0L)))
      .select(col("band"), col("n_rows"), col("n_files"), col("bytes"))
      .orderBy("band")
  }

  /** C25 lifecycle (fsck): integrity report over a [[buildLshIndex]]
    * layout — (check, ok, n_bad, detail) per invariant:
    *
    *   - `params_valid`: the sidecar parses and `perms % bands == 0`;
    *   - `bands_complete`: the `band=` partitions tile 0..bands−1
    *     exactly (a missing band silently blinds every probe to 1/B of
    *     the signature; an extra band is unreachable rows);
    *   - `doc_coverage`: every indexed doc carries EXACTLY one key in
    *     every band (fewer = a torn append, that doc under-recalls
    *     forever; the check counts docs whose distinct-band count ≠
    *     bands);
    *   - `dup_rows`: repeated (band, bkey, corpus_id) rows — the
    *     crashed-purge/compaction signature; probes absorb them via
    *     `.distinct()` but they inflate every probe's shuffle.
    *
    * Two grouped partial aggs over the bucket rows — fsck cadence.
    */
  def fsckLshIndex(spark: org.apache.spark.sql.SparkSession,
                   dir: String): DataFrame = {
    import spark.implicits._
    val (k, perms, bands) = lshIndexParams(spark, dir)
    val paramsBad = if (k >= 1 && bands >= 1 && perms % bands == 0) 0L
      else 1L
    val stored = StoreMaintenance.partitionDirs(spark,
      new org.apache.hadoop.fs.Path(s"$dir/buckets"), "band")
      .map(_._1).toSet
    val bandBad = ((0 until bands).count(!stored(_)) +
      stored.count(b => b < 0 || b >= bands)).toLong
    val buckets = spark.read.parquet(s"$dir/buckets")
      .select(col("band"), col("bkey"), col("corpus_id"))
    val cover = buckets.groupBy(col("corpus_id"))
      .agg(countDistinct(col("band")).as("nb"))
      .filter(col("nb") =!= bands).count()
    val dups = buckets.groupBy(col("band"), col("bkey"), col("corpus_id"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).count()
    Seq(
      ("params_valid", paramsBad == 0L, paramsBad,
        s"k=$k perms=$perms bands=$bands"),
      ("bands_complete", bandBad == 0L, bandBad,
        s"expect band= partitions 0..${bands - 1}"),
      ("doc_coverage", cover == 0L, cover,
        s"docs must key into all $bands bands (torn append)"),
      ("dup_rows", dups == 0L, dups,
        "repeated bucket rows (crashed purge/compaction)")
    ).toDF("check", "ok", "n_bad", "detail")
  }

  /** C25 lifecycle (advise): the maintenance-advisor runbook row for
    * the LSH store — [[graft.operators.Knn.adviseIvfPqIndex]]'s
    * discipline under [[StoreMaintenance.adviseRow]]'s precedence.
    * The LSH store has no drift number derivable from a listing (its
    * decay metric is [[lshIndexRecall]], which needs a corpus + probe
    * batch — C37's row, an eval cadence, not an advisor scan), so the
    * rebuild slot stays empty here: actions are repair (fsck flags),
    * compact (any `band=` partition over `maxFilesPerBand` files —
    * [[compactLshIndex]]'s knob), or ok.
    */
  def adviseLshIndex(spark: org.apache.spark.sql.SparkSession,
                     dir: String,
                     maxFilesPerBand: Int = 1): DataFrame = {
    val fsckBad = fsckLshIndex(spark, dir).filter(!col("ok")).count()
    val fragged = StoreMaintenance
      .partitionFileStats(spark, s"$dir/buckets", "band")
      .count(_._2 > maxFilesPerBand)
    val compact = if (fragged > 0)
      Some(s"$fragged band partition(s) over $maxFilesPerBand file(s) " +
        "- compactLshIndex")
    else scala.None
    StoreMaintenance.adviseRow(spark, dir, fsckBad, scala.None, compact)
  }

  /** [[lshIndexRecall]] with an ABSOLUTE-size probe batch — the C35b
    * posture for the persisted-store report: the registered harness
    * batch is PROPORTIONAL (10% of corpus), which at a duplicate-storm
    * 100× replication makes even the batch-bounded cross-set truth
    * quadratic in practice; a production probe batch is an
    * absolute-sized crawl micro-batch, and a fixed ~`sampleDocs`
    * salted-hash slice of the batch (the C8 predicate — membership
    * depends only on (id, seed)) keeps the truth join corpus-linear ×
    * constant, so the store-recall number is RECORDABLE at any scale.
    * Both legs (exact truth and the index probe) see the same sliced
    * batch, so the ratio is store recall over the sliced probes — an
    * unbiased estimate of the full-batch number (spec-pinned: the
    * sliced report EQUALS the full report over the pre-filtered
    * batch; `sampleDocs` ≥ batch is byte-identical to
    * [[lshIndexRecall]]). `knownCount` skips the batch count scan
    * when the caller has a catalog count, identical report either
    * way.
    */
  def lshIndexRecallSlice(dir: String, corpus: DataFrame,
                          batch: DataFrame, idCol: String,
                          textCol: String, threshold: Double = 0.7,
                          sampleDocs: Long = 300L, seed: Long = 42L,
                          knownCount: Option[Long] = None): DataFrame = {
    require(sampleDocs > 0, s"sampleDocs must be positive, got $sampleDocs")
    require(knownCount.forall(_ > 0),
      s"knownCount must be positive when given, got $knownCount")
    val n = knownCount.getOrElse(batch.count())
    val p = math.min(1.0, sampleDocs.toDouble / n)
    val batchIn = if (p >= 1.0) batch
      else batch.filter(Sampling.hashKey(col(idCol), seed) <
        lit(Sampling.hexThreshold(p)))
    lshIndexRecall(dir, corpus, batchIn, idCol, textCol, threshold)
  }

  /** C25 lifecycle (repair): fix what [[fsckLshIndex]] flags, without
    * a rebuild — the [[graft.operators.Knn.repairIvfPqIndex]]
    * discipline for the band-partitioned layout, per corruption
    * class:
    *
    *   - out-of-range `band=` partitions (band < 0 or ≥ bands —
    *     unreachable by any probe) are deleted outright, the D8
    *     orphan-cell rule;
    *   - duplicate (band, bkey, corpus_id) rows (crashed purge /
    *     pre-journal compaction) collapse to ONE copy — the row IS
    *     its three columns, so any survivor is the same value and
    *     re-running converges;
    *   - torn-append docs (distinct-band count ≠ bands: the append
    *     died between band files; that doc under-recalls forever)
    *     have ALL their bucket rows dropped — the doc simply leaves
    *     the index, consistent and re-appendable.
    *
    * FILE surgery only: offender files (any file holding a duplicate
    * copy or a torn doc's row — all copies of a dup are offender-
    * resident by construction) are rewritten via append-then-delete;
    * every clean file stays byte-identical (spec-pinned). Refuses
    * loudly when a band partition in 0..bands−1 is MISSING entirely:
    * under that data loss every doc looks torn and "repair" would
    * drop the whole index — that is restore/rebuild territory, fsck
    * keeps flagging it. Idempotent. Returns (rowsDropped,
    * filesRewritten) — orphan-partition rows count in rowsDropped.
    */
  def repairLshIndex(spark: org.apache.spark.sql.SparkSession,
                     dir: String): (Long, Int) = {
    val (k, perms, bands) = lshIndexParams(spark, dir)
    require(k >= 1 && bands >= 1 && perms % bands == 0,
      s"$dir params sidecar is invalid (k=$k perms=$perms " +
        s"bands=$bands) — repair cannot interpret the layout")
    val root = new org.apache.hadoop.fs.Path(s"$dir/buckets")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // 1) unreachable out-of-range band partitions: delete the dirs
    val dirs = StoreMaintenance.partitionDirs(spark, root, "band")
    val orphan = dirs.filter { case (b, _) => b < 0 || b >= bands }
    var dropped = 0L
    if (orphan.nonEmpty) {
      dropped += spark.read
        .parquet(orphan.map(_._2.toString): _*).count()
      orphan.foreach { case (_, p) => fs.delete(p, true) }
      StoreMaintenance.refreshPath(spark, s"$dir/buckets")
    }
    val stored = StoreMaintenance.partitionDirs(spark, root, "band")
      .map(_._1).toSet
    require((0 until bands).forall(stored),
      s"$dir is missing band partitions ${(0 until bands)
        .filterNot(stored).mkString(",")} — under that loss every doc " +
        "looks torn and surgery would drop the index; restore or " +
        "rebuild instead")
    // 2) dup rows + torn docs, file-level
    val buckets = spark.read.parquet(s"$dir/buckets")
      .withColumn("_file", input_file_name())
    val dupKeys = buckets
      .groupBy(col("band"), col("bkey"), col("corpus_id"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1)
      .select(col("band"), col("bkey"), col("corpus_id"))
    val torn = buckets.groupBy(col("corpus_id"))
      .agg(countDistinct(col("band")).as("nb"))
      .filter(col("nb") =!= bands).select(col("corpus_id"))
    val offenders = buckets
      .join(dupKeys, Seq("band", "bkey", "corpus_id"))
      .select(col("_file"))
      .unionAll(buckets.join(torn, "corpus_id").select(col("_file")))
      .distinct().collect().map(_.getString(0)).sorted
    if (offenders.isEmpty) return (dropped, 0)
    val touched = buckets.filter(col("_file").isin(offenders: _*))
    val nTouched = touched.count()
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val survivors = touched
      .join(torn, Seq("corpus_id"), "left_anti")
      .select(col("bkey"), col("corpus_id"), col("band"))
      .dropDuplicates("band", "bkey", "corpus_id")
      .localCheckpoint()
    try {
      val kept = survivors.count()
      survivors.write.mode("append").partitionBy("band")
        .parquet(s"$dir/buckets")
      offenders.foreach { f =>
        fs.delete(new org.apache.hadoop.fs.Path(new java.net.URI(f)), false)
      }
      // the deletes bypass the Spark writer: drop any cached listing
      StoreMaintenance.refreshPath(spark, s"$dir/buckets")
      (dropped + nTouched - kept, offenders.length)
    } finally {
      val rdds = spark.sparkContext.getPersistentRDDs
      (rdds.keySet diff persistedBefore)
        .foreach(id => rdds.get(id).foreach(_.unpersist(blocking = false)))
    }
  }

  /** C25 lifecycle (probe): [[incrementalMinhash]] served from a
    * [[buildLshIndex]] layout instead of re-hashing the corpus text
    * per call — the corpus side of the plan reads ONLY the flat
    * bucket table (filtered map-side to the batch's colliding keys)
    * plus the candidate docs' shingles for verification; results are
    * identical to the in-plan run by the shared body (spec-pinned).
    * `k`/`perms`/`bands` come from the index's own sidecar.
    */
  def incrementalMinhashIndexed(dir: String, corpus: DataFrame,
                                batch: DataFrame, idCol: String,
                                textCol: String, threshold: Double = 0.7,
                                maxBucket: Int = 1000,
                                cacheShingles: Boolean = true,
                                broadcastBatch: Boolean = true,
                                shingledCorpus: Option[DataFrame] =
                                  scala.None,
                                shingledBatch: Option[DataFrame] =
                                  scala.None)
      : DataFrame = {
    val spark = batch.sparkSession
    val (k, perms, bands) = lshIndexParams(spark, dir)
    incrementalMinhash(corpus, batch, idCol, textCol, k, perms, bands,
      threshold, maxBucket, cacheShingles, broadcastBatch,
      bucketIndex = Some(spark.read.parquet(s"$dir/buckets")
        .select(col("band"), col("bkey"), col("corpus_id"))),
      shingledCorpus = shingledCorpus, shingledBatch = shingledBatch)
  }

  /** C37: recall of the PERSISTED LSH index on an incoming batch —
    * the D9-over-D8 discipline for the dedup store. C35 measures the
    * banding in-plan; the ops question is whether the STORE, after
    * append / purge / compact cycles, still surfaces the cross-set
    * near-dup pairs exact truth says exist.
    *
    * Truth = exact threshold-τ batch×corpus pairs (cross-set shingle
    * inverted join — shared counts from one pair-keyed partial agg,
    * the decontaminate shape: cost Σ_v df_corpus(v)·df_batch(v),
    * bounded by the BATCH side — in production an absolute-sized
    * crawl micro-batch, so the join is corpus-linear × a small
    * constant; a cross-set PREFIX-FILTERED variant was measured
    * SLOWER at every recordable scale — t1 2.9→5.0 s, t10 6.9→8.6 s —
    * because the df join + per-doc reassembly overhead exceeds what
    * pruning saves below the storm regime, and the storm regime
    * itself — the harness's PROPORTIONAL 10% batch on a closed
    * vocabulary at 100× — OOMs under either algorithm; that regime is
    * C35b's scale-flat sampled slice's territory, by design). The
    * corpus leg is restricted to ids the index ACTUALLY HOLDS
    * (distinct corpus_id from the bucket table), so a purged doc
    * leaves BOTH legs and the report measures the banding + store,
    * not the staleness of the caller's corpus view (spec-pinned:
    * purge makes the purged doc's pairs leave the report entirely;
    * truth equals a driver-side exact all-pairs replay). Found =
    * [[incrementalMinhashIndexed]]'s verified pairs off the stored
    * buckets — a subset of truth by construction (it exact-verifies).
    * `k`/`perms`/`bands` come from the index's own sidecar. Returns
    * ONE row: (n_truth, n_found, recall).
    */
  def lshIndexRecall(dir: String, corpus: DataFrame, batch: DataFrame,
                     idCol: String, textCol: String,
                     threshold: Double = 0.7): DataFrame = {
    val spark = batch.sparkSession
    val (k, _, _) = lshIndexParams(spark, dir)
    val indexed = spark.read.parquet(s"$dir/buckets")
      .select(col("corpus_id")).distinct()
    val corpusIn = corpus
      .withColumn("_cid", col(idCol).cast("long"))
      .join(indexed, col("_cid") === col("corpus_id"), "left_semi")
    // ONE shingle pass per side (r19): the truth leg used to project the
    // kernel under its own names (shc/shb) and re-evaluate it in BOTH its
    // inverted-join branch and its size-attach branch, while the probe
    // leg cached its own third copy of each side — 4 kernel evaluations
    // over corpus + batch and 2 extra cache entries for identical bits.
    // Both legs now share these two persisted projections (the
    // [[lshRecallSweep]] pattern: MEMORY_AND_DISK, caller-owned —
    // Bench/Verify clearCache() between runs). The truth sizes attach
    // from a `size(sh)` projection of the cached frame, so the arrays
    // never re-shuffle for the size join.
    val csets = corpusIn
      .select(col("_cid").as("corpus_id"),
        shingleHashes(col(textCol), k).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bsets = batch
      .select(col(idCol).cast("long").as("batch_id"),
        shingleHashes(col(textCol), k).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val csh = csets.select(col("corpus_id"), explode(col("sh")).as("v"))
    val bsh = bsets.select(col("batch_id"), explode(col("sh")).as("v"))
    val shared = csh.join(bsh, "v")
      .groupBy(col("corpus_id"), col("batch_id"))
      .agg(count(lit(1)).as("c"))
    val truth = shared
      .join(csets.select(col("corpus_id"), size(col("sh")).as("_nc")),
        "corpus_id")
      .join(bsets.select(col("batch_id"), size(col("sh")).as("_nb")),
        "batch_id")
      .filter(col("c").cast("double") /
        (col("_nc") + col("_nb") - col("c")) >= threshold)
      .select(col("batch_id"), col("corpus_id"))
    val found = incrementalMinhashIndexed(dir, corpusIn.drop("_cid"),
        batch, idCol, textCol, threshold,
        shingledCorpus = Some(csets), shingledBatch = Some(bsets))
      .select(col("batch_id"), col("corpus_id"), lit(1L).as("_hit"))
    truth.join(found, Seq("batch_id", "corpus_id"), "left")
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_found"))
      .withColumn("recall",
        round(col("n_found").cast("double") / col("n_truth"), 6))
  }

  /** C15: paragraph-level exact dedup — the Dolma/RefinedWeb
    * line-granularity pass: explode docs into newline-separated
    * paragraphs, keep ONE canonical occurrence of every distinct
    * paragraph corpus-wide (the (min doc, min pos) one), and reassemble
    * each doc from its surviving paragraphs in original order. Returns
    * (id, n_paras, n_dropped, clean_text) — a fully-duplicated doc
    * comes back with `clean_text = ""`.
    *
    * Plan shape: one posexplode, one partial-agg `min(struct)` shuffle
    * keyed on the paragraph fingerprint (never the paragraph text —
    * 16-byte keys at 100 TB), one fingerprint-keyed join back, one
    * per-doc reassembly agg. A doc's own paragraphs meet only in the
    * final per-doc buffer — the same per-doc bound every reassembly
    * carries (docs are bounded; the corpus-wide state never is).
    */
  def paragraphDedup(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val paras = docs
      .select(col(idCol), posexplode(split(col(textCol), "\n"))
        .as(Seq("pos", "para")))
      .withColumn("fp", md5(col("para")))
    val canon = paras.groupBy("fp")
      .agg(min(struct(col(idCol), col("pos"))).as("keep"))
      .select(col("fp"), col("keep")(idCol).as("keep_id"),
        col("keep")("pos").as("keep_pos"))
    paras.join(canon, "fp")
      .withColumn("kept",
        col(idCol) === col("keep_id") && col("pos") === col("keep_pos"))
      .groupBy(idCol)
      .agg(count(lit(1)).cast("long").as("n_paras"),
        sum(when(col("kept"), 0L).otherwise(1L)).cast("long")
          .as("n_dropped"),
        array_join(transform(
          array_sort(collect_list(
            when(col("kept"), struct(col("pos"), col("para"))))),
          s => s("para")), "\n").as("clean_text"))
  }

  /** C16: exact substring-duplication signal (the fixed-window core of
    * Lee et al.'s "Deduplicating Training Data Makes Language Models
    * Better" exact-substring pass): every `window`-byte rolling-hash
    * window of every doc, counted corpus-wide; a window occurrence is
    * duplicated when its hash occurs anywhere else (another doc OR a
    * repeat inside the same doc). Returns per doc (id, n_windows,
    * n_dup_windows, dup_frac) — the duplicated-substring fraction a
    * curation pass thresholds to drop or trim template-heavy docs.
    *
    * Plan shape: the windows come from ONE codegen expression
    * ([[graft.functions.TextHashes.rollingWindows]] — O(n) roll, no
    * per-window strings), then one posexplode, one partial-agg count
    * keyed on the 8-byte window hash (hot windows absorb map-side),
    * one hash-keyed join back, one per-doc agg. Linear in corpus
    * bytes; no window partition ever exceeds a doc.
    */
  def substringDup(docs: DataFrame, idCol: String, textCol: String,
                   window: Int = 16): DataFrame = {
    val wins = docs.select(col(idCol),
      posexplode(txt.rollingWindows(col(textCol), window))
        .as(Seq("pos", "wfp")))
    val counts = wins.groupBy("wfp").agg(count(lit(1)).as("n_occ"))
    wins.join(counts, "wfp")
      .groupBy(idCol)
      .agg(count(lit(1)).cast("long").as("n_windows"),
        sum(when(col("n_occ") > 1, 1L).otherwise(0L)).cast("long")
          .as("n_dup_windows"))
      .select(col(idCol), col("n_windows"), col("n_dup_windows"),
        round(col("n_dup_windows").cast("double") / col("n_windows"), 6)
          .as("dup_frac"))
  }

  /** C17: the span-removal step of exact-substring dedup (Lee et al.
    * 2022) — every `window`-byte rolling window whose hash occurs more
    * than once corpus-wide is cut from its doc, overlapping windows
    * merged into maximal spans by ONE codegen pass
    * ([[graft.functions.TextHashes.cutWindows]]); a duplicated doc
    * shorter than `window` trims to empty. Returns per doc
    * (id, clean_text, n_removed bytes).
    *
    * Plan shape: C16's count plan (posexplode → partial-agg count on
    * the 8-byte hash → hash-keyed join back) plus a per-doc
    * `sort_array(collect_list(pos))` — the buffer is bounded by one
    * doc's own window count, never corpus-scale. Every occurrence of a
    * duplicated span is cut (keeping a canonical first copy would need
    * a per-window global argmin shuffle; occurrence-agnostic counting
    * keeps the plan one partial-aggregated pass).
    */
  def substringTrim(docs: DataFrame, idCol: String, textCol: String,
                    window: Int = 16): DataFrame = {
    val wins = docs.select(col(idCol),
      posexplode(txt.rollingWindows(col(textCol), window))
        .as(Seq("pos", "wfp")))
    val counts = wins.groupBy("wfp").agg(count(lit(1)).as("n_occ"))
    val dupPos = wins.join(counts.filter(col("n_occ") > 1), "wfp")
      .groupBy(idCol)
      .agg(sort_array(collect_list(col("pos"))).as("dup_pos"))
    docs.join(dupPos, Seq(idCol), "left")
      .select(col(idCol),
        txt.cutWindows(col(textCol),
          coalesce(col("dup_pos"), array().cast("array<int>")),
          window).as("clean_text"),
        octet_length(col(textCol)).as("orig_bytes"))
      .select(col(idCol), col("clean_text"),
        (col("orig_bytes") - octet_length(col("clean_text")))
          .cast("long").as("n_removed"))
  }

  // ---- LSH banding machinery ------------------------------------------

  /** All unordered pairs (a &lt; b) from an ascending-sorted array, as
    * ARRAY&lt;STRUCT&lt;a,b&gt;&gt; — pure expression, no UDF.
    */
  private def pairsOf(arr: Column): Column = {
    val n = size(arr)
    flatten(transform(sequence(lit(1), n - 1), i =>
      transform(slice(arr, i + 1, n), b =>
        struct(get(arr, i - 1).as("a"), b.as("b")))))
  }

  /** Banded-LSH candidate pairs over a signature column: explode each
    * row into (band, band-hash) keys, group, and emit pairs per bucket.
    * Buckets larger than `maxBucket` are dropped (degenerate keys).
    */
  /** The ONE MinHash band-key expression (C3's and C25's shared
    * blocking key — the incremental-vs-full parity guarantee depends
    * on both paths hashing identical slices identically).
    */
  private def minhashBandKeys(sigCol: String, bands: Int,
                              rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"),
        xxhash64(b, slice(col(sigCol), b * rowsPerBand + 1,
          lit(rowsPerBand))).as("bkey")))

  def lshCandidatePairs(sigs: DataFrame, idCol: String, sigCol: String,
                        bands: Int, rowsPerBand: Int,
                        maxBucket: Int = 1000): DataFrame = {
    val bandKeys = minhashBandKeys(sigCol, bands, rowsPerBand)
    sigs
      .select(col(idCol), explode(bandKeys).as("bk"))
      .groupBy(col("bk.band"), col("bk.bkey"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(pairsOf(col("ids"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
  }

  /** Candidate pairs joined back to per-id payloads: (a, b, pa, pb).
    * One payload join, not two: each pair explodes into its member ids,
    * the payload stream is joined ONCE, and the pair reassembles by
    * (a, b) — so the payload expression tree (the shingling kernel)
    * is evaluated once per document rather than once per join side.
    */
  private def joinPayload(cand: DataFrame, payload: DataFrame,
                          idCol: String, payloadCol: String): DataFrame =
    cand
      .select(col("a"), col("b"),
        explode(array(col("a"), col("b"))).as("_id"))
      .join(payload.select(col(idCol).as("_id"), col(payloadCol).as("_p")),
        "_id")
      .groupBy(col("a"), col("b"))
      .agg(
        first(when(col("_id") === col("a"), col("_p")), ignoreNulls = true)
          .as("pa"),
        first(when(col("_id") === col("b"), col("_p")), ignoreNulls = true)
          .as("pb"))

  /** (n_common, jaccard) over two hash-set columns, intersection
    * computed once via an intermediate column.
    */
  private def withJaccard(df: DataFrame): DataFrame =
    df.withColumn("_inter", size(array_intersect(col("pa"), col("pb"))))
      .withColumn("jaccard", col("_inter").cast("double") /
        (size(col("pa")) + size(col("pb")) - col("_inter")))

  // ---- MinHash + LSH ---------------------------------------------------

  /** Shared MinHash banding + exact-Jaccard verification: the shingle
    * hash sets feed three plan branches (the signature and both sides
    * of the verification join), so without caching the shingling kernel
    * — the most expensive step — runs 3× per document. With
    * `cacheShingles` (the default) the `(id, shingles)` projection is
    * persisted MEMORY_AND_DISK and computed once; the cache is
    * LRU-evictable and sized O(corpus shingle sets) ≪ the exploded
    * band stream. Pass `cacheShingles = false` for one-shot runs where
    * executor memory is tighter than CPU, or `spark.catalog.clearCache()`
    * to drop it afterwards.
    */
  private def lshVerifiedPairs(docs: DataFrame, idCol: String, textCol: String,
                               k: Int, perms: Int, bands: Int,
                               cacheShingles: Boolean): DataFrame = {
    require(perms % bands == 0, "perms must be divisible by bands")
    val shPlan = docs.select(col(idCol), shingleHashes(col(textCol), k).as("sh"))
    val sh = if (cacheShingles)
      shPlan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else shPlan
    val sigs = sh.select(col(idCol), txt.minhash(col("sh"), perms).as("sig"))
    lshVerifiedPairsFrom(sh, sigs, idCol, bands, perms / bands)
  }

  /** One banding + exact-Jaccard verification leg over PRECOMPUTED
    * `(id, sh)` / `(id, sig)` frames — split from [[lshVerifiedPairs]]
    * so a multi-banding sweep shares ONE shingle + signature pass
    * across every leg (the signature is banding-independent: banding
    * only re-slices it).
    */
  private def lshVerifiedPairsFrom(sh: DataFrame, sigs: DataFrame,
                                   idCol: String, bands: Int,
                                   rowsPerBand: Int): DataFrame = {
    val cand = lshCandidatePairs(sigs, idCol, "sig", bands, rowsPerBand)
    withJaccard(joinPayload(cand, sh, idCol, "sh"))
  }

  /** MinHash+LSH near-dup pairs, verified by exact shingle Jaccard.
    * `perms` must equal `bands * rowsPerBand`.
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 k: Int = 3, perms: Int = 128, bands: Int = 16,
                 threshold: Double = 0.7,
                 cacheShingles: Boolean = true): DataFrame =
    lshVerifiedPairs(docs, idCol, textCol, k, perms, bands, cacheShingles)
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** LSH candidates with their exact n-gram Jaccard, unthresholded —
    * the verification-path view (SURVEY C5).
    */
  def ngramJaccardCandidates(docs: DataFrame, idCol: String, textCol: String,
                             k: Int = 3, perms: Int = 128, bands: Int = 16,
                             cacheShingles: Boolean = true): DataFrame =
    lshVerifiedPairs(docs, idCol, textCol, k, perms, bands, cacheShingles)
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        col("_inter").cast("long").as("n_common"), col("jaccard"))

  /** C35: banding recall evaluation — the [[graft.operators.Knn.recall]]
    * discipline applied to the dedup family: how much of the EXACT
    * threshold-τ near-dup truth the banded MinHash-LSH pipeline
    * actually surfaced. Tuning bands/rows without this number is
    * guesswork (too few bands silently drops dup pairs forever; too
    * many explodes candidate verification cost).
    *
    * Truth is exact, not sampled hashes: a pair at Jaccard ≥ τ > 0
    * shares at least one shingle, so the shingle inverted-index
    * self-join finds EVERY qualifying pair — shared counts from one
    * pair-keyed partial agg, set sizes per doc, J = c/(nₐ+n_b−c).
    * The surfaced side ([[minhashLsh]]) verifies exact Jaccard on its
    * candidates, so it is a SUBSET of truth by construction and
    * recall = |found| / |truth| measures the BANDING's misses alone.
    *
    * Returns ONE row: (n_truth, n_found, recall).
    *
    * Scale posture — `sampleFrac`: exact truth is quadratic in the
    * duplicate structure BY CONSTRUCTION (even prefix-filtered, a
    * duplicate-storm corpus where every doc shares shingles with
    * hundreds of partners explodes), so at corpus scale the report
    * runs on a deterministic salted-hash DOC SLICE (the C8
    * machinery: membership depends only on (id, seed), never on
    * partitioning): both the truth side and the LSH side see the
    * same slice, so the ratio is banding recall over within-slice
    * pairs — an unbiased estimate of the corpus number, at
    * slice-quadratic cost (spec-pinned: the sampled report EQUALS
    * the full report over the pre-filtered slice). `sampleFrac = 1`
    * (the gate default) is the exact report; hot-shingle df caps
    * upstream compose when even the slice is stormy.
    */
  def lshRecall(docs: DataFrame, idCol: String, textCol: String,
                k: Int = 3, perms: Int = 128, bands: Int = 16,
                threshold: Double = 0.7, sampleFrac: Double = 1.0,
                seed: Long = 42L): DataFrame = {
    require(sampleFrac > 0 && sampleFrac <= 1,
      s"sampleFrac must be in (0, 1], got $sampleFrac")
    val docsIn = if (sampleFrac >= 1.0) docs
      else docs.filter(Sampling.hashKey(col(idCol), seed) <
        lit(Sampling.hexThreshold(sampleFrac)))
    lshRecallExact(docsIn, idCol, textCol, k, perms, bands, threshold)
  }

  /** [[lshRecall]] over an ABSOLUTE-size salted-hash slice — the
    * eval-sized posture whose cost stays flat as the corpus grows: a
    * FRACTION slice's pair space still grows as (f·N)² (measured:
    * 20% at the 100× replication = ratio100 177), while a fixed
    * ~`sampleDocs` slice keeps the quadratic truth work constant and
    * pays only the corpus-linear count + filter scan. On
    * duplicate-heavy data the expected within-slice truth-pair count
    * is replication-invariant (each doc's twin density scales with
    * 1/N exactly as the slice's pair count scales with N), so the
    * recall estimate keeps its signal. The fraction is derived as
    * min(1, sampleDocs/n) with one count pass — or from
    * `knownCount` when the caller already has a catalog count (the
    * C13 `knownCounts` precedent), skipping the corpus scan: at
    * 100 TB a full `count()` for one constant is a real job, and
    * every warehouse catalog serves row counts for free. The report
    * is IDENTICAL either way (spec-pinned): the fraction is the same
    * IEEE arithmetic from the same integer. The oracle replays it
    * from its own COUNT(*).
    */
  def lshRecallSlice(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 3, perms: Int = 128, bands: Int = 16,
                     threshold: Double = 0.7, sampleDocs: Long = 300L,
                     seed: Long = 42L,
                     knownCount: Option[Long] = None): DataFrame = {
    require(sampleDocs > 0, s"sampleDocs must be positive, got $sampleDocs")
    require(knownCount.forall(_ > 0),
      s"knownCount must be positive when given, got $knownCount")
    val n = knownCount.getOrElse(docs.count())
    val p = math.min(1.0, sampleDocs.toDouble / n)
    lshRecall(docs, idCol, textCol, k, perms, bands, threshold,
      sampleFrac = p, seed = seed)
  }

  private def lshRecallExact(docs: DataFrame, idCol: String,
                             textCol: String, k: Int, perms: Int,
                             bands: Int, threshold: Double): DataFrame = {
    // Sharing ONE persisted (id, sh) frame between the truth leg and
    // the LSH leg (the [[lshIndexRecall]] r19 pattern) was tried here
    // and MEASURED SLOWER: dedup_recall 1.44 → 1.84–2.43 s across three
    // iso re-records (sampled/sweep_abs flat). The truth leg's three
    // kernel consumers run fully pipelined inside scan-stage codegen;
    // replacing them with columnar-cache reads trades a cheap fused
    // recompute for cache build + three deserializing scans. Kept the
    // r18 shape: truth recomputes, the LSH leg caches its own pass.
    val truth = lshRecallTruth(docs, idCol, textCol, k, threshold)
    val found = minhashLsh(docs, idCol, textCol, k, perms, bands,
        threshold)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("_hit"))
    truth.join(found, Seq("doc_a", "doc_b"), "left")
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_found"))
      .withColumn("recall",
        round(col("n_found").cast("double") / col("n_truth"), 6))
  }

  /** The exact threshold-τ near-dup pair TRUTH both recall reports
    * score against — (doc_a, doc_b), doc_a < doc_b.
    */
  private def lshRecallTruth(docs: DataFrame, idCol: String,
                             textCol: String, k: Int,
                             threshold: Double): DataFrame = {
    // TRUTH via prefix filtering (the SSJoin/PPJoin family): a naive
    // shingle-inverted-index join is Σ_v df(v)² — quadratic wherever
    // hot shingles exist (a small shared vocabulary, boilerplate
    // grams, duplicate clusters). Under a GLOBAL total order on
    // shingles (df ascending, hash tiebreak), two sets with
    // J ≥ τ MUST collide inside their first ⌊(1−τ)·n⌋+1 elements —
    // if all shared shingles sat outside both prefixes, the overlap
    // would be too small to reach τ. So only those prefix postings
    // enter the self-join: hot shingles are, by the ordering, almost
    // never in a prefix, and the result is EXACTLY the naive join's
    // (the spec pins it against an all-pairs replay; the DuckDB
    // oracle deliberately stays the naive form — equal answers from
    // two independent algorithms). The kernel runs once per truth
    // leg and once inside minhashLsh (which caches its own pass) —
    // deliberately NOT persisted: a persisted base under this
    // self-join replanned catastrophically (682 s vs 1.9 s cold at
    // sf0.1), recompute is the fast posture.
    val sets = docs.select(col(idCol).as("id"),
      shingleHashes(col(textCol), k).as("sh"))
    val sh = sets.select(col("id"), explode(col("sh")).as("v"))
    val dfv = sh.groupBy(col("v")).agg(count(lit(1)).as("df"))
    // per-doc shingles re-assembled in (df, v) order; the per-doc
    // buffer is bounded by the doc's own shingle count, the same
    // bound every reassembly in this module carries
    val ordered = sh.join(dfv, "v")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("df"), col("v"))))
        .as("o"))
      .select(col("id"), size(col("o")).as("n"),
        transform(col("o"), s => s("v")).as("ov"))
      // floor((1−τ)n)+1 over-approximates n−⌈τn⌉+1 (safe: a LONGER
      // prefix can only add candidates; the epsilon absorbs IEEE
      // round-up on τ·n so a boundary-length pair can never be lost)
      .withColumn("plen",
        (floor(col("n") * lit(1.0 - threshold) + lit(1e-9)) + 1)
          .cast("int"))
      .select(col("id"), col("n"),
        slice(col("ov"), lit(1), col("plen")).as("pref"))
    val pre = ordered.select(col("id"), col("n"),
      explode(col("pref")).as("v"))
    // length filter: J ≥ τ forces τ·|A| ≤ |B| (epsilon again on the
    // safe side — over-inclusion only)
    val cand = pre.as("a").join(pre.as("b"),
        col("a.v") === col("b.v") && col("a.id") < col("b.id") &&
          col("b.n") >= col("a.n") * lit(threshold) - lit(1e-9) &&
          col("a.n") >= col("b.n") * lit(threshold) - lit(1e-9))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
    cand
      .join(sets.select(col("id").as("doc_a"), col("sh").as("sha")),
        "doc_a")
      .join(sets.select(col("id").as("doc_b"), col("sh").as("shb")),
        "doc_b")
      .withColumn("inter",
        size(array_intersect(col("sha"), col("shb"))).cast("double"))
      .filter(col("inter") /
        (size(col("sha")) + size(col("shb")) - col("inter")) >= threshold)
      .select(col("doc_a"), col("doc_b"))
  }

  /** C35c: banding-recall TUNING SWEEP — [[lshRecall]] at several
    * `bands` settings over ONE shared exact truth, the measured
    * recall-vs-cost curve that turns the main LSH knob into an
    * engineering decision (more bands = higher collision probability
    * per true pair = higher recall, at proportionally more candidate
    * verification; the S-curve P(collide) = 1−(1−J^(perms/b))^b makes
    * the trade-off sharp around τ). The quadratic truth leg — the
    * expensive part — is computed ONCE and localCheckpointed; each
    * setting re-runs only the banding + verification. One row per
    * setting: (bands, n_truth, n_found, recall); n_truth is identical
    * across rows by construction (truth does not depend on banding),
    * and recall is non-decreasing in bands on any corpus where the
    * finer banding's buckets nest (spec pins monotonicity on the sf
    * corpus and equality of each row with the single-setting
    * [[lshRecall]]).
    */
  def lshRecallSweep(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 3, perms: Int = 128,
                     bandsList: Seq[Int] = Seq(8, 16, 32),
                     threshold: Double = 0.7): DataFrame = {
    require(bandsList.nonEmpty, "bandsList must be non-empty")
    bandsList.foreach(b => require(b >= 1 && perms % b == 0,
      s"each bands setting must divide perms=$perms, got $b"))
    val truth = lshRecallTruth(docs, idCol, textCol, k, threshold)
      .localCheckpoint()
    // ONE shingle pass and ONE 128-perm signature pass shared by every
    // banding leg (r18): the signature is banding-INDEPENDENT — a leg
    // only re-slices it — so recomputing the minhash kernel per leg
    // (what per-leg [[minhashLsh]] calls did) paid the O(perms·|sh|)
    // kernel bandsList.size times for identical bits. Both frames are
    // MEMORY_AND_DISK like [[lshVerifiedPairs]]'s shingle cache:
    // LRU-evictable, O(corpus sets), caller-owned. (r19: feeding the
    // TRUTH leg from the same persisted frame was tried and measured
    // slower — see [[lshRecallExact]]; truth deliberately recomputes.)
    val sh = docs
      .select(col(idCol), shingleHashes(col(textCol), k).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = sh.select(col(idCol), txt.minhash(col("sh"), perms).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bandsList.distinct.sorted.map { b =>
      val found = lshVerifiedPairsFrom(sh, sigs, idCol, b, perms / b)
        .select(col("a").as("doc_a"), col("b").as("doc_b"), col("jaccard"))
        .filter(col("jaccard") >= threshold)
        .select(col("doc_a"), col("doc_b"), lit(1L).as("_hit"))
      truth.join(found, Seq("doc_a", "doc_b"), "left")
        .agg(count(lit(1)).as("n_truth"),
          sum(coalesce(col("_hit"), lit(0L))).as("n_found"))
        .select(lit(b).as("bands"), col("n_truth"), col("n_found"),
          round(col("n_found").cast("double") / col("n_truth"), 6)
            .as("recall"))
    }.reduce(_ unionAll _).orderBy("bands")
  }

  /** [[lshRecallSweep]] over the ABSOLUTE salted-hash doc slice of
    * [[lshRecallSlice]] — the 100×-recordable posture for the tuning
    * sweep: the shared exact truth is duplicate-QUADRATIC in whatever
    * doc set it sees, so sweeping over the full corpus (or a fraction
    * slice, whose pair space still grows as (f·N)²) is structurally
    * unrecordable at scale, while a fixed ~`sampleDocs` slice keeps
    * the truth work constant and pays only the corpus-linear count +
    * filter scan — the C37b discipline applied to C35c. One count
    * pass (or `knownCount` from the catalog) derives the fraction;
    * the slice is salted-hash deterministic, so every banding sees
    * the SAME docs and the rows remain one comparable curve.
    * Spec-pinned: each row equals the single-setting
    * [[lshRecallSlice]] at that banding.
    */
  def lshRecallSweepSlice(docs: DataFrame, idCol: String,
                          textCol: String, k: Int = 3, perms: Int = 128,
                          bandsList: Seq[Int] = Seq(8, 16, 32),
                          threshold: Double = 0.7,
                          sampleDocs: Long = 300L, seed: Long = 42L,
                          knownCount: Option[Long] = None): DataFrame = {
    require(sampleDocs > 0, s"sampleDocs must be positive, got $sampleDocs")
    require(knownCount.forall(_ > 0),
      s"knownCount must be positive when given, got $knownCount")
    val n = knownCount.getOrElse(docs.count())
    val p = math.min(1.0, sampleDocs.toDouble / n)
    val sliced = if (p >= 1.0) docs
      else docs.filter(Sampling.hashKey(col(idCol), seed) <
        lit(Sampling.hexThreshold(p)))
    lshRecallSweep(sliced, idCol, textCol, k, perms, bandsList, threshold)
  }

  // ---- decontamination -------------------------------------------------

  /** Benchmark decontamination: flags every training document that
    * shares at least `minHits` exact `k`-word shingles with an
    * evaluation/benchmark set — the standard n-gram-overlap test a
    * training pipeline runs before a corpus may ship (an eval example
    * leaking into pre-training data invalidates the benchmark). The
    * reference moves whole tables and has no eval-overlap surface; this
    * applies its content-hash philosophy (hbase-bulkload-service
    * `HBaseSerde.java:154` — identity from content bytes, never runtime
    * state) to cross-set membership.
    *
    * Output: one row per contaminated training doc —
    * `(idCol, n_grams, n_hits, contamination)` where `n_grams` is the
    * doc's distinct-shingle count, `n_hits` how many of those appear
    * anywhere in the eval set, `contamination = n_hits / n_grams`.
    * Clean documents produce no row (at 100 TB the contaminated slice,
    * not the corpus, is the output you can afford to materialize).
    *
    * Scale posture: the eval side (a benchmark suite — thousands of
    * documents, not billions) collapses to a distinct shingle-hash set
    * and is broadcast, so the corpus is never shuffled for the join;
    * non-matching grams die in the map-side broadcast probe and only
    * hit grams reach the one `groupBy(id)` shuffle, which is bounded by
    * the contaminated slice. The shingle kernel is the same native
    * one-pass expression as the dedup family
    * ([[graft.functions.TextHashes.wordShingleHashes]]).
    */
  def decontaminate(train: DataFrame, evalSet: DataFrame,
                    idCol: String, textCol: String,
                    k: Int = 5, minHits: Long = 1L): DataFrame = {
    require(k >= 1, s"shingle size k must be >= 1, got $k")
    require(minHits >= 1, s"minHits must be >= 1, got $minHits")
    val evalGrams = broadcast(
      evalSet.select(explode(shingleHashes(col(textCol), k)).as("g"))
        .distinct())
    train
      .select(col(idCol), shingleHashes(col(textCol), k).as("sh"))
      .select(col(idCol), size(col("sh")).cast("long").as("n_grams"),
        explode(col("sh")).as("g"))
      .join(evalGrams, "g")
      .groupBy(col(idCol), col("n_grams"))
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
      .select(col(idCol), col("n_grams"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_grams"), 6)
          .as("contamination"))
  }

  /** C12c: NEAR-duplicate decontamination — the fuzzy companion to
    * [[decontaminate]]: C12's exact-gram overlap catches VERBATIM
    * benchmark leakage, but a lightly-edited copy (reworded stem,
    * shuffled answer options, whitespace-normalized dump) shares few
    * exact k-grams while its n-gram Jaccard stays high — the leakage
    * class decontamination audits actually flag. This reuses the C25
    * cross-set MinHash-LSH machinery ([[incrementalMinhash]]) with
    * the EVAL set in the batch seat: benchmark band keys broadcast,
    * the training corpus probed map-side (never reshuffled — the
    * 100-TB posture: cost = one train scan + a collision-bounded
    * verify join, both sized by the benchmark suite), candidates
    * verified by exact shingle Jaccard. One row per contaminated
    * train doc: (idCol, n_eval_matches, max_jaccard) — the row a
    * curator drops or quarantines.
    */
  def decontaminateFuzzy(train: DataFrame, evalSet: DataFrame,
                         idCol: String, textCol: String, k: Int = 3,
                         perms: Int = 128, bands: Int = 16,
                         threshold: Double = 0.7): DataFrame =
    incrementalMinhash(train, evalSet, idCol, textCol, k, perms,
        bands, threshold)
      .groupBy(col("corpus_id"))
      .agg(count(lit(1)).as("n_eval_matches"),
        round(max(col("jaccard")), 6).as("max_jaccard"))
      .select(col("corpus_id").as(idCol), col("n_eval_matches"),
        col("max_jaccard"))

  /** C23: Bloom-prefiltered decontamination — identical OUTPUT to
    * [[decontaminate]], different broadcast economics. C12 broadcasts
    * the eval set's exact distinct gram-hash set; that is MBs for a
    * benchmark suite but grows without bound with the reference
    * collection (decontaminating against a full held-out corpus). Here
    * the map-side probe is a Bloom bitset ([[graft.functions.Bloom]])
    * sized by the EVAL set (32 bits/gram by default — `buildSized` —
    * so the fp rate holds at ~0.4% whether the reference set is one
    * benchmark or a full held-out corpus; a fixed-size bitset
    * saturates once 2n ≥ m and the probe passes everything, measured
    * as a 6× regression at 100×); false positives then die in an
    * exact verification join against the eval gram set, which runs at
    * SURVIVOR scale (true hits + fp), not corpus scale, so AQE sizes
    * it freely. No false negatives ⇒ the result is exactly
    * [[decontaminate]]'s, and the oracle replays the exact form. The
    * eval gram set is persisted across its three uses (count, build,
    * verify join) — eval-bounded, LRU-evictable, caller-owned like
    * [[boilerplate]]'s cache. `logBits > 0` forces an explicit size
    * (tests use an undersized filter to prove the verify join is
    * load-bearing).
    */
  def decontaminateBloom(train: DataFrame, evalSet: DataFrame,
                         idCol: String, textCol: String,
                         k: Int = 5, minHits: Long = 1L,
                         logBits: Int = 0): DataFrame = {
    require(k >= 1, s"shingle size k must be >= 1, got $k")
    require(minHits >= 1, s"minHits must be >= 1, got $minHits")
    val evalGrams = evalSet
      .select(explode(shingleHashes(col(textCol), k)).as("g"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (bits, lb) =
      if (logBits > 0) (graft.functions.Bloom.build(evalGrams, col("g"),
        logBits), logBits)
      else graft.functions.Bloom.buildSized(evalGrams, col("g"))
    train
      .select(col(idCol), shingleHashes(col(textCol), k).as("sh"))
      .select(col(idCol), size(col("sh")).cast("long").as("n_grams"),
        explode(col("sh")).as("g"))
      // eval-sized map-side kill: non-members never leave the scan
      .filter(graft.functions.Bloom.probe(bits, col("g"), lb))
      // exact verify at survivor scale — removes Bloom false positives.
      // The eval side carries the broadcast hint: it is the bounded
      // side by construction (the filter was BUILT from it — an exact
      // HashedRelation of the same grams is the same order of memory
      // as the bitset), and without the hint the static planner's
      // selectivity guess broadcast the SURVIVOR stream instead
      // (BuildLeft of the probe-filtered train grams in the r18
      // before-plan) — corpus-scale rows collected to the driver.
      .join(broadcast(evalGrams), "g")
      .groupBy(col(idCol), col("n_grams"))
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
      .select(col(idCol), col("n_grams"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_grams"), 6)
          .as("contamination"))
  }

  /** C14: boilerplate density — per document, how much of its content
    * is corpus-wide repeated phrasing (the Gopher/RefinedWeb-style
    * "remove documents made of boilerplate" signal). A `k`-word shingle
    * is *boilerplate* when it appears in at least `minDf` distinct
    * documents; each doc reports its distinct-gram count, how many of
    * those grams are boilerplate, their fraction, and the document
    * frequency of its most common gram.
    *
    * Scale shape (100 TB): document frequency is a hash `groupBy` on
    * the gram hash — partial map-side aggregation absorbs hot grams
    * (the literal boilerplate ones), so a phrase appearing in 10⁹ docs
    * costs one long per map task, never a single-task row pile
    * (deliberately NOT a `count over (partition by g)` window, which
    * would shuffle every instance of a hot gram to one task). The
    * frequent-gram set joins back against the gram stream keyed on the
    * same hash (AQE picks broadcast when it fits), then one per-doc
    * partial agg; docs with zero boilerplate re-enter via a left join
    * on the slim (id, n_grams) projection. The shingle kernel is the
    * same codegen one-pass expression as C3-C5/C12, persisted once
    * across its two consumers.
    *
    * Like [[lshVerifiedPairs]], the persisted projection is
    * LRU-evictable and OWNED BY THE CALLER: it stays cached for the
    * session so repeated actions on the returned frame stay cheap —
    * pass `persistShingles = false` for one-shot runs where executor
    * memory is tighter than CPU, or `spark.catalog.clearCache()` to
    * drop it after the consuming action.
    */
  def boilerplate(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 3, minDf: Long = 3L,
                  persistShingles: Boolean = true): DataFrame = {
    require(k >= 1, s"shingle size k must be >= 1, got $k")
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    // EvalOnce: the `n_grams >= 1` filter would otherwise be pushed
    // below this projection with the shingle kernel INLINED into the
    // condition — two kernel evaluations per row in the cache-build
    // stage (r19; guide §4.4)
    val sh = docs
      .select(col(idCol),
        graft.functions.EvalOnce(shingleHashes(col(textCol), k)).as("sh"))
      .select(col(idCol), size(col("sh")).cast("long").as("n_grams"),
        col("sh"))
      .filter(col("n_grams") >= 1)
    if (persistShingles)
      sh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grams = sh.select(col(idCol), explode(col("sh")).as("g"))
    // grams are DISTINCT per doc, so count == document frequency
    val freq = grams.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val hits = grams.join(freq, "g")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_boiler"), max(col("df")).as("max_df"))
    sh.select(col(idCol), col("n_grams"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        round(coalesce(col("n_boiler"), lit(0L)).cast("double") /
          col("n_grams"), 6).as("boiler_frac"),
        coalesce(col("max_df"), lit(0L)).as("max_df"))
  }

  // ---- SimHash ---------------------------------------------------------

  /** SimHash near-dup pairs within Hamming distance `maxHamming`,
    * blocked on `maxHamming + 1` bit-bands of the 64-bit signature (any
    * shared band ⇒ candidate). With `b = maxHamming + 1` bands, a pair
    * within Hamming `maxHamming` has at most `maxHamming` differing
    * bits spread over `b` bands, so by pigeonhole at least one band is
    * identical — full recall *before* the bucket cap, at every
    * `maxHamming`, not just ≤ 3. Band widths split 64 bits as evenly as
    * possible (e.g. maxHamming=3 → the classic 4×16-bit blocking).
    *
    * Caveat: buckets larger than `maxBucket` are dropped, so realized
    * recall is subject to the cap — and at large `maxHamming` the bands
    * get narrow (maxHamming=31 ⇒ 2-bit bands ⇒ at most 4 buckets per
    * band), which concentrates the corpus into few giant buckets that
    * the cap then discards. Keep `maxHamming` modest (≤ ~8) or raise
    * `maxBucket` deliberately; pair dropping is silent by design (the
    * degenerate-key guard), so audit bucket sizes first if recall
    * matters more than cost.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, maxHamming: Int = 3,
                   maxBucket: Int = 1000): DataFrame = {
    val sigs = docs.select(col(idCol),
      graft.functions.txt.simhash(shingleHashes(col(textCol), k)).as("sig"))
    hammingPairs(sigs, idCol, "sig", Seq.empty, maxHamming, maxBucket)
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("hamming"))
  }

  /** Exact hamming-bounded pair generation over ANY 64-bit signature
    * column — the C4/F5 shared machinery. Pigeonhole-exact: with
    * `maxHamming + 1` bands, two sigs within the bound MUST agree on
    * at least one whole band, so banding loses nothing. `extraKeys`
    * scope buckets (e.g. per media kind) and come back on every pair.
    * The signature is 8 bytes, so it rides through the banding shuffle
    * (collect_list of (id, sig) structs) instead of being re-joined —
    * the sig kernel is evaluated once per row and verification is
    * join-free.
    */
  private[graft] def hammingPairs(sigs: DataFrame, idCol: String,
                                  sigCol: String, extraKeys: Seq[String],
                                  maxHamming: Int,
                                  maxBucket: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 64)")
    val nBands = maxHamming + 1
    // band b covers bits [offsets(b), offsets(b+1)): widths 64/n rounded
    val offsets = (0 to nBands).map(b => b * 64 / nBands)
    val bandKeys = array((0 until nBands).map { b =>
      val width = offsets(b + 1) - offsets(b)
      val mask = if (width == 64) -1L else (1L << width) - 1L
      struct(lit(b).as("band"),
        shiftrightunsigned(col(sigCol), offsets(b)).bitwiseAND(lit(mask))
          .as("bkey"))
    }: _*)
    val ek = extraKeys.map(col)
    sigs
      .select((ek :+ col(idCol).as("_m_id")) :+ col(sigCol).as("_m_sig") :+
        explode(bandKeys).as("bk"): _*)
      .groupBy(ek :+ col("bk.band") :+ col("bk.bkey"): _*)
      .agg(sort_array(collect_list(struct(col("_m_id").as("id"),
        col("_m_sig").as("sig")))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
      .select(ek :+ explode(pairsOf(col("members"))).as("p"): _*)
      .select(ek :+ col("p.a.id").as("a") :+ col("p.b.id").as("b") :+
        col("p.a.sig").as("sig_a") :+ col("p.b.sig").as("sig_b"): _*)
      .distinct()
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)").cast("int"))
      .filter(col("hamming") <= maxHamming)
  }

  // ---- embedding near-dup ---------------------------------------------

  /** Deterministic gaussian hyperplanes (Box–Muller over SplitMix-free
    * scala.util.Random(seed) — driver-side constants, broadcast as
    * literals into the plan).
    */
  private[graft] def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Embedding-cosine near-dup pairs via random-hyperplane LSH blocking,
    * verified by exact cosine ≥ `threshold`. `bands` independent bucket
    * tables of `planesPerBand` bits each.
    *
    * The vector (dim doubles) rides through the banding shuffle inside
    * the collect_list — the SimHash-signature trick one operator up —
    * and [[graft.functions.vec.bucketNearDupPairs]] verifies every
    * in-bucket pair in one fused O(k²·d) kernel call per bucket, so
    * only pairs that already cleared the cosine gate ever materialize
    * as rows and the `distinct` sees just those. Join-free, no pair
    * structs carrying vectors: the old shape (explode all pair structs,
    * distinct 37M ids, two shuffle joins back to the vectors) went 104×
    * super-linear at 10× the corpus; this one is ~3×.
    *
    * Scale note: candidate volume itself is governed by (bands,
    * planesPerBand) — for a random pair a 6-plane band collides at
    * 2⁻⁶, so pairs grow ~N²/2⁶ once N ≫ 2^planesPerBand. That is
    * inherent to hyperplane LSH at a threshold as weak as cosine 0.4
    * (barely above orthogonal; holding recall while adding planes needs
    * bands ~ N^0.67 — no sub-quadratic blocking exists down there). At
    * real corpus scale, callers raise `planesPerBand` ~ log₂N and
    * `bands` to the recall they're paying for, and `maxBucket` hard-caps
    * the per-bucket work; the defaults are tuned to the synthetic
    * corpus + its DuckDB plane-replay oracle.
    */
  def embeddingNearDup(emb: DataFrame, idCol: String, vecCol: String,
                       dim: Int, threshold: Double = 0.4,
                       bands: Int = 12, planesPerBand: Int = 6,
                       seed: Long = 7L, maxBucket: Int = 2000): DataFrame = {
    val vd = transform(col(vecCol), x => x.cast("double"))
    val withVec = emb.select(col(idCol), vd.as("v"))
    val all = hyperplanes(bands * planesPerBand, dim, seed)
    bandedVerifiedPairs(withVec, idCol, all, planesPerBand, threshold,
      maxBucket)
      .select(col("a").as("vec_a"), col("b").as("vec_b"), col("cosine"))
  }

  /** The shared banded-LSH verify chain behind [[embeddingNearDup]] and
    * [[semantic]]: posexplode hyperplane buckets → capped per-bucket
    * collect → exact-cosine pair verification → distinct (a, b, cosine)
    * pairs. `extraKeys` PREPENDS grouping columns to the bucket key
    * (SemDeDup adds the semantic cell id — strictly finer buckets, same
    * machinery); `vecs` must carry `(extraKeys..., idCol, v: array
    * <double>)`.
    *
    * The kernel sorts members by id, so pair orientation (a < b) and
    * cosine argument order match the original sort_array + pairsOf
    * shape. CappedCollectList bounds the aggregation buffer at
    * maxBucket+1 vectors even for a degenerate hot bucket: an over-cap
    * bucket surfaces with exactly maxBucket+1 members, so the size
    * filter drops precisely the same buckets an uncapped collect would
    * — without ever materializing the hot bucket's vectors. Cosine is a
    * deterministic function of (a, b), so distinct over the triple
    * dedups multi-band collisions exactly like a pair-level distinct.
    */
  private def bandedVerifiedPairs(vecs: DataFrame, idCol: String,
                                  planes: Array[Array[Double]],
                                  planesPerBand: Int, threshold: Double,
                                  maxBucket: Int,
                                  extraKeys: Seq[String] = Seq.empty): DataFrame =
    vecs
      .select(extraKeys.map(col) ++ Seq(col(idCol), col("v"),
        posexplode(graft.functions.vec.hyperplaneBuckets(col("v"), planes,
          planesPerBand)).as(Seq("band", "bkey"))): _*)
      .groupBy(extraKeys.map(col) ++ Seq(col("band"), col("bkey")): _*)
      .agg(graft.functions.CappedCollectList(
        struct(col(idCol).as("id"), col("v")), maxBucket).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
      .select(explode(
        graft.functions.vec.bucketNearDupPairs(col("members"), threshold))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"),
        col("p.cosine").as("cosine"))
      .distinct()

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — "Semantic
    * deduplication"): cluster the corpus by embedding k-means, find
    * near-duplicate pairs WITHIN each semantic cluster, and from every
    * duplicate group keep the LEAST-CENTRAL exemplar — the member with
    * the lowest cosine to its own cluster centroid — so pruning removes
    * redundancy while preserving the cluster's diverse boundary
    * examples (the paper's keeper policy; ties break to the smaller
    * id so the rule is total and engine-replayable).
    *
    * Output: EVERY input row as `(vec_id, cell_id, centroid_sim,
    * n_dups, keep)` — the keep column is the dedup decision, the rest
    * is the evidence (which semantic cluster, how central, how many
    * verified near-dup partners), so a curation pipeline can audit or
    * re-threshold without re-running.
    *
    * Composition — every stage is a proven piece run in a new order:
    *  - coarse clusters: [[graft.operators.Knn.kmeansSubCodebooks]] at
    *    m = 1 (full-vector k-means, trained on a count-capped
    *    deterministic sample — training cost constant in corpus size),
    *    or pass a pre-trained `coarse` (cell_id, centroid) table; the
    *    assignment is the Knn rule exactly (argmax cosine, ties to the
    *    smallest cell), with the winner's cosine kept as the
    *    centrality score via one scalar struct-max aggregate (no array
    *    buffers in the aggregation — the §6 r8 lesson);
    *  - candidates: [[embeddingNearDup]]'s banded hyperplane-LSH with
    *    the cell id PREPENDED to the bucket key — pairs must agree on
    *    semantic cell AND sign-bit bucket, so buckets are strictly
    *    finer than C6's and the per-bucket `maxBucket` cap binds
    *    later; verification is the same fused O(k²·d) in-bucket
    *    kernel, so only pairs clearing `threshold` ever materialize;
    *  - keeper: per verified pair the higher-`centroid_sim` member is
    *    dropped (`csim` ties drop the larger id); a chain a—b—c can
    *    drop both interior members — that is SemDeDup's greedy
    *    semantics, not transitive-closure dedup ([[dedupClusters]]
    *    covers that policy).
    *
    * Scale: training is capped, assignment is O(n·k) under a broadcast
    * centroid table, banding is O(n·planes), buckets are capped, and
    * the keeper/degree joins are keyed on 8-byte ids — no stage is
    * super-linear in corpus size. At real scale raise `ksub` (SemDeDup
    * uses n/⟨cluster size⟩ clusters) and `planesPerBand` ~ log₂N
    * together; both only sharpen the same capped-bucket plan.
    */
  def semantic(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
               threshold: Double = 0.4,
               coarse: Option[DataFrame] = scala.None,
               ksub: Int = 16, iters: Int = 2, trainMod: Int = 2,
               maxTrain: Int = 8192,
               bands: Int = 12, planesPerBand: Int = 6, seed: Long = 7L,
               maxBucket: Int = 2000): DataFrame = {
    val withVec = emb.select(col(idCol).cast("long").as("vec_id"),
      Knn.asDouble(col(vecCol)).as("v"))
    val coarseDf = broadcast(coarse.map(_.select(col("cell_id"),
        Knn.asDouble(col("centroid")).as("centroid")))
      .getOrElse(Knn.kmeansSubCodebooks(emb, idCol, vecCol, dim, m = 1,
          ksub = ksub, iters = iters, trainMod = trainMod,
          maxTrain = maxTrain)
        .select(col("cell_id"), col("cvec").as("centroid"))))
    // argmax assignment carrying the winning cosine: max over a
    // two-scalar struct orders by (csim, -cell_id) — same winner as
    // Knn's max_by rule, centrality score for free
    val assign = withVec.join(coarseDf)
      .withColumn("csim", Knn.cosineD(col("v"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("csim").as("csim"),
        (-col("cell_id")).as("nc"))).as("w"))
      .select(col("vec_id"), (-col("w.nc")).as("cell_id"),
        col("w.csim").as("csim"))
    val planes = hyperplanes(bands * planesPerBand, dim, seed)
    val pairs = bandedVerifiedPairs(
      withVec.join(assign.select(col("vec_id"), col("cell_id")), "vec_id")
        .select(col("cell_id"), col("vec_id"), col("v")),
      "vec_id", planes, planesPerBand, threshold, maxBucket,
      extraKeys = Seq("cell_id"))
      .select(col("a"), col("b"))
    // keeper policy: per pair (a < b) drop the more central member;
    // equal centrality drops b, the larger id
    val drops = pairs
      .join(assign.select(col("vec_id").as("a"), col("csim").as("acs")), "a")
      .join(assign.select(col("vec_id").as("b"), col("csim").as("bcs")), "b")
      .select(when(col("acs") > col("bcs"), col("a")).otherwise(col("b"))
        .as("vec_id"))
      .distinct()
    val deg = pairs
      .select(explode(array(col("a"), col("b"))).as("vec_id"))
      .groupBy("vec_id").agg(count(lit(1)).as("n_dups"))
    assign
      .join(deg, Seq("vec_id"), "left")
      .join(drops.withColumn("d", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell_id"),
        round(col("csim"), 6).as("centroid_sim"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        (!coalesce(col("d"), lit(false))).as("keep"))
    // unordered by design: presentation order is the query wrapper's
    // business (Pipeline.dedupSemantic) — a production caller filtering
    // on `keep` must not pay a corpus-wide range sort here
  }
}
