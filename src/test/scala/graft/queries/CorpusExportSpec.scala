package graft.queries

import graft.SparkSpec
import graft.operators.{Bpe, Sampling}
import org.apache.spark.sql.functions._

/** C26: the composed export pipeline — packing/shard invariants on the
  * query output, and full reconciliation between the query's token
  * accounting and the ACTUAL shard files [[Sampling.exportShards]]
  * writes (doc-for-doc assignment match; packing counts in the frozen
  * tokenizer's own units, so the packed total must equal the files'
  * E12 BPE total exactly — the same accounting the G14 streaming
  * monitor reports).
  */
class CorpusExportSpec extends SparkSpec {
  import spark.implicits._

  test("corpus_export composes without drift and reconciles with the " +
      "exported shard files' token accounting") {
    val docs = sf("documents")
    val export = Pipeline.corpusExport(docs).collect()
    assert(export.length > 8, s"need enough survivors, ${export.length}")
    // packing invariant: start_tok is the exclusive prefix sum of
    // n_tokens in doc_id order, seq_id/offset derive from it
    val byId = export.sortBy(_.getAs[Long]("doc_id"))
    var acc = 0L
    byId.foreach { r =>
      assert(r.getAs[Long]("start_tok") == acc,
        s"doc ${r.getAs[Long]("doc_id")}: start_tok")
      assert(r.getAs[Long]("seq_id") == acc / 2048L &&
        r.getAs[Long]("offset") == acc % 2048L)
      acc += r.getAs[Long]("n_tokens")
    }
    // shard deal: balanced within one row, dense pos per shard
    val byShard = export.groupBy(_.getAs[Long]("shard"))
      .map { case (s, rs) => s -> rs.map(_.getAs[Long]("pos")).sorted }
    val sizes = (0L until 8L).map(s => byShard.get(s).map(_.size).getOrElse(0))
    assert(sizes.max - sizes.min <= 1, s"unbalanced shards: $sizes")
    byShard.foreach { case (s, ps) =>
      assert(ps.toSeq == (0L until ps.size.toLong).toList,
        s"shard $s pos not dense")
    }
    // the file-writing twin: same corpus slice through exportShards
    val outDir = java.nio.file.Files.createTempDirectory("export").toString
    val survivorIds = export.map(_.getAs[Long]("doc_id")).toSet
    val survDocs = docs.filter(col("doc_id").isInCollection(survivorIds))
    Sampling.exportShards(survDocs, "doc_id", outDir, shards = 8)
    val back = spark.read.parquet(outDir)
    assert(back.count() == export.length.toLong)
    // doc-for-doc assignment match between query and files
    val fileAssign = back.select("doc_id", "shard", "pos").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Number]("shard").longValue(),
        r.getAs[Long]("pos"))).toSet
    val queryAssign = export.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("shard"), r.getAs[Long]("pos"))).toSet
    assert(fileAssign == queryAssign,
      "exported shard/pos must equal the query's assignment")
    // token accounting: packing now counts in the frozen tokenizer's
    // OWN units, so the packed total (sum of n_tokens) must equal the
    // frozen-BPE total of the exported files AND of the source
    // survivors exactly — no parallel counting rule to reconcile
    def bpeTotal(df: org.apache.spark.sql.DataFrame): Long =
      Bpe.tokenStats(df, "doc_id", "text", Bpe.frozenMerges)
        .agg(sum("n_bpe")).head().getLong(0)
    assert(bpeTotal(back.select("doc_id", "text")) == acc,
      "exported files' BPE total must equal the packed total")
    assert(bpeTotal(survDocs.select("doc_id", "text")) == acc,
      "source survivors' BPE total must equal the packed total")
  }

  test("corpus_shard_stats: the manifest pins the balanced deal, the " +
      "exact positional assignment, and the tokenizer's own totals") {
    val docs = sf("documents")
    val stats = Pipeline.corpusShardStats(docs).collect()
    assert(stats.length == 8)
    val sizes = stats.map(_.getAs[Long]("n_docs"))
    assert(sizes.sum == docs.count())
    assert(sizes.max - sizes.min <= 1, "balanced deal: sizes within 1")
    stats.foreach { r =>
      assert(r.getAs[Long]("min_pos") == 0L)
      assert(r.getAs[Long]("max_pos") == r.getAs[Long]("n_docs") - 1,
        "positions tile 0..n_docs-1 gaplessly")
    }
    // the checksum pins the exact (doc -> position) assignment
    val manual = Sampling.shuffleShard(docs, "doc_id", 8, 42L)
      .groupBy("shard")
      .agg(sum(col("doc_id") * (col("pos") + lit(1L))).as("cs"))
      .as[(Long, Long)].collect().toMap
    stats.foreach { r =>
      assert(r.getAs[Long]("order_checksum") ==
        manual(r.getAs[Long]("shard")))
    }
    // token totals are the frozen tokenizer's units: sum to the corpus
    val total = Bpe.tokenStats(docs, "doc_id", "text", Bpe.frozenMerges)
      .agg(sum("n_bpe")).head().getLong(0)
    assert(stats.map(_.getAs[Long]("n_tokens")).sum == total)
  }

  test("corpus_export_ids: the shard manifest's token totals equal the " +
      "oracle-checked packed totals, and the shard files' id streams " +
      "concatenate to the annealed survivors' token stream exactly") {
    val docs = sf("documents")
    val dir = java.nio.file.Files.createTempDirectory("cei").toString
    val manifest = Pipeline.corpusExportIds(docs, dir).collect()
    // whitespace-faithful tokens: the sf0.001 schedule packs to five
    // 2048-token sequences = 3 two-sequence shards
    assert(manifest.length == 3, s"3 shards, got ${manifest.length}")
    // C26 lifted to tensor shards: the files' token total must equal
    // the SCHEDULED docs' frozen-BPE total — the anneal consumes only
    // each phase's fraction of each source (leftovers drop, the C31
    // contract), and every scheduled token lands in exactly one
    // tensor cell, none invented
    val survivors = Pipeline.corpusCurate(docs, fuzzy = true)
      .select("doc_id")
    val scheduled = Sampling.annealOrder(
        survivors.join(docs, Seq("doc_id")), "doc_id", "source",
        Pipeline.annealPhases, seed = 42L)
      .select("doc_id")
    val schedTotal = Bpe.tokenStats(
        scheduled.join(docs, Seq("doc_id")), "doc_id", "text",
        Bpe.frozenMerges)
      .agg(sum("n_bpe")).head().getLong(0)
    assert(manifest.map(_.getAs[Long]("n_tokens")).sum == schedTotal,
      "manifest token total must equal the scheduled docs' BPE total")
    // shard ranges are contiguous and disjoint in schedule order
    val ordered = manifest.sortBy(_.getAs[Int]("shard"))
    ordered.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("last_seq") + 1 == b.getAs[Long]("first_seq"),
          "shards must cover contiguous disjoint seq ranges")
      case _ =>
    }
    assert(ordered.head.getAs[Long]("first_seq") == 0L)
    // content: the concatenation of the written tensor rows IS the
    // annealed schedule's id stream (survivor docs' encodeIds arrays
    // in pos order, laid back-to-back)
    val fileStream = spark.read.parquet(dir)
      .orderBy("seq_id").select("ids")
      .as[Seq[Int]].collect().flatten.toSeq
    val schedStream = Sampling.annealOrder(
        survivors.join(docs, Seq("doc_id")), "doc_id", "source",
        Pipeline.annealPhases, seed = 42L)
      .join(docs, Seq("doc_id"))
      .select(col("pos"),
        graft.functions.bpe.encodeIds(col("text"), Bpe.frozenMerges)
          .as("ids"))
      .orderBy("pos").select("ids")
      .as[Seq[Int]].collect().flatten.toSeq
    assert(fileStream == schedStream,
      "shard tensors must concatenate to the annealed token stream")
    // every full sequence is exactly 2048 tokens (only the tail short)
    val lens = spark.read.parquet(dir).orderBy("seq_id")
      .select("n_tokens").as[Long].collect()
    assert(lens.init.forall(_ == 2048L) && lens.last <= 2048L,
      "every non-tail tensor row is exactly budget tokens")
  }
}
