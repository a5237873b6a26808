package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training data (SURVEY.md §2 C11): the
  * standard concat-then-chunk scheme — documents are laid out
  * back-to-back in a deterministic order and cut into fixed
  * `budget`-token training sequences, so each doc gets
  * `(seq_id, offset)` coordinates and sequences have zero padding
  * waste (docs may span a boundary, as in GPT-style packing).
  *
  * The layout is a global exclusive prefix sum of token counts. A
  * naive `Window.orderBy(id)` without partitioning funnels the corpus
  * through ONE task — the classic scale-killer — so this implements
  * the two-phase distributed scan: range-partition by id, sum each
  * partition (map-side, parallel), prefix-scan the tiny per-partition
  * totals on the driver (one row per partition), then broadcast the
  * offsets and finish with a per-partition window (parallel again).
  * Total cost: one range exchange + one window, both fully parallel;
  * driver state is O(partitions), independent of corpus size.
  */
object Packing {

  /** Adds `start_tok` (exclusive global prefix sum of `tokensCol` in
    * `idCol` order), `seq_id` and `offset` for `budget`-token
    * sequences. Output columns: idCol, tokensCol, [carryCols...],
    * start_tok, seq_id, offset — `carryCols` ride through untouched
    * (cheaper than a corpus-wide join-back when the caller needs its
    * own columns next to the layout).
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    budget: Long, numPartitions: Int = 0,
                    carryCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .select(col(idCol) +: col(tokensCol).cast("long").as(tokensCol) +:
        carryCols.map(col): _*)
      .repartitionByRange(n, col(idCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint() // pin partitioning: sums and window must see the same pids

    // phase 1: per-partition totals — numPartitions rows to the driver.
    // RangePartitioning assigns ascending key ranges to ascending
    // partition ids, so the prefix scan runs in _pid order.
    val inOrder = ranged.groupBy("_pid")
      .agg(sum(col(tokensCol)).as("_t"))
      .collect()
      .sortBy(_.getAs[Int]("_pid"))
    val offsets = inOrder.scanLeft(0L)(_ + _.getAs[Long]("_t")).init
    val offsetMap = inOrder.map(_.getAs[Int]("_pid")).zip(offsets).toMap

    // phase 2: per-partition exclusive cumsum + broadcast offset
    val mapExpr = map(offsetMap.toSeq.flatMap {
      case (p, o) => Seq(lit(p), lit(o))
    }: _*)
    val w = Window.partitionBy(col("_pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn("start_tok",
        element_at(mapExpr, col("_pid")) +
          coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      // integer DIV, not floor(double /): a double quotient near an
      // integer ulp misrounds once start_tok approaches 2^53 — exact
      // integer division matches the oracle's `//` at every scale
      .withColumn("seq_id", expr(s"start_tok DIV ${budget}L"))
      .withColumn("offset", col("start_tok") % budget)
      .drop("_pid")
  }

  /** C11b: the per-sequence DOCUMENT-SPAN manifest a packed-pretraining
    * data loader actually consumes: [[packSequences]] lays docs
    * back-to-back and cuts at `budget`, so a document can straddle a
    * cut — this explodes each doc into one row per training sequence
    * it occupies, with the span's position inside the sequence
    * (`offset`), its length (`span_len`), and where the span starts
    * inside the document (`pos_in_doc` — the resume point for the
    * continuation row). Loaders use exactly this to build attention
    * masks / document-boundary resets per packed sequence.
    *
    * Plan shape: packSequences' two-phase prefix sum, then ONE
    * codegen-friendly `explode(sequence(first_seq, last_seq))` per doc
    * — a doc emits `ceil(n/budget)+1`-ish rows, so the explode is
    * output-proportional, never corpus-quadratic; zero-token docs emit
    * nothing. Per sequence the spans tile `[0, fill)` gaplessly
    * (spec-asserted), the last sequence may be partial.
    */
  def sequenceSpans(df: DataFrame, idCol: String, tokensCol: String,
                    budget: Long, numPartitions: Int = 0): DataFrame = {
    val packed = packSequences(df, idCol, tokensCol, budget, numPartitions)
    packed
      .filter(col(tokensCol) > 0)
      .select(col(idCol), col(tokensCol), col("start_tok"),
        explode(sequence(col("seq_id"),
          expr(s"(start_tok + `$tokensCol` - 1) DIV ${budget}L")))
          .as("seq_id"))
      .withColumn("_sstart",
        greatest(col("start_tok"), col("seq_id") * budget))
      .withColumn("_send",
        least(col("start_tok") + col(tokensCol),
          (col("seq_id") + 1) * budget))
      .select(col("seq_id"), col(idCol),
        (col("_sstart") - col("seq_id") * budget).as("offset"),
        (col("_send") - col("_sstart")).as("span_len"),
        (col("_sstart") - col("start_tok")).as("pos_in_doc"))
  }

  /** C36: the per-sequence census over a [[sequenceSpans]] table —
    * docs spanned, carry-in flag (the sequence opens mid-document),
    * token fill, first/last doc: the attention-boundary distribution
    * a loader's masking decision reads. One |seqs|-group partial agg;
    * see [[graft.queries.Pipeline.packingStats]] for the registered
    * row.
    */
  def spanCensus(spans: DataFrame, idCol: String): DataFrame =
    spans.groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("span_len").as("n_tokens"),
        max(when(col("offset") === 0 && col("pos_in_doc") > 0, 1L)
          .otherwise(0L)).as("carry_in"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))

  /** C27: token-window chunking — the sliding-window slicing pass a
    * RAG indexer or long-context curriculum uses: each document's
    * token-ID array is cut into windows of `chunkTok` tokens starting
    * every `stride` tokens (stride < chunkTok ⇒ overlapping windows;
    * stride == chunkTok ⇒ a partition). Every token position is
    * covered, the first window starts at 0, and the tail window may be
    * shorter than `chunkTok` (standard sliding-window semantics — a
    * short tail is kept, never padded or dropped). A document with an
    * empty id array emits nothing.
    *
    * Output: (idCol, chunk_idx, tok_start, n_tok, first_id, last_id,
    * id_wsum, chunk) — `chunk` is the window's id slice;
    * `id_wsum = Σ (1-based pos in chunk) · id` is the order-sensitive
    * integer checksum the oracle replays so chunk CONTENT (not just
    * shape) is cross-engine-checked without hashing arrays.
    *
    * Plan shape: map-only — one `explode(sequence)` per doc (fanout
    * `ceil(n/stride)`, output-proportional) and per-chunk `slice` /
    * array folds; NO shuffle anywhere, so the operator scales with
    * scan bandwidth alone and inherits the source's partitioning — at
    * 100 TB it is exactly as parallel as the parquet scan feeding it.
    */
  def tokenChunks(df: DataFrame, idCol: String, idsCol: String,
                  chunkTok: Int, stride: Int): DataFrame = {
    require(chunkTok > 0, s"chunkTok must be positive, got $chunkTok")
    require(stride > 0 && stride <= chunkTok,
      s"stride must be in [1, chunkTok], got $stride (chunkTok=$chunkTok)")
    // EvalOnce: the `_n > 0` filter would otherwise push below the
    // CALLER's projection computing the ids column (for corpus_chunk
    // that is the BPE encode — the engine's most expensive kernel) and
    // evaluate it twice per row (r19; guide §4.4)
    df.select(col(idCol), graft.functions.EvalOnce(col(idsCol)).as("_ids"))
      .withColumn("_n", size(col("_ids")))
      .filter(col("_n") > 0)
      .select(col(idCol), col("_ids"),
        explode(sequence(lit(0), col("_n") - 1, lit(stride)))
          .as("tok_start"))
      .withColumn("chunk",
        slice(col("_ids"), col("tok_start") + 1, lit(chunkTok)))
      .select(col(idCol),
        expr(s"CAST(tok_start DIV $stride AS INT)").as("chunk_idx"),
        col("tok_start").cast("int").as("tok_start"),
        size(col("chunk")).as("n_tok"),
        element_at(col("chunk"), 1).as("first_id"),
        element_at(col("chunk"), -1).as("last_id"),
        expr("aggregate(zip_with(chunk, sequence(1, size(chunk)), " +
          "(x, i) -> CAST(x AS BIGINT) * i), CAST(0 AS BIGINT), " +
          "(acc, v) -> acc + v)").as("id_wsum"),
        col("chunk"))
  }

  /** C32: materialize the PACKED training sequences' token-ID arrays —
    * the actual tensor rows a pretraining loader feeds the model
    * (Megatron/GPT-NeoX pretokenized shards): [[sequenceSpans]] says
    * WHERE each doc's tokens land; this GATHERS them — per span,
    * `slice(ids, pos_in_doc+1, span_len)`; per sequence, spans
    * concatenate in offset order. Every sequence is exactly `budget`
    * tokens except the final one; the concatenation of all sequences
    * IS the id-order concatenation of all docs' id streams
    * (spec-pinned both ways).
    *
    * Plan shape: the span manifest is output-proportional (one
    * explode past the C11 prefix sum); the only corpus-sized join is
    * spans ⋈ id arrays on the doc id (id-keyed, never text); the slice
    * is map-side; the final `groupBy(seq_id)` holds at most `budget`
    * tokens of agg state per group (a sequence's spans sum to ≤
    * budget), so per-group memory is bounded by the TRAINING config,
    * not by document length — a 1M-token doc contributes 1-token and
    * budget-token slices to many sequences, never one giant buffer.
    *
    * Output: (seq_id, n_tokens, ids).
    *
    * `eosId`/`bosId` inject DOCUMENT-SEPARATOR tokens before the
    * layout — the convention every deployed packer follows (GPT-2/
    * NeoX append `<|endoftext|>` per doc; Llama-style loaders prepend
    * BOS), because a model trained on separator-free packing cannot
    * learn document boundaries and attention-reset masks have nothing
    * to key on. Each doc's stream becomes `[bos?] ++ ids ++ [eos?]`
    * — an EMPTY doc still emits its separators (a crawl's empty page
    * is a boundary, not a no-op) — and the separators then flow
    * through the same prefix-sum layout, so n_tokens/seq_id/offset
    * arithmetic needs no special-casing downstream. Map-side `concat`
    * on the already-pinned arrays: zero extra shuffles vs the plain
    * form. Separator ids live ABOVE the text vocab (the
    * [[graft.functions.bpe.unkId]]+1 / +2 slots the registered rows
    * use), so [[graft.functions.bpe.decodeIds]] treats them as
    * corrupt-by-design: strip specials before detokenizing, exactly
    * like a production loader.
    */
  def packTokenIds(df: DataFrame, idCol: String, idsCol: String,
                   budget: Long, numPartitions: Int = 0,
                   bosId: Option[Int] = None,
                   eosId: Option[Int] = None): DataFrame = {
    // A NULL ids array is emptiness too (a schema that nulls instead
    // of []): coalesce BEFORE concat — concat(NULL, [eos]) is NULL,
    // which would silently drop the doc's separator and contradict the
    // "an empty doc still emits its separators" contract above.
    val nn =
      if (eosId.isEmpty && bosId.isEmpty) df
      else df.withColumn(idsCol,
        coalesce(col(idsCol), array().cast(df.schema(idsCol).dataType)))
    val withEos = eosId.map(e => nn.withColumn(idsCol,
      concat(col(idsCol), array(lit(e))))).getOrElse(nn)
    val df1 = bosId.map(b => withEos.withColumn(idsCol,
      concat(array(lit(b)), col(idsCol)))).getOrElse(withEos)
    packTokenIdsPlain(df1, idCol, idsCol, budget, numPartitions)
  }

  private def packTokenIdsPlain(df: DataFrame, idCol: String,
                                idsCol: String, budget: Long,
                                numPartitions: Int): DataFrame = {
    // pin the id arrays ONCE (MEMORY_AND_DISK blocks — spills, frees
    // when the plan is GC'd): both consumers below — the span
    // manifest's size projection and the gather join — would
    // otherwise re-run whatever expression produces `idsCol`, and for
    // every registered caller that is the BPE encode kernel, the most
    // expensive per-row expression in the engine (corpus_export_ids
    // measured 10.9 -> ~7 s from this pin alone). Materializing is
    // the right trade at scale too: the pinned bytes are ~the tensor
    // output itself, vs tokenizing the corpus twice.
    val ids = df.select(col(idCol), col(idsCol).as("_ids"))
      .localCheckpoint()
    val spans = sequenceSpans(
      ids.select(col(idCol), size(col("_ids")).cast("long").as("_n")),
      idCol, "_n", budget, numPartitions)
    spans.join(ids, Seq(idCol))
      .withColumn("_slice", slice(col("_ids"),
        (col("pos_in_doc") + 1).cast("int"), col("span_len").cast("int")))
      .groupBy(col("seq_id"))
      .agg(flatten(transform(
        sort_array(collect_list(struct(col("offset"), col("_slice")))),
        s => s("_slice"))).as("ids"))
      .select(col("seq_id"), size(col("ids")).cast("long").as("n_tokens"),
        col("ids"))
  }

  /** C33: export the packed token tensors as a SHARDED pretokenized
    * dataset — the on-disk artifact a Megatron-style loader actually
    * opens: [[packTokenIds]] rows land in `shards` CONTIGUOUS
    * sequence ranges (`shard = seq_id DIV ceil(n/shards)`), one Hive
    * partition per shard, so a data-parallel rank streams ITS shard
    * sequentially in training order. Contrast with C20's doc-level
    * `exportShards`, whose shuffle-deal IMPOSES an order — here the
    * order is already the schedule's (C28/C30/C31 upstream of the
    * packing) and must be preserved, so sharding is a pure range
    * split: no shuffle beyond the write's own partitioning, no
    * re-ranking.
    *
    * Writes `outDir/shard=S/` parquet of (seq_id, n_tokens, ids) plus
    * an `_manifest` sidecar (underscore-prefixed: invisible to a
    * partition-discovering read of `outDir`) with per-shard n_seqs /
    * n_tokens / first_seq / last_seq — the numbers a loader validates
    * before training. Returns the manifest.
    */
  def exportTokenShards(packed: DataFrame, outDir: String,
                        shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    // ONE pass over the gather: pin the packed tensors in the block
    // manager (MEMORY_AND_DISK — spills, never OOMs) so the count and
    // the write both read blocks instead of re-running the span-join
    // stage above packSequences' prefix-sum checkpoint. Before this
    // pin, the count's plan pruned the ids gather agg but still
    // re-executed the corpus-sized spans-to-ids join.
    val pinned = packed.localCheckpoint()
    val n = pinned.count()
    val per = math.max(1L, (n + shards - 1) / shards)
    val withShard = pinned
      .withColumn("shard", expr(s"CAST(seq_id DIV ${per}L AS INT)"))
    withShard.write.mode("overwrite").partitionBy("shard")
      .parquet(outDir)
    val spark = packed.sparkSession
    def shardStats(df: DataFrame): DataFrame = df
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_seqs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("seq_id")).as("first_seq"),
        max(col("seq_id")).as("last_seq"))
      .orderBy("shard")
    // the manifest aggregates the WRITTEN files — an actual-artifact
    // reconciliation, not a parallel computation. Except n == 0: a
    // partitioned write of an empty frame emits no data files, so a
    // schema-inferring read-back throws — synthesize the (empty)
    // manifest from the in-memory frame, which has the same schema.
    val manifest = shardStats(
      if (n == 0) withShard else spark.read.parquet(outDir))
    manifest.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/_manifest")
    manifest
  }
}
