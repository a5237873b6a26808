package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.bpe

/** Distributed exact BPE tokenizer training + encoding (SURVEY E12) —
  * the byte-pair-encoding loop every modern LLM tokenizer is built
  * with (merge the most frequent adjacent symbol pair, repeat),
  * re-expressed Spark-first.
  *
  * Scale posture (the textbook trick, distributed): training runs on
  * the WORD-FREQUENCY TABLE, not the corpus — one corpus-wide
  * `groupBy(word)` pass builds `(word, freq)` (persisted,
  * O(distinct words) ≪ corpus at any scale; Zipf caps it in the
  * millions at 100 TB), and every merge iteration is then one bounded
  * pass over that table: a codegen kernel emits each word's
  * adjacent-symbol pairs under the current merges, a partial-agg
  * `groupBy(pair)` sums frequencies, and ONE row (the argmax) comes
  * back to the driver. N merges = N bounded passes — the Lloyd-chain
  * shape the trained-PQ family uses, applied to tokenization.
  *
  * Determinism: pair counts are exact integer sums (partial-agg safe);
  * the winner is argmax by (count DESC, pair key ASC) — Spark's
  * binary UTF8 string order — so the merge list is a pure function of
  * the corpus under any partitioning (spec pins equality with a
  * driver-side reference trainer).
  */
object Bpe {

  /** Train `nMerges` ordered merges on the corpus' whitespace words.
    * Stops early if no pair repeats. Returns (left, right) symbol
    * pairs in merge order.
    *
    * Iteration m re-segments each vocab word under all m−1 earlier
    * merges inside the fused kernel — O(N²·vocab) symbol work in
    * total. The "incremental" alternative (persist the segmented
    * vocab, apply only the newest merge per iteration) was built and
    * MEASURED SLOWER at these merge counts: its per-iteration
    * materialization (persist + count + growing plan) costs more than
    * the kernel's re-segmentation, which is trivial while N ≤ a few
    * hundred and the vocab is Zipf-bounded. Revisit only for
    * vocab-scale tokenizers (tens of thousands of merges), where the
    * quadratic term wins.
    */
  def train(docs: DataFrame, textCol: String,
            nMerges: Int = 32): Seq[(String, String)] = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    val vocab = docs
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 1)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var merges = Vector.empty[(String, String)]
      var done = false
      while (merges.length < nMerges && !done) {
        val top = vocab
          .select(explode(bpe.adjacentPairs(col("w"), merges)).as("p"),
            col("freq"))
          .groupBy("p").agg(sum(col("freq")).as("cnt"))
          .filter(col("cnt") >= 2) // a pair seen once gains nothing
          .orderBy(col("cnt").desc, col("p"))
          .limit(1).collect()
        if (top.isEmpty) done = true
        else {
          val key = top.head.getString(0)
          val sep = key.indexOf(' ')
          merges :+= ((key.substring(0, sep), key.substring(sep + 1)))
        }
      }
      merges
    } finally vocab.unpersist(blocking = false)
  }

  /** Per-doc token statistics under a trained merge list: char count,
    * BPE token count (one fused kernel call per doc — zero shuffles),
    * and the chars-per-token compression ratio (null for empty docs).
    */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String,
                 merges: Seq[(String, String)]): DataFrame =
    docs.select(col(idCol),
        length(col(textCol)).cast("long").as("n_chars"),
        bpe.tokenCount(col(textCol), merges).as("n_bpe"))
      .withColumn("compression",
        when(col("n_bpe") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_chars") / col("n_bpe"), 6)))
}
