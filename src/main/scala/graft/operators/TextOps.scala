package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.txt

/** Text analysis (SURVEY.md §2 E-series): token/char stats, quality
  * scoring, language ID, content fingerprints. All pure per-row
  * expression work (whole-stage codegen; zero shuffles except the
  * stated aggregations), so it streams at scan speed on any corpus
  * size.
  *
  * Determinism: every formula below is written with the identical
  * operation tree as its DuckDB oracle (same division order, integer
  * scores for argmax tie-breaks), so hash-compares can't drift.
  */
object TextOps {

  private def words(text: Column): Column = split(trim(text), "\\s+")

  /** E14: doc-length distribution per group in frozen-BPE tokens —
    * exact interpolated percentiles by default (the cross-engine
    * `percentile`/`quantile_cont` pairing); `exact = false` switches
    * to `approx_percentile`, the 100-TB mode (exact per-group buffers
    * hold the group's values). See
    * [[graft.queries.Pipeline.corpusLengthStats]].
    */
  def lengthStats(docs: DataFrame, groupCol: String, textCol: String,
                  merges: Seq[(String, String)],
                  exact: Boolean = true): DataFrame = {
    val pct: Double => Column =
      if (exact) p => expr(s"percentile(_nt, $p)")
      else p => expr(s"approx_percentile(_nt, $p, 10000)").cast("double")
    docs.select(col(groupCol),
        graft.functions.bpe.tokenCount(col(textCol), merges).as("_nt"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum("_nt").as("n_tokens"),
        min("_nt").as("min_tokens"),
        round(pct(0.25), 6).as("p25"),
        round(pct(0.5), 6).as("p50"),
        round(pct(0.75), 6).as("p75"),
        round(pct(0.95), 6).as("p95"),
        max("_nt").as("max_tokens"))
  }

  /** E13: tokenizer fertility per group (usually language) — doc /
    * char / word / BPE-token totals with chars-per-token and
    * tokens-per-word under the given frozen merge list. One
    * |groups|-sized partial agg; the count kernel is the same codegen
    * expression the packing family runs. See
    * [[graft.queries.Pipeline.corpusTokenizerStats]] for the
    * registered row and rationale.
    */
  def tokenizerStats(docs: DataFrame, groupCol: String, textCol: String,
                     merges: Seq[(String, String)]): DataFrame =
    docs.select(col(groupCol),
        length(col(textCol)).cast("long").as("_nc"),
        size(words(col(textCol))).cast("long").as("_nw"),
        graft.functions.bpe.tokenCount(col(textCol), merges).as("_nt"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum("_nc").as("n_chars"),
        sum("_nw").as("n_words"),
        sum("_nt").as("n_tokens"))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") / col("n_tokens"), 6))
      .withColumn("tokens_per_word",
        round(col("n_tokens").cast("double") / col("n_words"), 6))

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single other
    * non-space chars — the standard byte-pair pre-split shape.
    */
  val BpeTokenRe = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  /** E1: per-doc token/char-class statistics — ONE fused zero-
    * allocation kernel pass ([[graft.functions.txt.charClassStats]])
    * instead of the split + three `regexp_extract_all` expression
    * chain it replaced, which allocated a string per match and went
    * allocation-bound at scale (t100 44.7 s → 0.84 s, ratio100 55 →
    * 2.2; semantics identical, spec-pinned against the regex chain).
    */
  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("_cs", txt.charClassStats(t))
      .select(
        col(idCol),
        element_at(col("_cs"), 1).as("n_tokens"),
        element_at(col("_cs"), 2).as("n_bpe_tokens"),
        length(t).cast("long").as("n_chars"),
        element_at(col("_cs"), 3).as("n_punct"),
        element_at(col("_cs"), 4).as("n_digits"),
        element_at(col("_cs"), 5).as("n_spaces"))
  }

  /** Small English stopword set used by quality scoring (shared with
    * the oracle SQL verbatim).
    */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")

  /** (diversity, stop_ratio, punct_ratio, rounded quality) component
    * expressions — one pass over the token array, usable inline.
    */
  private def qualityParts(t: Column): (Column, Column, Column, Column) = {
    val ws = words(t)
    val nTok = size(ws).cast("double")
    val lenScore = when(length(t).between(100, 2000), lit(1.0))
      .otherwise(lit(0.5))
    val diversity = size(array_distinct(ws)).cast("double") / nTok
    val stopRatio =
      size(filter(ws, w => w.isin(Stopwords: _*))).cast("double") / nTok
    val stopScore = least(stopRatio * 4, lit(1.0))
    // native one-pass codepoint counter; identical semantics to
    // size(regexp_extract_all(t, "[^a-zA-Z0-9\\s]", 0)), which was 17
    // of corpus_curate's 19 s at bench 100x (one string alloc per match)
    val punctRatio =
      graft.functions.txt.punctCount(t).cast("double") /
        length(t).cast("double")
    val punctScore = greatest(lit(1.0) - punctRatio * 10, lit(0.0))
    (diversity, stopRatio, punctRatio,
      round(lenScore * 0.25 + diversity * 0.25 + stopScore * 0.25 +
        punctScore * 0.25, 6))
  }

  /** The composite quality score as a single inline Column — lets
    * filters fuse scoring into a scan with no intermediate DataFrame
    * (used by the corpus-curation pipeline).
    */
  def qualityScore(t: Column): Column = qualityParts(t)._4

  /** E2: heuristic quality score in [0,1]:
    * 0.25·length-in-range + 0.25·lexical-diversity + 0.25·stopword
    * presence + 0.25·(1 − punctuation excess). Components exposed for
    * inspection/filtering.
    */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (diversity, stopRatio, punctRatio, q) = qualityParts(col(textCol))
    docs.select(
      col(idCol),
      round(diversity, 6).as("diversity"),
      round(stopRatio, 6).as("stop_ratio"),
      round(punctRatio, 6).as("punct_ratio"),
      q.as("quality"))
  }

  /** Marker stopwords per language (tiny, public, deterministic). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist"),
    "en" -> Seq("the", "a", "and", "of", "is", "to"),
    "es" -> Seq("el", "los", "las", "que", "y", "es"),
    "fr" -> Seq("le", "les", "une", "et", "est", "dans"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有"))

  /** E3: n-gram/stopword-hit language ID. Integer hit counts (no float
    * compare); argmax with a fixed priority order on ties; zero hits →
    * "unknown". Compared against the labeled `lang` column.
    */
  def langId(docs: DataFrame, idCol: String, textCol: String,
             labelCol: String): DataFrame = {
    val ws = words(col(textCol))
    val hits = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(ws, w => w.isin(markers: _*)))
    }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    // first lang (in LangMarkers order) reaching the max hit count
    val pred = hits.reverse.foldLeft(lit("unknown")) {
      case (acc, (lang, h)) => when(h === best && best > 0, lit(lang)).otherwise(acc)
    }
    docs.select(
      col(idCol), col(labelCol).as("lang"),
      pred.as("pred_lang"),
      (pred === col(labelCol)).as("is_match"),
      hits.map(_._2).reduce(_ + _).cast("long").as("n_marker_hits"))
  }

  /** E4: content fingerprint + per-source duplicate statistics. */
  def fingerprintStats(docs: DataFrame, idCol: String, textCol: String,
                       sourceCol: String): DataFrame =
    docs
      .select(col(sourceCol), md5(col(textCol)).as("fp"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_distinct"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_dup_docs"))

  /** E6: top TF-IDF terms per source. All-expression: explode → two
    * keyed aggs (term frequency per source, document frequency per
    * term) → broadcast-joined idf → per-source window top-k. The only
    * wide rows are the per-(source, word) counts — never the raw text.
    */
  def topTermsPerSource(docs: DataFrame, sourceCol: String, textCol: String,
                        k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = docs.select(col(sourceCol).as("source"),
      explode(words(col(textCol))).as("word"))
    val tf = w.groupBy("source", "word").agg(count(lit(1)).as("tf"))
    val dfx = tf.groupBy("word").agg(countDistinct(col("source")).as("df"))
    val n = docs.agg(countDistinct(col(sourceCol)).as("ns"))
    val win = Window.partitionBy(col("source"))
      .orderBy(col("tfidf").desc, col("word"))
    tf.join(broadcast(dfx), "word")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf") * (log((col("ns") + lit(1)) / (col("df") + lit(1.0))) + lit(1.0)))
      .withColumn("rnk", row_number().over(win).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("source"), col("rnk"), col("word"), col("tf"), col("df"),
        round(col("tfidf"), 6).as("tfidf"))
  }

  /** E5: 64-bit polynomial rolling-hash fingerprints (whole-content +
    * winnowing window-min) via the codegen'd [[graft.functions.txt]]
    * expressions.
    */
  def rollingFingerprints(docs: DataFrame, idCol: String, textCol: String,
                          window: Int = 16): DataFrame =
    docs.select(
      col(idCol),
      txt.rollingFp(col(textCol)).as("fp64"),
      txt.rollingWindowMin(col(textCol), window).as("winnow_fp64"))

  /** E7: repetition signals — the classic corpus-quality repetition
    * filters (Gopher-style "repetition removal" rules, re-expressed for
    * the single-line documents table): per doc, the fraction of tokens
    * taken by the most frequent token, the fraction of adjacent pairs
    * taken by the most frequent bigram, and the longest run of identical
    * consecutive tokens. Heavily repeated boilerplate scores high on all
    * three; natural text stays low.
    *
    * Shape: ONE posexplode, then three reductions over the exploded
    * frame — (doc, token) counts, (doc, bigram) counts via a window
    * `lead`, and run lengths via a window `lag`-break + running-sum run
    * id — joined back on the doc id. Everything is keyed per doc
    * (partial-agg groupBys and per-doc sort windows), so the operator
    * scales with by-doc parallelism and never holds a document's tokens
    * in one buffer outside its own window partition.
    */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol),
      posexplode(words(col(textCol))).as(Seq("pos", "word")))
    val n = toks.groupBy(idCol).agg(count(lit(1)).as("n_tokens"))
    val topTok = toks.groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(max(col("c")).as("top_tok"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val lagWord = lag(col("word"), 1).over(w)
    val maxRun = toks
      .withColumn("brk",
        when(lagWord.isNull || lagWord =!= col("word"), 1).otherwise(0))
      .withColumn("run_id", sum(col("brk")).over(w))
      .groupBy(col(idCol), col("run_id")).agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(max(col("c")).as("max_run"))
    val topBi = toks
      .withColumn("nxt", lead(col("word"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col(idCol), concat(col("word"), lit(" "), col("nxt")).as("bigram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(max(col("c")).as("top_bi"))
    n.join(topTok, idCol).join(maxRun, idCol)
      .join(topBi, Seq(idCol), "left") // a 1-token doc has no bigrams
      .select(col(idCol),
        col("n_tokens"),
        round(col("top_tok").cast("double") / col("n_tokens"), 6)
          .as("top_token_frac"),
        round(when(col("n_tokens") > 1,
            coalesce(col("top_bi"), lit(0L)).cast("double") /
              (col("n_tokens") - lit(1)))
          .otherwise(lit(0.0)), 6).as("top_bigram_frac"),
        col("max_run"))
  }

  /** PII patterns, shared verbatim with the oracle SQL — the naive
    * regex-class detectors of a C4/Dolma-style curation pass: emails,
    * dotted-quad IPv4s, separator-delimited phone numbers. Kept to
    * syntax with identical semantics under Java regex (Spark) and RE2
    * (DuckDB): no backreferences, no lookaround, no alternation.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhoneRe = "\\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}"

  /** E8: PII detection + redaction. Per doc: counts per class and the
    * redacted text. Redaction runs email → IP → phone, each class
    * counted on the text state it redacts; the replacement tokens
    * carry no digits or '@', so a later pass can never re-match inside
    * an earlier one's output (order-stable counts). Pure per-row
    * codegen expression work — scan-speed on any corpus.
    */
  def piiScan(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Re, "<IP>")
    val t3 = regexp_replace(t2, PhoneRe, "<PHONE>")
    docs.select(
      col(idCol),
      regexp_count(t0, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t1, lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(t2, lit(PhoneRe)).cast("long").as("n_phones"),
      t3.as("clean_text"))
  }

  /** E9: model-based quality filter in the CCNet/DCLM fastText-filter
    * shape — train a hashed-vocabulary linear classifier on weak
    * labels, then score the whole corpus at scan speed. The weak label
    * is E2's heuristic quality score thresholded at `threshold`; each
    * distinct token hash (the C3-C5 FNV-1a+fmix64 kernel at k=1) maps
    * to one of `buckets` feature buckets (hashing trick — the weight
    * table stays `buckets`·8 bytes no matter the vocabulary); a
    * bucket's weight is its positive rate on an integer grid,
    * `(2·pos+1)·2¹⁹ div (pos+neg+1)` (α=½ smoothing, untrained buckets
    * land exactly on the neutral 2¹⁹), and a doc's score is the
    * centered sum over its distinct token hashes — positive means
    * good-doc-like vocabulary.
    *
    * Plan shape: ONE corpus pass for training (explode distinct token
    * hashes → partial-agg groupBy on ≤`buckets` keys, combine absorbs
    * everything map-side) + a ≤`buckets`-row driver collect, then ONE
    * scoring pass — the weight table rides into generated code as a
    * reference object, so scoring is a pure map fused into the scan
    * (zero shuffles). All-long arithmetic end to end: bit-exact under
    * any partitioning and replayable in SQL (no Math.log / float sums).
    * At 100 TB the training pass runs on a deterministic id-mod sample
    * (the D4b k-means posture) — weights are corpus statistics, not
    * per-doc state: the effective modulus is
    * `em = max(trainMod, ceil(count / maxTrain))` when `maxTrain > 0`
    * (one parquet-metadata-cheap count caps the sample SIZE however
    * large the corpus grows), else `trainMod` alone (no count action).
    * Only docs with `id % em == 0` feed the weight table; SCORING still
    * covers every doc. `em` is replayable in SQL exactly like the
    * k-means `tm` CTE. The defaults (trainMod = 1, maxTrain = 0) train
    * on the full corpus with an unchanged plan.
    */
  def classify(docs: DataFrame, idCol: String, textCol: String,
               buckets: Int = 4096, threshold: Double = 0.65,
               trainMod: Int = 1, maxTrain: Long = 0L): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two")
    require(trainMod >= 1, s"trainMod must be >= 1, got $trainMod")
    require(maxTrain >= 0L, s"maxTrain must be >= 0, got $maxTrain")
    val mask = (buckets - 1).toLong
    val labeled = docs.select(col(idCol),
      txt.wordShingleHashes(col(textCol), 1).as("hs"),
      (qualityScore(col(textCol)) >= threshold).as("weak_label"))
    val em: Long =
      if (maxTrain > 0L)
        math.max(trainMod.toLong, (docs.count() + maxTrain - 1) / maxTrain)
      else trainMod.toLong
    val train =
      if (em > 1L)
        labeled.filter(pmod(col(idCol).cast("long"), lit(em)) === 0)
      else labeled
    val counts = train
      .select(col("weak_label"), explode(col("hs")).as("h"))
      .groupBy((col("h").bitwiseAND(lit(mask))).cast("int").as("b"))
      .agg(sum(when(col("weak_label"), 1L).otherwise(0L)).as("pos_cnt"),
        sum(when(!col("weak_label"), 1L).otherwise(0L)).as("neg_cnt"))
      .select(col("b"),
        expr("(pos_cnt * 2 + 1) * 524288 div (pos_cnt + neg_cnt + 1)")
          .as("wq"))
    val wq = Array.fill(buckets)(graft.functions.TextHashes.LinearScoreCenter)
    counts.collect().foreach(r => wq(r.getInt(0)) = r.getLong(1))
    labeled.select(col(idCol),
      txt.hashedLinearScore(col("hs"), wq).as("score_q"),
      size(col("hs")).cast("long").as("n_feat"),
      col("weak_label"))
      .select(col(idCol), col("score_q"), (col("score_q") > 0).as("pred"),
        col("n_feat"), col("weak_label"))
  }

  /** E10: bigram-LM fluency score — the CCNet/Gopher "LM perplexity
    * filter" shape (score every doc by a language model trained on a
    * trusted reference corpus; low likelihood = gibberish/boilerplate)
    * re-expressed on an exact integer grid so it is bit-identical under
    * any partitioning AND SQL-replayable (a float log-prob sum is
    * neither). The model is a hashed add-one-smoothed bigram table:
    * per bigram position `i` with bigram bucket `b` and first-word
    * unigram bucket `u` (positional k=1/k=2 shingle kernels —
    * [[graft.functions.TextHashes.wordShingleSeq]], duplicates
    * RETAINED: an LM weighs every occurrence),
    *
    *   q_i = ((cBig(b) + 1) · 2²⁰) div (cUni(u) + uniBuckets)
    *
    * — the quantized smoothed conditional `P(w_{i+1} | w_i)`. A doc's
    * `lm_sum` is Σ q_i and `lm_score` the per-bigram mean; higher =
    * more reference-like word transitions. `refFilter` selects the
    * trusted slice (a real pipeline points it at its wiki-grade
    * corpus; the query uses the labeled `lang = 'en'` slice).
    *
    * Plan shape: TWO training passes over the (filtered, column-pruned)
    * reference slice — explode positional hashes → partial-agg groupBy
    * on ≤`bigBuckets` keys (hot stopword buckets absorb map-side) — a
    * ≤65536-row driver collect each, then scoring as ONE pure map with
    * both count tables as plan literals (`element_at` on a constant
    * array inside whole-stage codegen; zero shuffles, zero joins).
    * The numerator guard keeps `(max bucket count + 1) · 2²⁰` inside a
    * long: a bucket would need ≥2⁴³ occurrences to trip it — a 100 TB
    * corpus's hottest stopword bucket sits orders below; the loud
    * require beats silent wraparound.
    */
  /** One hashed-gram training pass (E10/C24 shared): counts of k-word
    * positional shingle hashes folded into `buckets` power-of-two
    * buckets over the `refFilter` slice of `docs` — a partial-agg
    * groupBy on ≤`buckets` keys (hot stopword buckets absorb
    * map-side), then a ≤`buckets`-row collect.
    */
  private def gramBucketCounts(docs: DataFrame, textCol: String,
                               refFilter: Column, k: Int,
                               buckets: Int): Array[Long] = {
    val arr = new Array[Long](buckets)
    docs.filter(refFilter)
      .select(explode(txt.wordShingleSeq(col(textCol), k)).as("h"))
      .groupBy(col("h").bitwiseAND(lit((buckets - 1).toLong))
        .cast("int").as("b"))
      .agg(count(lit(1)).as("c"))
      .collect().foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  def lmScore(docs: DataFrame, idCol: String, textCol: String,
              refFilter: Column, uniBuckets: Int = 4096,
              bigBuckets: Int = 65536): DataFrame = {
    require(uniBuckets > 0 && (uniBuckets & (uniBuckets - 1)) == 0 &&
      bigBuckets > 0 && (bigBuckets & (bigBuckets - 1)) == 0,
      "bucket counts must be powers of two")
    def bucketCounts(k: Int, buckets: Int): Array[Long] =
      gramBucketCounts(docs, textCol, refFilter, k, buckets)
    val cu = bucketCounts(1, uniBuckets)
    val cb = bucketCounts(2, bigBuckets)
    require(cb.max <= (Long.MaxValue >> 20) - 1,
      "bigram bucket count overflows the 2^20 integer grid")
    val base = docs.select(col(idCol),
        txt.wordShingleSeq(col(textCol), 1).as("u"),
        txt.wordShingleSeq(col(textCol), 2).as("bg"))
      .withColumn("_cu", typedLit(cu.toSeq))
      .withColumn("_cb", typedLit(cb.toSeq))
    // bigram j's first word is word j: slice(u, 1, size(bg)) aligns the
    // unigram sequence with the bigram sequence position-by-position
    val qs = expr(
      s"zip_with(bg, slice(u, 1, size(bg)), (bh, uh) -> " +
        s"((element_at(_cb, cast(bh & ${bigBuckets - 1} as int) + 1) + 1) " +
        s"* 1048576) DIV " +
        s"(element_at(_cu, cast(uh & ${uniBuckets - 1} as int) + 1) " +
        s"+ $uniBuckets))")
    base.withColumn("qs", qs)
      .select(col(idCol),
        size(col("bg")).cast("long").as("n_bigrams"),
        expr("aggregate(qs, 0L, (acc, x) -> acc + x)").as("lm_sum"))
      .withColumn("lm_score",
        when(col("n_bigrams") === 0, lit(null).cast("long"))
          .otherwise(expr("lm_sum DIV n_bigrams")))
  }

  /** The quantized-entropy LUT — canonical copy lives with the fused
    * kernel ([[graft.functions.TextHashes.EntropyLut]]); re-exported
    * here for the oracle-SQL literal and API stability.
    */
  val EntropyLut: Array[Long] = graft.functions.TextHashes.EntropyLut

  /** E11: per-doc Shannon character entropy on a quantized integer
    * grid — the classic gibberish/low-diversity quality signal (low
    * entropy = repeated chars / boilerplate, high = diverse text;
    * compression-ratio proxies rank the same way).
    *
    * Alphabet: ASCII alphanumerics, case-folded byte-wise — casing and
    * punctuation styling don't move the score, and non-ASCII
    * codepoints are never counted (the oracle extracts `[A-Za-z0-9]`
    * and folds per char, so both engines agree on EVERY input, not
    * just ASCII corpora). For each doc with n counted chars and
    * per-char counts c:
    * `ent_scaled = (Σ_char c · L(max(1, c·1024 DIV n))) DIV n`, with
    * L = [[EntropyLut]] — ≈ H · 2²⁰ bits. All arithmetic after the LUT
    * is integer, so the result is partitioning-independent.
    *
    * Scale: zero shuffles, and the whole computation is ONE fused
    * codegen kernel call per row
    * ([[graft.functions.txt.charEntropyStats]] — a single O(bytes)
    * pass over a 36-slot count table; the earlier higher-order
    * `array_distinct`+`filter` composition was O(n·36) with two array
    * allocations per row and benched 14× at 100× data; the kernel
    * halves that).
    */
  def entropy(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("_e", txt.charEntropyStats(col(textCol)))
      .select(
        col(idCol),
        element_at(col("_e"), 1).as("n_alnum"),
        element_at(col("_e"), 2).as("n_distinct"),
        element_at(col("_e"), 3).as("ent_scaled"))
      .withColumn("ent_bits", round(col("ent_scaled") / lit(1048576.0), 6))

  /** C24: DSIR-style importance selection (data selection via
    * importance resampling): every doc is scored by which of TWO hashed
    * bigram LMs — target (`targetFilter`, the distribution you want
    * more of: wiki-grade text) vs source (`sourceFilter`, the raw
    * pool; default everything) — makes each of its bigrams more
    * likely, and survives on a majority.
    *
    * Per bigram with bucket counts cT/cS and table totals totT/totS,
    * the DSIR log-ratio's SIGN is exact in integers:
    * `sign(p_t − p_s) = sign((cT+1)·(totS+B) − (cS+1)·(totT+B))`
    * (add-one smoothing, B = bigBuckets) — cross-multiplied so no
    * division, no log, no float: DECIMAL(38) / HUGEINT products hold
    * to ~10³⁷ (a 100 TB corpus' totals are ~10¹³). A doc's
    * `dsir_vote` = Σ signs and `selected = dsir_vote > 0` — the
    * sign-vote (median-of-evidence) variant of the importance weight:
    * scale-free, so it cannot be swamped by the corpora's size
    * difference the way a raw count or probability grid can.
    *
    * Plan shape: TWO bounded training passes ([[gramBucketCounts]],
    * bigram tables for target and source — each a partial-agg groupBy
    * on ≤`bigBuckets` keys + a ≤65536-row collect; totals are Scala
    * constants after that), then scoring is ONE pure map with both
    * count tables as plan literals — zero shuffles, zero joins,
    * scan-speed on any corpus. Docs without bigrams get a null vote
    * and `selected = false`.
    */
  def dsir(docs: DataFrame, idCol: String, textCol: String,
           targetFilter: Column, sourceFilter: Column = lit(true),
           bigBuckets: Int = 65536): DataFrame = {
    require(bigBuckets > 0 && (bigBuckets & (bigBuckets - 1)) == 0,
      "bucket count must be a power of two")
    val cbT = gramBucketCounts(docs, textCol, targetFilter, 2, bigBuckets)
    val cbS = gramBucketCounts(docs, textCol, sourceFilter, 2, bigBuckets)
    val totT = cbT.sum + bigBuckets
    val totS = cbS.sum + bigBuckets
    val base = docs.select(col(idCol),
        txt.wordShingleSeq(col(textCol), 2).as("bg"))
      .withColumn("_cbt", typedLit(cbT.toSeq))
      .withColumn("_cbs", typedLit(cbS.toSeq))
    // per-gram sign of the smoothed probability difference, exact via
    // cross-multiplication in DECIMAL(38)
    val votes = expr(
      s"transform(bg, bh -> CAST(SIGN(" +
        s"CAST(element_at(_cbt, cast(bh & ${bigBuckets - 1} as int) + 1) " +
        s"+ 1 AS DECIMAL(38,0)) * CAST($totS AS DECIMAL(38,0)) - " +
        s"CAST(element_at(_cbs, cast(bh & ${bigBuckets - 1} as int) + 1) " +
        s"+ 1 AS DECIMAL(38,0)) * CAST($totT AS DECIMAL(38,0))" +
        s") AS LONG))")
    base.withColumn("v", votes)
      .select(col(idCol),
        size(col("bg")).cast("long").as("n_bigrams"),
        expr("aggregate(v, 0L, (acc, x) -> acc + x)").as("_sv"))
      .withColumn("dsir_vote",
        when(col("n_bigrams") === 0, lit(null).cast("long"))
          .otherwise(col("_sv")))
      .withColumn("selected", coalesce(col("dsir_vote") > 0, lit(false)))
      .drop("_sv")
  }
}
