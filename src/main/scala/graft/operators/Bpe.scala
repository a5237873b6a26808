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
  * `groupBy(word)` pass builds `(word, freq)` (O(distinct words) ≪
  * corpus at any scale; Zipf caps it in the millions at 100 TB, and
  * `maxVocab` hard-caps it), and the merge loop then runs over that
  * bounded table with incremental pair-count maintenance: per merge,
  * only words containing the winning pair are re-segmented and their
  * count deltas applied — cost independent of merges already learned,
  * so real 32k–100k-merge vocabularies train linearly (see
  * [[train]]).
  *
  * Determinism: pair counts are exact integer sums (partial-agg safe);
  * the winner is argmax by (count DESC, pair key ASC) — Spark's
  * binary UTF8 string order — so the merge list is a pure function of
  * the corpus under any partitioning (spec pins equality with a
  * driver-side reference trainer).
  */
object Bpe {

  /** THE whitespace-faithful, CATEGORY-AWARE pretokenizer pattern —
    * the tiktoken-style segmentation a deployed byte-level tokenizer
    * family uses, under this engine's space-prefix fold:
    *
    *   - `'(s|t|re|ve|m|ll|d)` — the GPT-2 contraction suffixes split
    *     off first (`don't` → `don` + `'t`), lowercase-only like the
    *     original (`DON'T` → `DON`+`'`+`T`, the known GPT-2 quirk);
    *   - `\s*\p{L}+` / `\s*\p{N}+` / `\s*[^\s\p{L}\p{N}]+` — a
    *     whitespace run folds into the FOLLOWING letter, digit, or
    *     punctuation run, and merges can no longer cross a word/
    *     punctuation boundary (`end. Next` → `end`+`.`+` Next`, where
    *     the old `\s*\S+` form glued `end.` into one pretoken);
    *   - `\s+` — a trailing run with no following word stands alone.
    *
    * Matches concatenate back to the EXACT source (every character is
    * consumed by exactly one alternative), so decode∘encode stays
    * byte-identical. ONE constant shared by the trainer's Spark plan
    * (Java regex), the DuckDB oracle replays (RE2 — identical output
    * on the shared fixture battery; `\s` differs only on U+000B,
    * absent from the corpora; leftmost-first alternation preference in
    * both engines), and — semantics-pinned by spec against the
    * compiled pattern — the hand scanner
    * [[graft.functions.BpeKernel.foreachPretoken]] the encode kernels
    * use.
    */
  val PretokenRegex: String =
    "'(?:s|t|re|ve|m|ll|d)|\\s*\\p{L}+|\\s*\\p{N}+|\\s*[^\\s\\p{L}\\p{N}]+|\\s+"

  /** The GPT-2-EXACT whitespace variant (opt-in `gpt2Ws = true`
    * across the tokenizer surface; [[PretokenRegex]]'s whole-run fold
    * stays the default): at most ONE literal space folds into the
    * following run (` ?<run>` — a space, not any whitespace), and
    * `\s+(?!\S)` claims a whitespace run up to but NOT including its
    * last character when a word follows — the published GPT-2 /
    * tiktoken pattern, so token counts on multi-space and indented
    * text match a deployed tokenizer exactly (`"a   b"` →
    * `a` + `␣␣` + `␣b`, where the default fold gives `a` + `␣␣␣b`).
    * Both patterns partition every string, so `decode∘encode` stays
    * byte-exact in either mode. Java-regex only (RE2 has no
    * lookahead); the DuckDB oracle replays it lookahead-FREE as a
    * two-pass rewrite — insert a boundary between the last two
    * whitespace chars of every >=2-run that precedes a word
    * (`regexp_replace(text, '(\s)(\s\S)', '\1'||chr(31)||'\2', 'g')`),
    * split on the boundary, then extract with
    * [[Gpt2WsSegmentRegex]] per segment — spec-pinned equal to this
    * pattern on the fixture battery.
    */
  val Gpt2WsPretokenRegex: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+"

  /** The lookahead-free per-SEGMENT pattern of [[Gpt2WsPretokenRegex]]'s
    * two-pass oracle rewrite: after the boundary insertion, no segment
    * contains a >=2 whitespace run followed by a word, so plain `\s+`
    * (last alternative) is exactly the lookahead's residue. RE2-safe.
    */
  val Gpt2WsSegmentRegex: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** A FROZEN 48-merge tokenizer artifact — [[train]]'s deterministic
    * output on the sf0.01 documents table, embedded as a constant
    * (regenerate with `runMain graft.tools.BpeFreeze`). Symbols are
    * byte-level 2-char-hex over WHITESPACE-FAITHFUL pretokens, so
    * space-prefixed merges appear exactly as in a deployed GPT-2
    * tokenizer (e.g. ("20","73") merges " s" — the space folds into
    * the word). Encoding always runs under a frozen tokenizer in
    * production (the tokenizer.json posture: train once, freeze,
    * encode everywhere); freezing also makes the encode path exactly
    * SQL-replayable, because the merge list is a plan constant in
    * BOTH engines (the text_bpe_encode oracle replays these merges
    * with a recursive-CTE segmentation over `hex(encode(w))` byte
    * pairs).
    */
  val frozenMerges: Vector[(String, String)] = Vector(
    ("20", "73"), ("65", "72"), ("69", "6E"), ("6F", "77"),
    ("6F", "72"), ("6D", "6572"), ("61", "74"), ("6C", "75"),
    ("20", "63"), ("61", "73"), ("20", "62"), ("20", "76"),
    ("61", "72"), ("70", "6172"), ("20", "66"), ("20", "61"),
    ("20", "74"), ("6A", "6F"), ("6A6F", "696E"), ("6173", "68"),
    ("68", "617368"), ("20", "6A6F696E"), ("73", "74"), ("72", "6F77"),
    ("6174", "63"), ("617463", "68"), ("61", "6E"), ("63", "616E"),
    ("6C75", "6D"), ("6C756D", "6E"), ("6F", "6C756D6E"), ("6F", "6D6572"),
    ("7374", "6F6D6572"), ("75", "73746F6D6572"), ("69", "6C"), ("696C", "74"),
    ("696C74", "6572"), ("20", "68617368"), ("61", "6C"), ("616C", "6C"),
    ("6D", "616C6C"), ("20", "726F77"), ("2073", "63616E"), ("20", "64"),
    ("2073", "6D616C6C"), ("67", "65"), ("6C", "6F77"), ("6D6572", "6765"))

  /** Train `nMerges` ordered merges on the corpus' whitespace-faithful
    * pretokens ([[PretokenRegex]] — separators fold into the following
    * word). Stops early if no pair repeats. Returns (left, right)
    * symbol pairs in merge order.
    *
    * Architecture (the production-tokenizer shape — HF tokenizers,
    * SentencePiece, and the original GPT-2 trainer all work this way):
    * the CORPUS-scale work is one distributed pass — `groupBy(word)`
    * word counts, partial-agg combined, capped at `maxVocab` rows by
    * (freq DESC, word ASC) — and the merge loop then runs over that
    * bounded word-frequency table on the driver with INCREMENTAL
    * pair-count maintenance: after picking merge (a,b), only the words
    * whose symbol stream actually contains (a,b) are re-segmented
    * (tracked by a pair→words index), their pair-count deltas applied,
    * and the argmax served by a lazily-invalidated max-heap. Per-merge
    * cost is O(words containing the pair · word length) — INDEPENDENT
    * of how many merges were already learned — so 32k–100k-merge
    * tokenizer runs are linear, not quadratic ([[trainIncremental]]).
    *
    * Why the loop is not N Spark jobs: a vocab-scale run is tens of
    * thousands of inherently sequential iterations, each touching a
    * Zipf-bounded table (~10⁷ distinct words ≈ low-hundreds of MB at
    * 100 TB corpus scale, and `maxVocab` hard-caps it) — per-iteration
    * job overhead would dominate by orders of magnitude. The capped
    * collect is the same bounded-driver-endgame posture as the
    * union-find endgame (GraphOps) and the k-means codebooks (Knn):
    * corpus-sized work stays distributed, the provably-small state
    * crosses to the driver once. The cap itself is the standard
    * min-frequency truncation every real trainer applies — Zipf mass
    * makes the dropped tail irrelevant to merge ranks (and at the test
    * scales the vocab is far below the cap, so the result is exactly
    * the uncapped one — parity-spec-pinned against an independent
    * reference trainer).
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int = 32,
            maxVocab: Int = 1 << 21,
            gpt2Ws: Boolean = false): Seq[(String, String)] = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    require(maxVocab > 0, s"maxVocab must be positive, got $maxVocab")
    val vocab = docs
      // whitespace-faithful pretokens ([[PretokenRegex]]): separators
      // fold into the following word, so " the" and "the" train as
      // distinct vocab entries — the GPT-2 convention. gpt2Ws swaps
      // in [[Gpt2WsPretokenRegex]] (single-space fold — Spark compiles
      // Java regex, so the lookahead runs natively here)
      .select(explode(regexp_extract_all(col(textCol),
        lit(if (gpt2Ws) Gpt2WsPretokenRegex else PretokenRegex),
        lit(0))).as("w"))
      // byte-level: a pretoken is trainable iff it has >= 2 base
      // symbols, i.e. >= 2 UTF-8 BYTES — a single non-ASCII char
      // qualifies
      .filter(octet_length(col("w")) > 1)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w"))
      .limit(maxVocab)
      .collect()
    trainIncremental(vocab.map(_.getString(0)),
      vocab.map(_.getLong(1)), nMerges)
  }

  /** One heap entry: a pair's count at push time (stale entries are
    * discarded at poll by comparing against the live count). Key bytes
    * are cached so the tie-break comparison never re-encodes.
    */
  private final case class PairEntry(count: Long, key: String,
                                     bytes: Array[Byte])

  /** The in-memory incremental BPE merge loop over a word-frequency
    * table. Semantics are EXACTLY the classic distributed recount
    * (overlap-included pair counting, left-to-right non-overlapping
    * merge application, a pair needs count ≥ 2, argmax tie-break by
    * (count DESC, "a b" key ASC in unsigned UTF-8 byte order — the
    * same order Spark's binary string sort gives)); only the cost
    * model changes: per merge, only words containing the winning pair
    * are re-segmented and their count deltas applied.
    *
    * A merged pair's count drains to zero through its own deltas; a
    * pair key can legitimately REAPPEAR later (two merge paths can
    * build the same symbol string) and is then eligible again, exactly
    * as a full recount would see it.
    */
  private[graft] def trainIncremental(words: Array[String],
                                      freqs: Array[Long],
                                      nMerges: Int): Vector[(String, String)] = {
    import graft.functions.BpeKernel
    val n = words.length
    val syms = new Array[Array[String]](n)
    val counts = new java.util.HashMap[String, java.lang.Long]()
    val occ = new java.util.HashMap[String, java.util.ArrayList[Integer]]()
    def occAdd(k: String, i: Int): Unit =
      occ.computeIfAbsent(k, _ => new java.util.ArrayList[Integer]())
        .add(Integer.valueOf(i))
    // overlap-included pair counts of one word's current symbols
    def pairsOf(s: Array[String]): java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      var i = 0
      while (i + 1 < s.length) {
        m.merge(s(i) + " " + s(i + 1), Integer.valueOf(1),
          (x, y) => Integer.valueOf(x.intValue + y.intValue))
        i += 1
      }
      m
    }
    var i = 0
    while (i < n) {
      syms(i) = BpeKernel.segment(words(i), Array.empty, Array.empty)
      val f = freqs(i)
      val it = pairsOf(syms(i)).entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        counts.merge(e.getKey, java.lang.Long.valueOf(e.getValue.longValue * f),
          (x, y) => java.lang.Long.valueOf(x.longValue + y.longValue))
        occAdd(e.getKey, i)
      }
      i += 1
    }
    val cmp = new java.util.Comparator[PairEntry] {
      override def compare(x: PairEntry, y: PairEntry): Int = {
        if (x.count != y.count) java.lang.Long.compare(y.count, x.count)
        else java.util.Arrays.compareUnsigned(x.bytes, y.bytes)
      }
    }
    val heap = new java.util.PriorityQueue[PairEntry](math.max(16, counts.size), cmp)
    def push(k: String, c: Long): Unit =
      if (c >= 2) heap.add(PairEntry(c, k,
        k.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    counts.forEach((k, v) => push(k, v.longValue))

    var merges = Vector.empty[(String, String)]
    var done = false
    while (merges.length < nMerges && !done) {
      // poll past stale entries to the live max (an entry is live iff
      // its pushed count equals the pair's current count)
      var top: PairEntry = null
      while (top == null && !heap.isEmpty) {
        val e = heap.poll()
        val cur = counts.getOrDefault(e.key, java.lang.Long.valueOf(0L))
        if (cur.longValue == e.count) top = e
      }
      if (top == null) done = true
      else {
        val sep = top.key.indexOf(' ')
        val a = top.key.substring(0, sep)
        val b = top.key.substring(sep + 1)
        merges :+= ((a, b))
        val delta = new java.util.HashMap[String, java.lang.Long]()
        val ids = occ.remove(top.key)
        val seen = new java.util.HashSet[Integer]()
        if (ids != null) {
          val it = ids.iterator()
          while (it.hasNext) {
            val idx = it.next()
            if (seen.add(idx)) {
              val s = syms(idx.intValue)
              // the occ index is maintained lazily — skip words that
              // no longer contain the pair adjacently
              var has = false
              var j = 0
              while (j + 1 < s.length && !has) {
                if (s(j) == a && s(j + 1) == b) has = true
                j += 1
              }
              if (has) {
                val f = freqs(idx.intValue)
                val before = pairsOf(s)
                val ns = new Array[String](mergedLen(s, a, b))
                applyMergeInto(s, a, b, ns)
                val after = pairsOf(ns)
                after.forEach { (k, c) =>
                  val prev = before.getOrDefault(k, Integer.valueOf(0))
                  val d = c.intValue - prev.intValue
                  if (d != 0)
                    delta.merge(k, java.lang.Long.valueOf(d.toLong * f),
                      (x, y) => java.lang.Long.valueOf(x.longValue + y.longValue))
                  if (prev.intValue == 0) occAdd(k, idx.intValue)
                }
                before.forEach { (k, c) =>
                  if (!after.containsKey(k))
                    delta.merge(k, java.lang.Long.valueOf(-c.longValue * f),
                      (x, y) => java.lang.Long.valueOf(x.longValue + y.longValue))
                }
                syms(idx.intValue) = ns
              }
            }
          }
        }
        delta.forEach { (k, d) =>
          if (d.longValue != 0L) {
            val nv = counts.merge(k, d,
              (x, y) => java.lang.Long.valueOf(x.longValue + y.longValue))
            if (nv.longValue == 0L) counts.remove(k) else push(k, nv.longValue)
          }
        }
      }
    }
    merges
  }

  /** Length of `s` after one left-to-right non-overlapping application
    * of merge (a,b) — lets [[applyMergeInto]] fill a right-sized array.
    */
  private def mergedLen(s: Array[String], a: String, b: String): Int = {
    var i = 0; var out = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += 1; i += 2 }
      else { out += 1; i += 1 }
    }
    out
  }

  /** One left-to-right non-overlapping application of merge (a,b) —
    * the same rule as one step of [[graft.functions.BpeKernel.segment]].
    */
  private def applyMergeInto(s: Array[String], a: String, b: String,
                             out: Array[String]): Unit = {
    var i = 0; var o = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
        out(o) = a + b; o += 1; i += 2
      } else { out(o) = s(i); o += 1; i += 1 }
    }
  }

  /** The STABLE VOCAB a merge list induces — the id↔token table a
    * training loader ships next to its tokenizer.json: base ids
    * 0..255 are the UTF-8 BYTE values (the GPT-2 byte-level
    * convention; the token string is the byte's 2-char uppercase-hex
    * symbol, the same rendering every kernel and the DuckDB oracle
    * use), merge i's output symbol is id 256+i (on a duplicate
    * output — two merge paths CAN build the same string — the FIRST
    * merge owns the id and later indices are dead, exactly the
    * [[graft.functions.bpe.mergeIdMap]] rule the encode kernel
    * applies), and one reserved `<unk>` id caps the table — it is
    * unreachable by construction (every segmenter output is a base
    * byte or a merge output) and exists only so a corrupted artifact
    * fails visibly. Ids are dense-by-construction except dead
    * duplicate slots, and encode/vocab share one map so they can
    * never disagree. [[decodeIds]] is the inverse.
    */
  def vocab(merges: Seq[(String, String)]): Seq[(Int, String)] = {
    val m = graft.functions.bpe.mergeIdMap(merges)
    val base = (0 until 256).map(b => (b, f"$b%02X"))
    val merged = merges.zipWithIndex.collect {
      case ((a, b), i) if m.get(a + b).intValue == 256 + i =>
        (256 + i, a + b)
    }
    base ++ merged :+ (graft.functions.bpe.unkId(merges), "<unk>")
  }

  /** Detokenize an id stream through a [[vocab]] table: concatenate
    * the tokens' hex symbols, parse back to UTF-8 bytes, decode — the
    * loader-side inverse of [[graft.functions.bpe.encodeIds]].
    * Pretokenization is whitespace-faithful, so the round trip is
    * EXACT: `decodeIds(encodeIds(text)) == text` (spec-pinned).
    */
  def decodeIds(ids: Seq[Int], id2tok: Map[Int, String]): String = {
    val hex = ids.map(id2tok).mkString
    require(hex.length % 2 == 0 && hex.forall(c =>
      Character.digit(c, 16) >= 0), "vocab tokens must be hex symbols")
    val bs = new Array[Byte](hex.length / 2)
    var i = 0
    while (i < bs.length) {
      bs(i) = ((Character.digit(hex.charAt(2 * i), 16) << 4) |
        Character.digit(hex.charAt(2 * i + 1), 16)).toByte
      i += 1
    }
    new String(bs, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Persist a trained merge list as a tokenizer ARTIFACT — this
    * engine's tokenizer.json: `dir/merges` = (m, left, right) in merge
    * order, `dir/vocab` = the [[vocab]] id↔token table (what a loader
    * needs to decode ids or embed the id space). The lifecycle is the
    * same as the persisted ANN index's (train once, save, serve
    * everywhere): the serving path ([[tokenStats]] / encode-to-ids
    * under [[loadMerges]]) carries the merges as plan constants and
    * never trains.
    */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[(String, String)], dir: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("m", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
    vocab(merges).toDF("id", "token")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/vocab")
  }

  /** Read a [[saveMerges]] artifact back in merge order. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
                 dir: String): Vector[(String, String)] =
    spark.read.parquet(s"$dir/merges").orderBy(col("m")).collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
      .toVector

  /** Read a [[saveMerges]] artifact's vocab table as an id→token map. */
  def loadVocab(spark: org.apache.spark.sql.SparkSession,
                dir: String): Map[Int, String] =
    spark.read.parquet(s"$dir/vocab").collect()
      .map(r => r.getAs[Int]("id") -> r.getAs[String]("token")).toMap

  /** The PUBLISHED byte-level tokenizer alphabet (the `bytes_to_
    * unicode` table of the public GPT-2 encoder, reproduced from its
    * published rule — every byte-level BPE release renders its
    * merges.txt/vocab.json over it): the 188 "printable" bytes
    * (`!`..`~`, `¡`..`¬`, `®`..`ÿ`) stand for themselves; the other
    * 68 (controls, space, DEL, 0xAD …) map — in byte order — to
    * codepoints 256, 257, … so every byte gets a VISIBLE single
    * character and a merges.txt line can be split on plain spaces
    * (byte 0x20 itself renders as `Ġ` = U+0120 = 256+32, which is why
    * published vocabularies are full of `Ġword` entries; newline is
    * `Ċ`). Index = byte value, entry = codepoint.
    */
  val ByteToUnicode: Array[Int] = {
    // '!'..'~', '¡'..'¬', '®'..'ÿ'
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Int](256)
    var next = 256
    var b = 0
    while (b < 256) {
      if (keep(b)) out(b) = b
      else { out(b) = next; next += 1 }
      b += 1
    }
    out
  }

  /** Inverse of [[ByteToUnicode]] — codepoint → byte value. Total on
    * exactly the 256 alphabet codepoints (the mapping is bijective). */
  val UnicodeToByte: Map[Int, Int] =
    ByteToUnicode.zipWithIndex.map { case (cp, b) => cp -> b }.toMap

  /** Parse the PUBLISHED merges.txt format — one `left right` pair
    * per line in rank order, tokens rendered in the
    * [[ByteToUnicode]] alphabet, an optional `#version:` header —
    * into this engine's hex-symbol merge list, directly usable by
    * [[tokenStats]] / [[graft.functions.bpe.encodeIds]] / the
    * `graft_bpe_*` TVFs (with `gpt2Ws = true` for counts that match
    * the deployed tokenizer's segmentation exactly). Strict by
    * design: a malformed line (not exactly two space-separated
    * fields) or a character outside the alphabet fails with its line
    * number — a truncated or wrong-encoding artifact must not load
    * as a silently different tokenizer.
    */
  /** An alphabet-rendered token → this engine's hex-symbol string
    * (`where` names the artifact position for the error message). */
  private def alphabetTokenToHex(tok: String, where: => String): String = {
    val sb = new java.lang.StringBuilder(tok.length * 2)
    var i = 0
    while (i < tok.length) {
      val cp = tok.codePointAt(i)
      UnicodeToByte.get(cp) match {
        case Some(b) => sb.append(f"$b%02X")
        case scala.None => throw new IllegalArgumentException(
          s"$where: character U+${cp.toHexString.toUpperCase} in " +
            s"token '$tok' is outside the byte-level tokenizer " +
            "alphabet - not a byte-to-unicode artifact")
      }
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** A hex-symbol string → its alphabet rendering (inverse of
    * [[alphabetTokenToHex]]). */
  private def hexToAlphabetToken(sym: String): String = {
    val sb = new java.lang.StringBuilder(sym.length / 2)
    var i = 0
    while (i < sym.length) {
      sb.appendCodePoint(ByteToUnicode(
        Integer.parseInt(sym.substring(i, i + 2), 16)))
      i += 2
    }
    sb.toString
  }

  def parseMergesTxt(lines: Iterator[String]): Vector[(String, String)] =
    lines.zipWithIndex.flatMap { case (raw, i) =>
      val line = raw.stripSuffix("\r")
      if (line.isEmpty || (i == 0 && line.startsWith("#"))) scala.None
      else line.split(" ", -1) match {
        case Array(a, b) if a.nonEmpty && b.nonEmpty =>
          Some((alphabetTokenToHex(a, s"merges.txt line ${i + 1}"),
            alphabetTokenToHex(b, s"merges.txt line ${i + 1}")))
        case _ => throw new IllegalArgumentException(
          s"merges.txt line ${i + 1}: expected 'left right' (exactly " +
            s"two space-separated fields), got '$line'")
      }
    }.toVector

  /** Render a merge list back in the published merges.txt format —
    * the exact inverse of [[parseMergesTxt]] (round-trip spec-pinned),
    * so a tokenizer trained HERE can ship to any loader of the public
    * format. */
  def renderMergesTxt(merges: Seq[(String, String)]): String =
    ("#version: 0.2" +: merges.map { case (a, b) =>
      s"${hexToAlphabetToken(a)} ${hexToAlphabetToken(b)}" })
      .mkString("", "\n", "\n")

  /** Parse a PUBLISHED-format vocab.json — the flat
    * `{"token": id, …}` map a released byte-level tokenizer ships
    * next to its merges.txt, tokens rendered in the
    * [[ByteToUnicode]] alphabet — into hex-symbol → external id.
    * Jackson (on every Spark classpath) does the JSON; the alphabet
    * conversion is strict exactly like [[parseMergesTxt]]'s. */
  def parseVocabJson(json: Array[Byte]): Map[String, Int] = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json)
    require(root != null && root.isObject,
      "vocab.json must be one flat JSON object of token -> id")
    val out = Map.newBuilder[String, Int]
    val it = root.fields()
    while (it.hasNext) {
      val e = it.next()
      require(e.getValue.isIntegralNumber,
        s"vocab.json: id of token '${e.getKey}' is not an integer")
      out += alphabetTokenToHex(e.getKey,
        s"vocab.json token '${e.getKey}'") -> e.getValue.asInt()
    }
    out.result()
  }

  /** [[parseVocabJson]] from any Hadoop-visible path (driver-side,
    * like [[loadMergesTxt]] — the artifact is sub-MB). */
  def loadVocabJson(spark: org.apache.spark.sql.SparkSession,
                    path: String): Map[String, Int] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try parseVocabJson(in.readAllBytes()) finally in.close()
  }

  /** ENGINE id → EXTERNAL id table under a published vocab.json —
    * the remap that makes the id STREAM (not just the count)
    * comparable with a deployed tokenizer: published vocabs assign
    * base-byte ids by alphabet sort order (`!` = 0 in the GPT-2
    * family), not byte value, so engine ids need one table lookup.
    * Slot = engine id (base byte b at b, merge i's output at 256+i),
    * value = the vocab's id for that token's alphabet rendering.
    * STRICT: a reachable engine token absent from the vocab throws
    * (merges.txt and vocab.json from different releases must not
    * half-work); dead duplicate merge slots and the unreachable unk
    * sentinel get -1. Apply with
    * [[graft.functions.bpe.remapIds]] — a codegen'd array lookup, so
    * the remap rides the encode plan with zero extra kernels. */
  def externalIds(merges: Seq[(String, String)],
                  vocab: Map[String, Int]): Array[Int] = {
    val m = graft.functions.bpe.mergeIdMap(merges)
    val out = Array.fill(graft.functions.bpe.unkId(merges) + 1)(-1)
    def resolve(sym: String, what: String): Int =
      vocab.getOrElse(sym, throw new IllegalArgumentException(
        s"vocab.json has no id for $what '${hexToAlphabetToken(sym)}' " +
          "- merges and vocab are from different releases"))
    (0 until 256).foreach(b => out(b) = resolve(f"$b%02X", s"byte $b"))
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      if (m.get(a + b).intValue == 256 + i)
        out(256 + i) = resolve(a + b, s"merge ${i}'s output")
    }
    out
  }

  /** Load a PUBLISHED-format merges.txt from any Hadoop-visible path
    * (local, HDFS, object store) — the step that makes token counts
    * comparable against a DEPLOYED tokenizer end-to-end: a real
    * released merge table (tens of thousands of rank-ordered pairs,
    * sub-MB of text) loads here, travels into the encode kernels as a
    * plan constant exactly like [[frozenMerges]], and `gpt2Ws = true`
    * reproduces the published pretokenization. Driver-side sequential
    * read on purpose: rank order IS the file's line order (a
    * distributed text read would shuffle it), and the artifact is
    * KB-to-MB scale at any corpus size.
    */
  def loadMergesTxt(spark: org.apache.spark.sql.SparkSession,
                    path: String): Vector[(String, String)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val rd = new java.io.BufferedReader(
        new java.io.InputStreamReader(in,
          java.nio.charset.StandardCharsets.UTF_8))
      parseMergesTxt(Iterator.continually(rd.readLine()).takeWhile(_ != null))
    } finally in.close()
  }

  /** Write a merge list as a published-format merges.txt ([[
    * renderMergesTxt]]) at any Hadoop-visible path — the export half
    * of the interop. */
  def saveMergesTxt(spark: org.apache.spark.sql.SparkSession,
                    merges: Seq[(String, String)], path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(renderMergesTxt(merges)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Per-doc token statistics under a trained merge list: char count,
    * BPE token count (one fused kernel call per doc — zero shuffles),
    * and the chars-per-token compression ratio (null for empty docs).
    */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String,
                 merges: Seq[(String, String)],
                 gpt2Ws: Boolean = false): DataFrame =
    docs.select(col(idCol),
        length(col(textCol)).cast("long").as("n_chars"),
        bpe.tokenCount(col(textCol), merges, gpt2Ws).as("n_bpe"))
      .withColumn("compression",
        when(col("n_bpe") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_chars") / col("n_bpe"), 6)))
}
