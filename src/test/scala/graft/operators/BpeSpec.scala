package graft.operators

import graft.SparkSpec
import graft.functions.BpeKernel
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference trainer: same word-frequency table, same
    * overlap-included pair counting, same left-to-right non-overlap
    * merge rule, same (count DESC, UTF-8-byte key ASC) tie-break —
    * written independently of the production trainer's bookkeeping.
    * Segmentations are CACHED (applying only the newest merge each
    * iteration is definitionally the same as re-segmenting under the
    * whole list — [[BpeKernel.segment]] is a fold over merges), but
    * the pair COUNTS are rebuilt from scratch every iteration, so this
    * reference exercises none of the production trainer's delta
    * maintenance, occurrence index, or lazy heap — a count-level drift
    * in any of those breaks the parity assertions below.
    */
  /** Independent whitespace-faithful pretokenizer: a straight Java
    * regex matcher loop over [[Bpe.PretokenRegex]] — deliberately NOT
    * the kernel's hand scanner, so the parity tests below also pin
    * the scanner's semantics to the regex.
    */
  private def refPretokens(text: String): Seq[String] = {
    val m = java.util.regex.Pattern.compile(Bpe.PretokenRegex)
      .matcher(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toSeq
  }

  private def referenceTrain(texts: Seq[String],
                             nMerges: Int): Seq[(String, String)] = {
    implicit val byteOrd: Ordering[String] = (x: String, y: String) =>
      java.util.Arrays.compareUnsigned(
        x.getBytes("UTF-8"), y.getBytes("UTF-8"))
    val freq = texts.flatMap(refPretokens)
      .filter(_.getBytes("UTF-8").length > 1) // byte-level trainability
      .groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val segs = scala.collection.mutable.LinkedHashMap.empty[String, Array[String]]
    freq.keys.toSeq.sorted.foreach { w =>
      segs(w) = BpeKernel.segment(w, Array.empty, Array.empty)
    }
    var merges = Vector.empty[(String, String)]
    var done = false
    while (merges.length < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      segs.foreach { case (w, s) =>
        val f = freq(w)
        var i = 0
        while (i + 1 < s.length) {
          val key = s(i) + " " + s(i + 1)
          counts(key) = counts.getOrElse(key, 0L) + f
          i += 1
        }
      }
      val eligible = counts.filter(_._2 >= 2)
      if (eligible.isEmpty) done = true
      else {
        val key = eligible.toSeq.minBy { case (k, c) => (-c, k) }._1
        val sep = key.indexOf(' ')
        val a = key.substring(0, sep)
        val b = key.substring(sep + 1)
        merges :+= ((a, b))
        segs.keys.foreach { w =>
          val s = segs(w)
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
              out += a + b; i += 2
            } else { out += s(i); i += 1 }
          }
          segs(w) = out.toArray
        }
      }
    }
    merges
  }

  test("kernel: left-to-right non-overlap merges, overlap-included " +
      "pair counting, byte-hex symbols round-trip") {
    // "aaa" = bytes 61 61 61 under (61,61): two counted pairs
    // (overlap-included), but one applied merge (left-to-right)
    val pairs = BpeKernel.adjacentPairs(
      org.apache.spark.unsafe.types.UTF8String.fromString("aaa"),
      Array.empty, Array.empty)
    assert(pairs.numElements() == 2 &&
      pairs.getUTF8String(0).toString == "61 61")
    assert(BpeKernel.segment("aaa", Array("61"), Array("61")).toSeq ==
      Seq("6161", "61"))
    // ordered merges compose: (61,62)="ab" then (6162,63)="abc"
    assert(BpeKernel.segment("abcabc", Array("61", "6162"),
      Array("62", "63")).toSeq == Seq("616263", "616263"))
    // segments always concatenate back to the word's byte hex
    for (w <- Seq("tokenize", "aaaa", "xy", "a", "héllo", "数据"))
      assert(BpeKernel.segment(w, Array("61", "746F", "656E"),
        Array("61", "6B", "69")).mkString ==
        BpeKernel.byteSyms(w).mkString)
    // non-ASCII is just bytes: one emoji = 4 UTF-8 bytes = 4 base
    // symbols; a learned 2-byte merge applies inside the codepoint
    val emoji = "😀😀" // F0 9F 98 80, twice
    val esyms = BpeKernel.segment(emoji, Array.empty, Array.empty)
    assert(esyms.toSeq == Seq("F0", "9F", "98", "80",
      "F0", "9F", "98", "80"))
    assert(BpeKernel.segment(emoji, Array("F0"),
      Array("9F")).length == 6, "merge must apply inside a codepoint")
    // a single non-ASCII char is NOT single-byte: it has pairs
    val cjk = BpeKernel.adjacentPairs(
      org.apache.spark.unsafe.types.UTF8String.fromString("好"),
      Array.empty, Array.empty)
    assert(cjk.numElements() == 2, "3-byte char yields 2 adjacent pairs")
  }

  test("pretokens: hand scanner equals the regex on every edge shape, " +
      "and pretokens concatenate back to the exact source") {
    val cases = Seq(
      "", " ", "   ", "a", " a", "a ", "  a  b  ", "low low\tlow",
      "tab\tmix \n newline\r\n crlf", "trail   \t ",
      "vertical tab", "数据 数据", "x", "一 二\t三\n",
      "no_ws_at_all", " \t\n\f\r mixed-run word", "a b", "a  b",
      // category-aware shapes: contractions, class boundaries,
      // apostrophe edge cases, digits, SMP letters (surrogate pairs —
      // \uD800\uDF30 is GOTHIC LETTER AHSA, \p{L} but non-BMP),
      // Nl/No digits (Ⅻ ½), combining-mark scripts
      "don't", "end. Next", "DON'T", "that 's odd", "I'll we've you're",
      "he'd I'm it's", "x42y 3.14", "'", "a'", "'lx", "''quoted''",
      "price: $5.99!", "emoji \uD83D\uDE00 here", "\uD800\uDF30word",
      "e2.5e-3", "tail'", "'re", "a-b_c", "½¾ Ⅻ", "॥अनुच्छेद॥")
    cases.foreach { s =>
      val scanned = BpeKernel.pretokens(s).toSeq
      assert(scanned == refPretokens(s),
        s"scanner != regex on ${s.map(_.toInt).mkString("[", ",", "]")}")
      assert(scanned.mkString == s,
        "pretokens must concatenate back to the source")
      assert(scanned.forall(_.nonEmpty), "pretokens are never empty")
    }
    // the space-prefix convention itself: separators fold FORWARD
    assert(BpeKernel.pretokens("the cat  sat").toSeq ==
      Seq("the", " cat", "  sat"))
    assert(BpeKernel.pretokens(" lead trail ").toSeq ==
      Seq(" lead", " trail", " "))
    // category-aware segmentation, pinned to the deployed-tokenizer
    // shapes: merges can never cross a word/punct boundary, and the
    // GPT-2 contraction suffixes split off (lowercase-only, the
    // original's known quirk on DON'T)
    assert(BpeKernel.pretokens("end. Next").toSeq ==
      Seq("end", ".", " Next"))
    assert(BpeKernel.pretokens("don't stop").toSeq ==
      Seq("don", "'t", " stop"))
    assert(BpeKernel.pretokens("DON'T").toSeq == Seq("DON", "'", "T"))
    assert(BpeKernel.pretokens("price: $5.99!").toSeq ==
      Seq("price", ":", " $", "5", ".", "99", "!"))
    assert(BpeKernel.pretokens("I'll we've").toSeq ==
      Seq("I", "'ll", " we", "'ve"))
  }

  /** Independent gpt2Ws pretokenizer: the compiled lookahead pattern
    * itself ([[Bpe.Gpt2WsPretokenRegex]]), so the hand scanner's
    * gpt2Ws mode is pinned to the published GPT-2 regex semantics.
    */
  private def refGpt2Pretokens(text: String): Seq[String] = {
    val m = java.util.regex.Pattern.compile(Bpe.Gpt2WsPretokenRegex)
      .matcher(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toSeq
  }

  /** The oracle's lookahead-FREE two-pass rewrite, in Java regex (the
    * exact transformation gpt2WsPretokSql inlines into DuckDB):
    * boundary insertion between the last two whitespace chars of every
    * >=2 run before a word, split, per-segment extraction with the
    * plain [[Bpe.Gpt2WsSegmentRegex]]. Pinned equal to the lookahead
    * pattern below, so the SQL replay's math is proven independently
    * of DuckDB's execution of it (which the text_bpe_gpt2ws oracle
    * row then pins cross-engine).
    */
  private def twoPassGpt2Pretokens(text: String): Seq[String] = {
    val boundary = java.util.regex.Pattern.compile("(\\s)(\\s\\S)")
      .matcher(text).replaceAll("$1\u001F$2")
    val seg = java.util.regex.Pattern.compile(Bpe.Gpt2WsSegmentRegex)
    // -1: keep trailing empty segments out (none are produced — the
    // boundary never lands at the ends), match String.split semantics
    boundary.split("\u001F", -1).toSeq.flatMap { s =>
      val m = seg.matcher(s)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) out += m.group()
      out
    }
  }

  test("gpt2Ws pretokens: hand scanner equals the compiled lookahead " +
      "regex AND the two-pass rewrite on every edge shape; " +
      "multi-space / indentation fixtures match the published GPT-2 " +
      "segmentation; concatenation stays exact") {
    val cases = Seq(
      "", " ", "   ", "a", " a", "a ", "  a  b  ", "low low\tlow",
      "tab\tmix \n newline\r\n crlf", "trail   \t ",
      "vertical tab", "数据 数据", "x", "一 二\t三\n",
      "no_ws_at_all", " \t\n\f\r mixed-run word", "a b", "a  b",
      "a   b", "a    b", "don't  stop", "x \n b", "a \n\n b",
      "\t\ta", "\ta", " \t a", "a \t", "  \t", "    indent(x)",
      "def f():\n    return 1", "x   'll", "  'quoted'  ",
      "don't", "end. Next", "DON'T", "that 's odd", "I'll we've you're",
      "he'd I'm it's", "x42y 3.14", "'", "a'", "'lx", "''quoted''",
      "price: $5.99!", "emoji 😀 here", "𐌰word",
      "e2.5e-3", "tail'", "'re", "a-b_c", "½¾ Ⅻ", "॥अनुच्छेद॥")
    cases.foreach { s =>
      val scanned = BpeKernel.pretokens(s, gpt2Ws = true).toSeq
      assert(scanned == refGpt2Pretokens(s),
        s"gpt2 scanner != lookahead regex on " +
          s.map(_.toInt).mkString("[", ",", "]") + s": $scanned")
      assert(scanned == twoPassGpt2Pretokens(s),
        s"two-pass rewrite != lookahead regex on " +
          s.map(_.toInt).mkString("[", ",", "]"))
      assert(scanned.mkString == s,
        "gpt2 pretokens must concatenate back to the source")
      assert(scanned.forall(_.nonEmpty))
    }
    // the published GPT-2 whitespace semantics, pinned by value: ONE
    // optional space folds (` ?<run>`), `\s+(?!\S)` claims the run
    // minus its last char before a word, a non-space last ws char
    // stands alone, a trailing run stands whole
    assert(BpeKernel.pretokens("a   b", gpt2Ws = true).toSeq ==
      Seq("a", "  ", " b"))
    assert(BpeKernel.pretokens("    indent(x)", gpt2Ws = true).toSeq ==
      Seq("   ", " indent", "(", "x", ")"))
    assert(BpeKernel.pretokens("def f():\n    return 1",
        gpt2Ws = true).toSeq ==
      Seq("def", " f", "():", "\n   ", " return", " 1"))
    assert(BpeKernel.pretokens("tab\tsep", gpt2Ws = true).toSeq ==
      Seq("tab", "\t", "sep"))
    assert(BpeKernel.pretokens("trail  ", gpt2Ws = true).toSeq ==
      Seq("trail", "  "))
    assert(BpeKernel.pretokens("x   'll", gpt2Ws = true).toSeq ==
      Seq("x", "  ", " '", "ll"),
      "a space-folded punct run consumes the apostrophe - the " +
        "contraction only wins at a fresh match position")
    assert(BpeKernel.pretokens("don't  stop", gpt2Ws = true).toSeq ==
      Seq("don", "'t", " ", " stop"))
    // the DEFAULT mode is unchanged: whole-run fold (the engine's
    // documented variant) — the same inputs segment differently
    assert(BpeKernel.pretokens("a   b").toSeq == Seq("a", "   b"))
    assert(BpeKernel.pretokens("    indent(x)").toSeq ==
      Seq("    indent", "(", "x", ")"))
  }

  test("gpt2Ws fuzz: 3000 seeded random strings — scanner equals the " +
      "compiled lookahead regex equals the two-pass rewrite; " +
      "round-trip ids stay byte-exact; counts equal id lengths") {
    val alphabet: Array[String] = Array(
      " ", " ", " ", "\t", "\n", "a", "b", "e", "l", "r", "s", "t", "v",
      "A", "Z", "é", "中", "𐌰", "0", "7",
      "٣", "Ⅻ", "½", "'", "'", ".", "!",
      "%", "+", "_", "😀")
    val rnd = new java.util.Random(20260817L)
    val merges = Bpe.frozenMerges
    val ma = merges.map(_._1).toArray
    val mb = merges.map(_._2).toArray
    val idMap = graft.functions.bpe.mergeIdMap(merges)
    val unk = graft.functions.bpe.unkId(merges)
    val toks = graft.functions.bpe.decodeTokTable(merges)
    (1 to 3000).foreach { i =>
      val len = rnd.nextInt(31)
      val s = (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString
      val scanned = BpeKernel.pretokens(s, gpt2Ws = true).toSeq
      assert(scanned == refGpt2Pretokens(s),
        s"fuzz #$i gpt2 scanner != regex on " +
          s.map(_.toInt).mkString("[", ",", "]"))
      assert(scanned == twoPassGpt2Pretokens(s),
        s"fuzz #$i two-pass != regex on " +
          s.map(_.toInt).mkString("[", ",", "]"))
      assert(scanned.mkString == s, s"fuzz #$i lost characters")
      // round-trip byte-exactness and count == ids.length under the
      // gpt2 mode (both modes partition the source, so decode∘encode
      // must stay the identity)
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val ids = BpeKernel.encodeIds(u, ma, mb, idMap, unk, gpt2Ws = true)
      assert(ids.numElements().toLong ==
        BpeKernel.tokenCount(u, ma, mb, gpt2Ws = true),
        s"fuzz #$i count != ids length")
      val back = BpeKernel.decodeIds(ids, toks)
      assert(back != null && back.toString == s,
        s"fuzz #$i gpt2 round-trip drifted on " +
          s.map(_.toInt).mkString("[", ",", "]"))
    }
  }

  test("pretokens fuzz: 3000 seeded random strings over a mixed " +
      "alphabet (ws/letters/digits/punct/apostrophes/surrogates) — " +
      "scanner equals the compiled regex, concatenation exact") {
    // deterministic fuzzer: the hand-picked battery above pins the
    // known shapes; this sweeps the combinatorial neighborhoods no
    // battery enumerates (apostrophe runs against suffix prefixes,
    // class flips inside ws folds, surrogate pairs at boundaries)
    val alphabet: Array[String] = Array(
      " ", " ", "\t", "\n", "a", "b", "e", "l", "r", "s", "t", "v",
      "A", "Z", "é", "中", "𐌰" /* 𐌰 Lo */, "0", "7",
      "٣" /* Nd */, "Ⅻ" /* Nl */, "½" /* No */, "'", "'", ".", "!",
      "%", "+", "_", "😀" /* emoji So */)
    val rnd = new java.util.Random(20260816L)
    (1 to 3000).foreach { i =>
      val len = rnd.nextInt(31)
      val s = (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString
      val scanned = BpeKernel.pretokens(s).toSeq
      assert(scanned == refPretokens(s),
        s"fuzz #$i scanner != regex on " +
          s.map(_.toInt).mkString("[", ",", "]"))
      assert(scanned.mkString == s, s"fuzz #$i lost characters")
    }
  }

  test("train: distributed merges equal the reference trainer on a " +
      "crafted corpus AND on the sf documents table") {
    val crafted = Seq(
      "low low low lower lower newest newest newest newest widest",
      "low lower newest widest widest newest",
      // non-ASCII: byte-level pair keys and tie-breaks must agree
      // with the reference beyond ASCII too
      "данные данные 数据 数据 δελτα δελτα 好 好")
    val df = crafted.toDF("text")
    val got = Bpe.train(df, "text", nMerges = 12)
    val want = referenceTrain(crafted, 12)
    assert(got == want, s"crafted: $got != $want")
    // real corpus: trainer must agree under real skew/partitioning
    val docs = sf("documents")
    val gotSf = Bpe.train(docs, "text", nMerges = 8)
    val wantSf = referenceTrain(
      docs.select("text").as[String].collect().toSeq, 8)
    assert(gotSf == wantSf, s"sf: $gotSf != $wantSf")
    assert(gotSf.length == 8, "sf corpus must support 8 merges")
    // partitioning independence
    val gotRe = Bpe.train(df.repartition(7), "text", nMerges = 12)
    assert(gotRe == got)
  }

  test("train: vocab-scale parity — >=1000 learned merges on a rich " +
      "corpus equal the reference, and the sf table trains to exhaustion") {
    // deterministic rich corpus: 1500 distinct pseudo-random words,
    // each repeated 2..5 times, so every adjacent pair is eligible
    // (count >= 2) and thousands of merges are learnable — the regime
    // where the old per-iteration full recount was quadratic
    val rnd = new scala.util.Random(20260814L)
    val words = (0 until 1500).map { _ =>
      val len = 8 + rnd.nextInt(8)
      (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }.distinct
    val texts = rnd.shuffle(words.flatMap(w =>
      Seq.fill(2 + rnd.nextInt(4))(w)))
      .grouped(40).map(_.mkString(" ")).toSeq
    val df = texts.toDF("text")
    val got = Bpe.train(df, "text", nMerges = 1200)
    assert(got.length == 1200, s"rich corpus must support 1200 merges")
    val want = referenceTrain(texts, 1200)
    assert(got == want, {
      val i = got.zip(want).indexWhere { case (g, w) => g != w }
      s"first divergence at merge $i: got=${got.lift(i)} want=${want.lift(i)}"
    })
    // requesting more merges than the corpus supports stops at
    // exhaustion, and the full learned prefix still matches
    val docs = sf("documents")
    val gotEx = Bpe.train(docs, "text", nMerges = 1000)
    val wantEx = referenceTrain(
      docs.select("text").as[String].collect().toSeq, 1000)
    assert(gotEx == wantEx, "exhaustion run must match the reference")
    assert(gotEx.length < 1000 && gotEx.length > 30,
      s"sf corpus should exhaust between 30 and 1000 merges, " +
        s"got ${gotEx.length}")
  }

  test("merge artifact: save/load round-trips the trained list and " +
      "serves identical tokenStats") {
    val docs = sf("documents")
    val merges = Bpe.train(docs, "text", nMerges = 16)
    val dir = java.nio.file.Files.createTempDirectory("bpe_art").toString
    Bpe.saveMerges(spark, merges, dir)
    val loaded = Bpe.loadMerges(spark, dir)
    assert(loaded == merges.toVector, "artifact must round-trip in order")
    val a = Bpe.tokenStats(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val b = Bpe.tokenStats(docs, "doc_id", "text", loaded)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a == b, "serving under the loaded artifact must be identical")
    // overwrite with a refreshed (longer) training run — the artifact
    // lifecycle a periodic re-train follows
    val more = Bpe.train(docs, "text", nMerges = 24)
    Bpe.saveMerges(spark, more, dir)
    assert(Bpe.loadMerges(spark, dir) == more.toVector)
  }

  test("encodeIds: id-stream length equals tokenStats.n_bpe on the " +
      "whole sf table, and ids round-trip to the doc's symbols") {
    val docs = sf("documents")
    val merges = Bpe.frozenMerges
    // 1) size(ids) == n_bpe, every doc — the loader-facing array and
    // the count kernel must agree exactly or packing budgets drift
    val joined = Bpe.tokenStats(docs, "doc_id", "text", merges)
      .join(docs.select(col("doc_id"),
        graft.functions.bpe.encodeIds(col("text"), merges).as("ids")),
        "doc_id")
    assert(joined.filter(size(col("ids")) =!= col("n_bpe")).count() == 0L,
      "size(ids) must equal n_bpe for every doc")
    // 2) decode ids through the persisted vocab and compare against
    // the RAW text — pretokenization is whitespace-faithful, so the
    // loader's detokenizer round trip (hex symbols -> bytes -> UTF-8)
    // must be EXACT
    val id2tok = Bpe.vocab(merges).toMap
    val rows = docs.select(col("doc_id"), col("text"),
        graft.functions.bpe.encodeIds(col("text"), merges).as("ids"))
      .collect()
    rows.foreach { r =>
      val want = r.getAs[String]("text")
      val got = Bpe.decodeIds(
        r.getAs[scala.collection.Seq[Int]]("ids").toSeq, id2tok)
      assert(got == want, s"doc ${r.getLong(0)}: ids must decode back " +
        "to the exact source text")
    }
  }

  test("encodeIds: non-ASCII text — size(ids) == n_bpe on the " +
      "multilingual slice, zero unk ids, byte-exact decode round-trip") {
    val ml = graft.queries.Pipeline.multilingualSlice(sf("documents"))
    val merges = Bpe.frozenMerges
    val unk = graft.functions.bpe.unkId(merges)
    val joined = Bpe.tokenStats(ml, "doc_id", "text", merges)
      .join(ml.select(col("doc_id"), col("text"),
        graft.functions.bpe.encodeIds(col("text"), merges).as("ids")),
        "doc_id")
    assert(joined.filter(size(col("ids")) =!= col("n_bpe")).count() == 0L,
      "size(ids) must equal n_bpe on non-ASCII text")
    // the unk sentinel must be UNREACHABLE under the byte-level base
    assert(joined.filter(array_contains(col("ids"), unk)).count() == 0L,
      "no <unk> id may appear — byte-level base covers everything")
    val id2tok = Bpe.vocab(merges).toMap
    joined.select("doc_id", "text", "ids").collect().foreach { r =>
      val want = r.getAs[String]("text")
      val got = Bpe.decodeIds(
        r.getAs[scala.collection.Seq[Int]]("ids").toSeq, id2tok)
      assert(got == want,
        s"doc ${r.getLong(0)}: non-ASCII ids must decode back exactly")
    }
    // and merges TRAINED on non-ASCII text compress it: the id stream
    // under slice-trained merges is strictly shorter than base bytes
    val trained = Bpe.train(ml, "text", nMerges = 24)
    assert(trained.nonEmpty && trained.forall { case (a, b) =>
      (a + b).matches("[0-9A-F]+") }, "learned symbols are byte hex")
    val nBase = ml.select(sum(graft.functions.bpe.tokenCount(
      col("text"), Seq.empty))).head().getLong(0)
    val nTrained = ml.select(sum(graft.functions.bpe.tokenCount(
      col("text"), trained))).head().getLong(0)
    assert(nTrained < nBase,
      s"trained merges must compress non-ASCII text: $nTrained >= $nBase")
  }

  test("encodeIds: vocab convention — byte base ids 0..255, merge ids " +
      "256+i first-wins on duplicate outputs, non-ASCII is base bytes") {
    // bytes: a=61 b=62 c=63. (61,6263) and (6162,63) both output
    // "616263" ("abc"): the FIRST merge owns the id
    val dup = Seq(("62", "63"), ("61", "6263"), ("6162", "63"))
    val vm = graft.functions.bpe.mergeIdMap(dup)
    assert(vm.get("616263").intValue == 256 + 1,
      "first producing merge wins")
    val voc = Bpe.vocab(dup)
    assert(voc.count(_._2 == "616263") == 1, "vocab lists a token once")
    assert(voc.contains((256 + 0, "6263")) &&
      voc.contains((256 + 1, "616263")))
    assert(voc.last == (graft.functions.bpe.unkId(dup), "<unk>"))
    assert(voc.take(256).map(_._1) == (0 until 256) &&
      voc(0xE5)._2 == "E5", "base vocab is the 256 byte values in hex")
    val docs = Seq((0L, "abc xé")).toDF("doc_id", "text")
    val ids = docs.select(graft.functions.bpe.encodeIds(col("text"), dup))
      .head().getAs[scala.collection.Seq[Int]](0)
    // pretokens "abc" and " xé": "abc" -> bc then abc (id 257); the
    // separator folds into " xé" -> space (0x20) + 'x' (0x78) + é's
    // two UTF-8 bytes C3 A9 as base ids — NOT unk: byte-level covers it
    assert(ids.toSeq == Seq(257, 0x20, 0x78, 0xC3, 0xA9), s"got $ids")
    // the artifact persists the same table encodeIds uses
    val dir = java.nio.file.Files.createTempDirectory("bpe_voc").toString
    Bpe.saveMerges(spark, dup, dir)
    assert(Bpe.loadVocab(spark, dir) == voc.toMap)
  }

  test("tokenStats: counts shrink as merges apply, compression grows, " +
      "empty doc is null-safe") {
    val docs = Seq((0L, "banana banana bandana"), (1L, ""))
      .toDF("doc_id", "text")
    val none = Bpe.tokenStats(docs, "doc_id", "text", Seq.empty)
      .orderBy("doc_id").collect()
    // no merges: every byte is a token — 19 letters + 2 separator
    // spaces (whitespace-faithful pretokens carry the spaces)
    assert(none(0).getAs[Long]("n_bpe") == 21L)
    assert(none(1).getAs[Long]("n_bpe") == 0L &&
      none(1).isNullAt(none(1).fieldIndex("compression")))
    val merges = Bpe.train(docs, "text", nMerges = 6)
    assert(merges.nonEmpty)
    val trained = Bpe.tokenStats(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
    assert(trained(0).getAs[Long]("n_bpe") < 21L,
      "merges must reduce the token count")
    assert(trained(0).getAs[Double]("compression") >
      none(0).getAs[Double]("compression"))
  }

  test("external vocab: the published byte-to-unicode alphabet is " +
      "reproduced exactly and is bijective") {
    // the two famous remaps every published vocab makes visible
    assert(Bpe.ByteToUnicode(0x20) == 0x120, "space must render as Ġ")
    assert(Bpe.ByteToUnicode(0x0A) == 0x10A, "newline must render as Ċ")
    // printable bytes stand for themselves
    assert(Bpe.ByteToUnicode('A'.toInt) == 'A'.toInt)
    assert(Bpe.ByteToUnicode(0xC3) == 0xC3) // 'Ã' — kept range
    assert(Bpe.ByteToUnicode(0xA9) == 0xA9) // '©' — kept range
    // 0xAD (soft hyphen) is NOT printable: remapped past 255
    assert(Bpe.ByteToUnicode(0xAD) > 255)
    // bijective: 256 distinct codepoints, inverse total
    assert(Bpe.ByteToUnicode.distinct.length == 256)
    (0 until 256).foreach(b =>
      assert(Bpe.UnicodeToByte(Bpe.ByteToUnicode(b)) == b))
  }

  /** A merges.txt sample in the PUBLISHED format (rank-ordered pairs
    * over the byte-to-unicode alphabet, `#version` header) whose
    * leading ranks follow a GPT-2-family table, plus one multi-byte
    * rank (Ã © = the UTF-8 bytes of 'é') to pin the non-ASCII path. */
  private val mergesTxtSample =
    "#version: 0.2\n" +
    "Ġ t\n" + "Ġ a\n" + "h e\n" + "i n\n" + "r e\n" +
    "o n\n" + "Ġt he\n" + "e r\n" + "Ġ s\n" + "a t\n" +
    "Ã ©\n"

  test("external vocab: parseMergesTxt reads the published format " +
      "into rank-ordered hex merges; render round-trips; ranks apply " +
      "in order under gpt2Ws so counts match a deployed tokenizer") {
    val merges = Bpe.parseMergesTxt(mergesTxtSample.linesIterator)
    assert(merges == Vector(
      ("20", "74"), ("20", "61"), ("68", "65"), ("69", "6E"),
      ("72", "65"), ("6F", "6E"), ("2074", "6865"), ("65", "72"),
      ("20", "73"), ("61", "74"), ("C3", "A9")))
    // exact inverse — a tokenizer trained here ships in the format
    assert(Bpe.renderMergesTxt(merges) == mergesTxtSample)

    // hand-derived segmentation under the real ranks, gpt2Ws mode:
    // " the" = 20 74 68 65 → rank0 [2074,68,65] → rank2 [2074,6865]
    // → rank6 [20746865] = one token "Ġthe", id 256+6
    val ids = graft.functions.bpe.encodeIds(lit("in the"), merges,
      gpt2Ws = true)
    val got = Seq(1).toDF("x").select(ids.as("ids")).head()
      .getAs[collection.Seq[Int]]("ids").toSeq
    // "in" → rank3 one token id 256+3; " the" → id 256+6
    assert(got == Seq(259, 262), s"got $got")
    // non-ASCII rank: "café" = 63 61 66 C3 A9 → rank10 merges é's two
    // bytes → [63,61,66,C3A9] = 4 tokens, last id 256+10
    val cafe = Seq(1).toDF("x").select(
      graft.functions.bpe.encodeIds(lit("café"), merges,
        gpt2Ws = true).as("ids")).head().getAs[collection.Seq[Int]]("ids").toSeq
    assert(cafe == Seq(0x63, 0x61, 0x66, 266), s"got $cafe")
    // gpt2Ws segmentation is live under the external table: "a   b"
    // → "a" + "  " (run minus last) + " b" → 1 + 2 + 2 = 5 tokens
    val multi = Seq(1).toDF("x").select(
      graft.functions.bpe.tokenCount(lit("a   b"), merges,
        gpt2Ws = true).as("n")).head().getLong(0)
    assert(multi == 5L, s"got $multi")

    // malformed artifacts refuse with a line number, never half-load
    val bad1 = intercept[IllegalArgumentException] {
      Bpe.parseMergesTxt(Iterator("#version: 0.2", "a b c")) }
    assert(bad1.getMessage.contains("line 2"))
    val bad2 = intercept[IllegalArgumentException] {
      Bpe.parseMergesTxt(Iterator("\u0001 x")) } // U+0001 not in alphabet
    assert(bad2.getMessage.contains("alphabet"))
  }

  test("external vocab: merges.txt loads from a path into tokenStats " +
      "and the SQL TVFs (.txt arg), and saveMergesTxt exports back") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_txt")
    val path = dir.resolve("merges.txt").toString
    java.nio.file.Files.write(dir.resolve("merges.txt"),
      mergesTxtSample.getBytes("UTF-8"))
    val merges = Bpe.loadMergesTxt(spark, path)
    assert(merges.size == 11 && merges(6) == ("2074", "6865"))
    // tokenStats under the external table, gpt2Ws mode
    val docs = Seq((0L, "in the"), (1L, "café")).toDF("doc_id", "text")
    val stats = Bpe.tokenStats(docs, "doc_id", "text", merges,
      gpt2Ws = true).orderBy("doc_id").collect()
    assert(stats(0).getAs[Long]("n_bpe") == 2L)
    assert(stats(1).getAs[Long]("n_bpe") == 4L)
    // SQL surface: a .txt second arg loads the published format
    val sql = spark.sql(
      s"SELECT graft_bpe_count('in the', '$path', true) AS n, " +
        s"graft_bpe_ids('in the', '$path', true) AS ids").head()
    assert(sql.getAs[Long]("n") == 2L)
    assert(sql.getAs[collection.Seq[Int]]("ids").toSeq == Seq(259, 262))
    // decode∘encode stays byte-exact under an external table
    val rt = spark.sql(
      s"SELECT graft_bpe_decode(graft_bpe_ids(t, '$path', true), " +
        s"'$path') AS back FROM (SELECT 'in the café  x' AS t)")
      .head().getString(0)
    assert(rt == "in the café  x")
    // export half: round-trip through a written file
    val out = dir.resolve("exported.txt").toString
    Bpe.saveMergesTxt(spark, merges, out)
    assert(Bpe.loadMergesTxt(spark, out) == merges)
  }

  test("external vocab: vocab.json id remap — encode emits the " +
      "DEPLOYED tokenizer's id space under merges.txt + vocab.json") {
    val merges = Bpe.parseMergesTxt(mergesTxtSample.linesIterator)
    def render(hex: String): String = {
      val sb = new java.lang.StringBuilder
      hex.grouped(2).foreach(h =>
        sb.appendCodePoint(Bpe.ByteToUnicode(Integer.parseInt(h, 16))))
      sb.toString
    }
    // a vocab.json consistent with the sample merges, written by
    // Jackson so alphabet chars escape exactly as a publisher's
    // serializer would: byte b -> 1000+b, merge rank i -> 2000+i
    // (formulaic ids keep the hand-derivation below readable; real
    // vocabs assign base ids by alphabet sort order — either way the
    // remap is a pure table)
    val vm = new java.util.LinkedHashMap[String, Integer]()
    (0 until 256).foreach(b => vm.put(render(f"$b%02X"), 1000 + b))
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      vm.put(render(a + b), 2000 + i) }
    val json = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsBytes(vm)
    val vocab = Bpe.parseVocabJson(json)
    assert(vocab(f"${0x20}%02X") == 1000 + 0x20) // "Ġ" parsed back
    assert(vocab("2074") == 2000)                // "Ġt"
    val table = Bpe.externalIds(merges, vocab)
    assert(table(0x69) == 1000 + 0x69)  // base byte 'i'
    assert(table(256 + 6) == 2006)      // merge 6 = "Ġthe"
    assert(table(graft.functions.bpe.unkId(merges)) == -1)
    // the remapped stream IS the deployed id space: "in the" →
    // engine [259, 262] → external [2003, 2006]
    val ext = Seq(1).toDF("x").select(
      graft.functions.bpe.remapIds(
        graft.functions.bpe.encodeIds(lit("in the"), merges,
          gpt2Ws = true), table).as("ids")).head()
      .getAs[collection.Seq[Int]]("ids").toSeq
    assert(ext == Seq(2003, 2006), s"got $ext")
    // mixed releases refuse loudly: a vocab missing a reachable
    // token cannot half-load
    val missing = vocab - "2074"
    val err = intercept[IllegalArgumentException] {
      Bpe.externalIds(merges, missing) }
    assert(err.getMessage.contains("different releases"))
  }
}
