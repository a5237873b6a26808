package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("stats: counts on a crafted doc") {
    val df = Seq((1L, "Hello, world 42  ok")).toDF("doc_id", "text")
    val r = TextOps.stats(df, "doc_id", "text").head()
    assert(r.getAs[Long]("n_tokens") == 4)
    // Hello , world 42 ok
    assert(r.getAs[Long]("n_bpe_tokens") == 5)
    assert(r.getAs[Long]("n_punct") == 1)
    assert(r.getAs[Long]("n_digits") == 2)
    assert(r.getAs[Long]("n_spaces") == 4)
  }

  test("quality: in [0,1], diversity right on crafted docs") {
    val df = Seq(
      (1L, ("the quick brown fox " * 20).trim),   // diverse-ish, stopwords
      (2L, ("spam " * 40).trim)                    // repetitive, no stopwords
    ).toDF("doc_id", "text")
    val out = TextOps.quality(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.forall { r =>
      val q = r.getAs[Double]("quality"); q >= 0.0 && q <= 1.0 })
    assert(out(0).getAs[Double]("quality") > out(1).getAs[Double]("quality"))
    assert(out(1).getAs[Double]("diversity") == math.rint(1.0 / 40 * 1e6) / 1e6)
  }

  test("native punctCount == size(regexp_extract_all) on adversarial input") {
    val cases = Seq(
      "plain ascii words only",
      "punct! mid-word, and... (nested) [brackets] {braces} #tags",
      "tabs\tnewlines\nvtabformfeed\fcarriage\rspaces   end",
      "中文字符都算标点 per the regex class 的",
      "mixed 中en文 puncts!?;:", "",
      "emoji 😀 counts once", "1234567890", "!@#$%^&*()")
    val df = cases.toDF("text")
    val got = df.select(
      graft.functions.txt.punctCount(col("text")).as("native"),
      size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9\\s]"), lit(0)))
        .cast("long").as("regex"))
      .collect()
    got.zip(cases).foreach { case (r, s) =>
      assert(r.getLong(0) == r.getLong(1),
        s"punctCount mismatch on '$s': native=${r.getLong(0)} regex=${r.getLong(1)}")
    }
    // and on the real corpus, both quality paths agree end-to-end
    val docs = sf("documents")
    val native = TextOps.quality(docs, "doc_id", "text")
    val mismatches = docs.select(col("doc_id"),
        (graft.functions.txt.punctCount(col("text")) -
          size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9\\s]"), lit(0)))
            .cast("long")).as("d"))
      .filter(col("d") =!= 0).count()
    assert(mismatches == 0 && native.count() == docs.count())
  }

  test("charClassStats kernel == the split/regexp_extract_all chain it " +
      "replaced, on adversarial inputs and the sf corpus") {
    val cases = Seq(
      "plain ascii words only",
      "  leading and trailing spaces  ",
      "\ttab-led means a leading empty split element",
      "punct! mid-word, and... (nested) [brackets] ab12cd runs",
      "tabs\tnewlines\nvtabformfeed\fcarriage\rspaces   end",
      "中文字符都算标点 per the regex class 的",
      "mixed 中en文 puncts!?;: 99 bottles", "", "   ", " \t ",
      "emoji 😀 counts once", "1234567890", "!@#$%^&*()",
      "a", " a ", "a  b", "12ab34", "a1b2c3")
    val df = cases.toDF("text")
    def chain(t: org.apache.spark.sql.Column) = Seq(
      size(split(trim(t), "\\s+")).cast("long"),
      size(regexp_extract_all(t, lit(TextOps.BpeTokenRe), lit(0)))
        .cast("long"),
      size(regexp_extract_all(t, lit("[^a-zA-Z0-9\\s]"), lit(0)))
        .cast("long"),
      size(regexp_extract_all(t, lit("[0-9]"), lit(0))).cast("long"),
      (length(t) - length(regexp_replace(t, " ", ""))).cast("long"))
    val got = df.select(
      graft.functions.txt.charClassStats(col("text")).as("k"),
      array(chain(col("text")): _*).as("r")).collect()
    got.zip(cases).foreach { case (row, s) =>
      assert(row.getSeq[Long](0) == row.getSeq[Long](1),
        s"kernel mismatch on '$s': ${row.getSeq[Long](0)} != ${row.getSeq[Long](1)}")
    }
    // whole corpus: zero disagreements, any column
    val docs = sf("documents")
    val bad = docs.select(
        graft.functions.txt.charClassStats(col("text")).as("k"),
        array(chain(col("text")): _*).as("r"))
      .filter(col("k") =!= col("r")).count()
    assert(bad == 0, s"$bad corpus docs disagree with the regex chain")
  }

  test("langid: marker argmax with fixed tie order, unknown on zero hits") {
    val df = Seq(
      (1L, "xx", "the cat and the hat is on the mat"),
      (2L, "xx", "der hund und die katze ist nicht da"),
      (3L, "xx", "zzz qqq www")
    ).toDF("doc_id", "lang", "text")
    val out = TextOps.langId(df, "doc_id", "text", "lang")
      .orderBy("doc_id").select("pred_lang").as[String].collect()
    assert(out.toSeq == Seq("en", "de", "unknown"))
  }

  test("repetition: crafted docs hit exact fractions and run lengths") {
    val df = Seq(
      (1L, "a a b a b b b"), // a:3 b:4; bigrams aa ab ba ab bb bb; runs 2,1,1,3
      (2L, "x"),             // single token: no bigrams, run of 1
      (3L, "go go go go")    // pure boilerplate: everything maxed
    ).toDF("doc_id", "text")
    val out = TextOps.repetition(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("n_tokens") == 7)
    assert(r1.getAs[Double]("top_token_frac") == 0.571429) // round(4/7, 6)
    assert(r1.getAs[Double]("top_bigram_frac") == 0.333333) // round(2/6, 6)
    assert(r1.getAs[Long]("max_run") == 3)
    val r2 = out(1)
    assert(r2.getAs[Long]("n_tokens") == 1 &&
      r2.getAs[Double]("top_bigram_frac") == 0.0 &&
      r2.getAs[Long]("max_run") == 1)
    val r3 = out(2)
    assert(r3.getAs[Double]("top_token_frac") == 1.0 &&
      r3.getAs[Double]("top_bigram_frac") == 1.0 &&
      r3.getAs[Long]("max_run") == 4)
  }

  test("fingerprint stats count duplicates per source") {
    val df = Seq(
      (1L, "s1", "aaa"), (2L, "s1", "aaa"), (3L, "s1", "bbb"),
      (4L, "s2", "ccc")
    ).toDF("doc_id", "source", "text")
    val out = TextOps.fingerprintStats(df, "doc_id", "text", "source")
      .orderBy("source").collect()
    assert(out(0).getAs[Long]("n_docs") == 3)
    assert(out(0).getAs[Long]("n_distinct") == 2)
    assert(out(0).getAs[Long]("n_dup_docs") == 1)
    assert(out(1).getAs[Long]("n_dup_docs") == 0)
  }

  test("piiScan: detects and redacts emails, ips, phones; leaves " +
      "look-alikes alone") {
    val df = Seq(
      (1L, "mail a.b-c%d+1@sub.example.org and x@y.co here"),
      (2L, "hosts 10.0.0.1 and 255.255.255.255, version 1.2 is not one"),
      (3L, "call +44-123-4567 or 1-555-123 4567"),
      (4L, "serial 000000001 and a@b and plain words stay put"),
      (5L, "mixed j.doe@corp.io at 192.168.1.7 tel +1-800-0042 done")
    ).toDF("doc_id", "text")
    val out = TextOps.piiScan(df, "doc_id", "text").orderBy("doc_id")
      .collect()
    def row(i: Int) = (out(i).getAs[Long]("n_emails"),
      out(i).getAs[Long]("n_ips"), out(i).getAs[Long]("n_phones"),
      out(i).getAs[String]("clean_text"))
    assert(row(0) == (2L, 0L, 0L,
      "mail <EMAIL> and <EMAIL> here"))
    // "version 1.2" lacks the 4 dotted quads -> not an IP
    assert(row(1) == (0L, 2L, 0L,
      "hosts <IP> and <IP>, version 1.2 is not one"))
    // "1-555-123 4567": leftmost phone match consumes "1-555-123",
    // leaving " 4567" — exactly what the naive C4-style regex does
    assert(row(2) == (0L, 0L, 2L, "call <PHONE> or <PHONE> 4567"))
    // a bare digit run is not a phone (needs separators); "a@b" has no
    // dotted TLD so it is not an email
    assert(row(3) == (0L, 0L, 0L,
      "serial 000000001 and a@b and plain words stay put"))
    assert(row(4) == (1L, 1L, 1L,
      "mixed <EMAIL> at <IP> tel <PHONE> done"))
  }

  test("classify: disjoint-vocabulary classes separate exactly; " +
      "bit-identical under repartitioning") {
    // good docs: in-range length, stopwords, low punctuation -> label
    // true; bad docs: short, punctuation-heavy -> label false. The
    // vocabularies are disjoint, so every good-doc bucket weight lands
    // above the neutral center and every bad-doc one below.
    val good = (0 until 6).map(i => (i.toLong,
      ("the quick brown fox jumps over a lazy dog and runs to the " +
        s"green field number$i ") * 3))
    val bad = (6 until 10).map(i => (i.toLong, s"!!! ??? ;;; ### $$$i"))
    val df = (good ++ bad).toDF("doc_id", "text")
    val out = TextOps.classify(df, "doc_id", "text").orderBy("doc_id")
      .collect()
    out.foreach { r =>
      assert(r.getAs[Boolean]("pred") == r.getAs[Boolean]("weak_label"),
        s"doc ${r.getAs[Long]("doc_id")} pred != label")
      assert(r.getAs[Long]("n_feat") > 0)
    }
    assert(out.count(_.getAs[Boolean]("weak_label")) == 6)
    // determinism: a different partitioning must not move one bit
    val out2 = TextOps.classify(df.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.toSeq.toList).toList == out2.map(_.toSeq.toList).toList)
  }

  test("wordShingleSeq: positional multiset; distinct-sorted view equals " +
      "the set kernel") {
    import graft.functions.txt
    val df = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    val r = df.select(
      txt.wordShingleSeq(col("text"), 2).as("seq"),
      txt.wordShingleHashes(col("text"), 2).as("set")).head()
    val seq = r.getSeq[Long](0)
    val set = r.getSeq[Long](1)
    // 4 bigram positions: ab, ba, ab, ba — two distinct values, order
    // preserved, duplicates retained
    assert(seq.length == 4)
    assert(seq(0) == seq(2) && seq(1) == seq(3) && seq(0) != seq(1))
    assert(seq.distinct.sorted == set.sorted && set.length == 2)
  }

  test("lmScore: reference-like transitions score high, scrambled ones low; " +
      "short docs are null-safe") {
    // reference slice: docs with repeated canonical transitions; the
    // in-domain doc reuses them, the out-of-domain doc uses unseen words
    val docs = Seq(
      (0L, "the cat sat on the mat", "en"),
      (1L, "the cat sat on the mat", "en"),
      (2L, "the cat sat on the mat", "en"),
      (3L, "the cat sat on the mat", "xx"),   // in-domain, not in ref
      (4L, "zq wv xj qk vz jx", "xx"),        // gibberish transitions
      (5L, "one", "xx"),                      // no bigrams -> null score
      (6L, "", "xx"))
      .toDF("doc_id", "text", "lang")
    val got = TextOps.lmScore(docs, "doc_id", "text", col("lang") === "en")
      .orderBy("doc_id").collect()
    val score = got.map(r =>
      if (r.isNullAt(r.fieldIndex("lm_score"))) None
      else Some(r.getAs[Long]("lm_score"))).toSeq
    assert(score(3).get == score(0).get,
      "same text must score identically whether or not it was in the ref")
    assert(score(3).get > score(4).get,
      s"in-domain must out-score gibberish: $score")
    assert(score(5).isEmpty && score(6).isEmpty, "no bigrams -> null")
    // determinism under repartitioning: the integer grid leaves no
    // float-summation-order surface
    val re = TextOps.lmScore(docs.repartition(7), "doc_id", "text",
      col("lang") === "en").orderBy("doc_id").collect()
    assert(got.map(_.toString).toSeq == re.map(_.toString).toSeq)
  }

  test("classify: sampled training (trainMod / maxTrain) scores every " +
      "doc from an id-mod training slice") {
    val docs = sf("documents")
    val full = TextOps.classify(docs, "doc_id", "text").orderBy("doc_id")
      .collect()
    // trainMod=2: weights fit on the even-id half; scoring still covers
    // the whole corpus and labels are per-doc (training-independent)
    val half = TextOps.classify(docs, "doc_id", "text", trainMod = 2)
      .orderBy("doc_id").collect()
    assert(half.length == full.length)
    assert(half.map(_.getAs[Boolean]("weak_label")).toSeq ==
      full.map(_.getAs[Boolean]("weak_label")).toSeq)
    // the shared-vocabulary corpus trains nearly the same weights on
    // half the docs: predictions should agree on the large majority
    val agree = half.zip(full).count { case (a, b) =>
      a.getAs[Boolean]("pred") == b.getAs[Boolean]("pred") }
    assert(agree.toDouble / full.length >= 0.8,
      s"sampled-training agreement ${agree.toDouble / full.length}")
    // but the sample must actually bind: some score differs
    assert(half.zip(full).exists { case (a, b) =>
      a.getAs[Long]("score_q") != b.getAs[Long]("score_q") })
    // maxTrain caps via the count-derived modulus (500 docs / 100 ->
    // em = 5) and is deterministic under repartitioning
    val capped = TextOps.classify(docs, "doc_id", "text", maxTrain = 100)
      .orderBy("doc_id").collect()
    assert(capped.length == full.length)
    val capped2 = TextOps.classify(docs.repartition(7), "doc_id", "text",
      maxTrain = 100).orderBy("doc_id").collect()
    assert(capped.map(_.toSeq.toList).toList ==
      capped2.map(_.toSeq.toList).toList)
  }

  test("entropy: grid values exact on crafted docs, ordering sane, " +
      "repartition-invariant") {
    val docs = Seq(
      (0L, "aaaa"),                   // one symbol -> 0 bits
      (1L, "abab"),                   // two equal symbols -> exactly 1 bit
      (2L, "abcdabcd"),               // four equal symbols -> exactly 2 bits
      (3L, "the quick brown fox jumps over the lazy dog 0123456789"),
      (4L, ",,,, !!!!"),              // no alphanumerics -> n=0, ent 0
      (5L, ""))
      .toDF("doc_id", "text")
    val got = TextOps.entropy(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    def ent(i: Int) = got(i).getAs[Long]("ent_scaled")
    assert(ent(0) == 0L)
    // counts c=2, n=4: q = 512, LUT(512) = 2^20 exactly -> 1.0 bits
    assert(ent(1) == 1048576L, s"abab must be exactly 1 bit, got ${ent(1)}")
    assert(got(1).getAs[Double]("ent_bits") == 1.0)
    assert(ent(2) == 2L * 1048576L, "abcdabcd must be exactly 2 bits")
    assert(ent(3) > ent(2), "pangram+digits must out-score 4 symbols")
    assert(ent(4) == 0L && got(4).getAs[Long]("n_alnum") == 0L)
    assert(ent(5) == 0L)
    assert(got(3).getAs[Long]("n_distinct") == 36L) // pangram + 10 digits
    val re = TextOps.entropy(docs.repartition(5), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.map(_.toString).toSeq == re.map(_.toString).toSeq,
      "integer grid must be partitioning-independent")
    // fused kernel vs a straight Scala recount on adversarial input:
    // case folds, digits, unicode skipped, whitespace/punct ignored
    val adversarial = Seq("MiXeD CaSe 123", "中文 only 中文", "ÀÉÎ øü",
      "a" * 5000 + "B" * 5000, "\t\n  ", "0012300")
    adversarial.zipWithIndex.foreach { case (s, i) =>
      val r = TextOps.entropy(Seq((i.toLong, s)).toDF("doc_id", "text"),
        "doc_id", "text").head()
      val folded = s.filter(_ < 128).toLowerCase.filter(c =>
        c.isDigit || (c >= 'a' && c <= 'z'))
      val counts = folded.groupBy(identity).map(_._2.length.toLong)
      val n = folded.length.toLong
      val want =
        if (n == 0) 0L
        else counts.map(c => c * TextOps.EntropyLut(
          (math.max(1L, c * 1024 / n) - 1).toInt)).sum / n
      assert(r.getAs[Long]("n_alnum") == n &&
        r.getAs[Long]("ent_scaled") == want,
        s"kernel mismatch on '$s'")
    }
  }

  test("dsir: target-like docs select, pool-typical docs don't; votes " +
      "match a driver-side sign-rule replay; repartition-invariant") {
    val B = 128 // small smoothing so a tiny fixture's counts dominate
    // target slice: canonical transitions; the pool is dominated by a
    // different phrase, so its bigrams are source-likelier
    val docs = (
      (0L to 2L).map(i => (i, "the cat sat on the mat", "en")) ++
      (3L to 9L).map(i => (i, "buy cheap pills online now fast", "xx")) ++
      Seq((10L, "the cat sat on the mat", "xx"),     // target-like, unlabeled
          (11L, "buy cheap pills online now fast", "xx"),
          (12L, "one", "xx")))                        // no bigrams
      .toDF("doc_id", "text", "lang")
    // driver-side replay with the REAL hash kernel: per-doc bucket
    // sequences, bucket count tables, the exact sign rule
    val grams: Map[Long, Seq[Long]] = docs
      .select(col("doc_id"),
        graft.functions.txt.wordShingleSeq(col("text"), 2).as("g"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Seq[Long]]("g").map(h => h & (B - 1))).toMap
    val enIds = (0L to 2L).toSet
    def counts(ids: Iterable[Long]): Map[Long, Long] =
      ids.toSeq.flatMap(grams).groupBy(identity)
        .map { case (b, o) => b -> o.size.toLong }
    val cT = counts(grams.keys.filter(enIds)); val cS = counts(grams.keys)
    val tT = cT.values.sum + B; val tS = cS.values.sum + B
    def expVote(id: Long): Long = grams(id).map { b =>
      val l = (cT.getOrElse(b, 0L) + 1) * tS
      val r = (cS.getOrElse(b, 0L) + 1) * tT
      if (l > r) 1L else if (l < r) -1L else 0L
    }.sum
    val got = TextOps.dsir(docs, "doc_id", "text", col("lang") === "en",
      bigBuckets = B).orderBy("doc_id").collect()
    val byId = got.map(r => r.getAs[Long]("doc_id") -> r).toMap
    got.filter(_.getAs[Long]("n_bigrams") > 0).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("dsir_vote") == expVote(id),
        s"doc $id vote != driver replay")
    }
    assert(byId(10L).getAs[Boolean]("selected"),
      s"target-like doc must be selected (vote ${expVote(10L)})")
    assert(!byId(11L).getAs[Boolean]("selected"),
      s"pool-typical doc must not be selected (vote ${expVote(11L)})")
    assert(!byId(12L).getAs[Boolean]("selected") &&
      byId(12L).isNullAt(byId(12L).fieldIndex("dsir_vote")),
      "no-bigram doc: null vote, not selected")
    val re = TextOps.dsir(docs.repartition(7), "doc_id", "text",
      col("lang") === "en", bigBuckets = B).orderBy("doc_id").collect()
    assert(got.map(_.toString).toSeq == re.map(_.toString).toSeq)
  }

  test("corpusTokenizerStats: per-lang totals equal per-doc kernel " +
      "sums, ratios reconcile, every lang covered once") {
    val docs = sf("documents")
    val got = graft.queries.Pipeline.corpusTokenizerStats(docs).collect()
    val perDoc = docs.select(col("lang"),
        length(col("text")).cast("long").as("nc"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("nw"),
        graft.functions.bpe.tokenCount(col("text"),
          graft.operators.Bpe.frozenMerges).as("nt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val expect = perDoc.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (lang, rs) => (lang, rs.length.toLong, rs.map(_._2).sum,
        rs.map(_._3).sum, rs.map(_._4).sum)
    }
    assert(got.map(r => (r.getString(0), r.getAs[Long]("n_docs"),
      r.getAs[Long]("n_chars"), r.getAs[Long]("n_words"),
      r.getAs[Long]("n_tokens"))).toSeq == expect)
    got.foreach { r =>
      val (nc, nw, nt) = (r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"))
      assert(math.abs(r.getAs[Double]("chars_per_token") -
        (math.rint(nc.toDouble / nt * 1e6) / 1e6)) < 1e-9)
      assert(math.abs(r.getAs[Double]("tokens_per_word") -
        (math.rint(nt.toDouble / nw * 1e6) / 1e6)) < 1e-9)
      assert(nt >= nw, "BPE splits words, never merges across them")
    }
  }


  test("corpusLengthStats: percentiles are monotone and interpolate " +
      "exactly; approx mode tracks exact; totals reconcile") {
    val docs = sf("documents")
    val got = graft.queries.Pipeline.corpusLengthStats(docs).collect()
    assert(got.map(_.getAs[Long]("n_docs")).sum == docs.count())
    got.foreach { r =>
      val seqv = Seq(r.getAs[Long]("min_tokens").toDouble,
        r.getAs[Double]("p25"), r.getAs[Double]("p50"),
        r.getAs[Double]("p75"), r.getAs[Double]("p95"),
        r.getAs[Long]("max_tokens").toDouble)
      assert(seqv.zip(seqv.tail).forall { case (a, b) => a <= b },
        s"percentiles must be monotone: $seqv")
    }
    // exact interpolation on a crafted group: lengths 1,2,3,4 words of
    // single chars -> 1,2,3,4 BPE tokens; p50 = 2.5, p25 = 1.75
    val tiny = Seq((1L, "a", "s"), (2L, "a b", "s"), (3L, "a b c", "s"),
      (4L, "a b c d", "s")).toDF("doc_id", "text", "source")
    val t = graft.queries.Pipeline.corpusLengthStats(tiny).collect()(0)
    assert(t.getAs[Double]("p50") == 2.5 && t.getAs[Double]("p25") == 1.75,
      s"interpolated percentiles drifted: $t")
    // the 100-TB mode stays close to exact on the real corpus
    val approx = graft.queries.Pipeline
      .corpusLengthStats(docs, exact = false).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("p50")).toMap
    got.foreach { r =>
      val d = math.abs(approx(r.getAs[String]("source")) -
        r.getAs[Double]("p50"))
      assert(d <= 2.0, s"approx p50 drifted by $d")
    }
  }

}
