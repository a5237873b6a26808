package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextHashesSpec extends SparkSpec {
  import spark.implicits._

  test("minhash signature: deterministic, right arity, set-not-order sensitive") {
    val df = Seq(
      ("a b c d e f g h", "a"),
      ("a b c d e f g h", "b"), // same content
      ("h g f e d c b a", "c"), // same 1-shingle set, different order
      ("x y z q r s t u", "d")
    ).toDF("text", "tag")
      .select(col("tag"),
        txt.minhash(transform(split(col("text"), " "), w => xxhash64(w)), 64)
          .as("sig"))
      .as[(String, Seq[Long])].collect().toMap
    assert(df("a").length == 64)
    assert(df("a") == df("b"))
    assert(df("a") == df("c")) // word-set identical => same signature
    assert(df("a") != df("d"))
  }

  test("minhash similarity estimates jaccard") {
    // 9 of 10 shared tokens => jaccard 9/11 ~ 0.82; 128-perm estimate
    // should land within +-0.15
    val t1 = (1 to 10).map(i => s"w$i").mkString(" ")
    val t2 = ((2 to 10).map(i => s"w$i") :+ "zz" :+ "yy").mkString(" ")
    val sigs = Seq(t1, t2).toDF("text")
      .select(txt.minhash(
        transform(split(col("text"), " "), w => xxhash64(w)), 128).as("sig"))
      .as[Seq[Long]].collect()
    val est = sigs(0).zip(sigs(1)).count { case (a, b) => a == b } / 128.0
    assert(math.abs(est - 9.0 / 12.0) < 0.15, s"estimate $est")
  }

  test("simhash: identical sets match, near sets are close, disjoint far") {
    def sig(words: String): Long =
      Seq(words).toDF("text")
        .select(txt.simhash(
          transform(split(col("text"), " "), w => xxhash64(w))).as("s"))
        .as[Long].head()
    val a = sig((1 to 40).map(i => s"w$i").mkString(" "))
    val b = sig(((1 to 38).map(i => s"w$i") :+ "x1" :+ "x2").mkString(" "))
    val c = sig((100 to 140).map(i => s"q$i").mkString(" "))
    assert(java.lang.Long.bitCount(a ^ b) < java.lang.Long.bitCount(a ^ c))
  }

  test("rolling fingerprint: content-sensitive, codegen matches interpreted") {
    val df = Seq("hello world", "hello worlD", "hello world").toDF("text")
      .select(txt.rollingFp(col("text")).as("fp"),
        txt.rollingWindowMin(col("text"), 4).as("wfp"))
      .as[(Long, Long)].collect()
    assert(df(0) == df(2))
    assert(df(0) != df(1))
    // window-min over a short doc falls back to whole-content mixing
    val short = Seq("ab").toDF("text")
      .select(txt.rollingWindowMin(col("text"), 4)).as[Long].head()
    assert(short != 0L)
  }

  test("rolling windows: n-w+1 positional hashes whose min is the " +
      "winnow value; short docs fall back to one whole-content hash") {
    val df = Seq("the quick brown fox", "ab")
      .toDF("text")
      .select(txt.rollingWindows(col("text"), 4).as("ws"),
        txt.rollingWindowMin(col("text"), 4).as("wmin"),
        txt.rollingFp(col("text")).as("fp"))
      .as[(Seq[Long], Long, Long)].collect()
    val (ws, wmin, _) = df(0)
    assert(ws.length == "the quick brown fox".length - 4 + 1)
    assert(ws.min == wmin)
    // identical 4-byte substrings hash identically at both positions
    val dup = Seq("abcdXabcd").toDF("text")
      .select(txt.rollingWindows(col("text"), 4)).as[Seq[Long]].head()
    assert(dup.head == dup.last)
    assert(dup.distinct.length == dup.length - 1)
    val (wsShort, wminShort, _) = df(1)
    assert(wsShort == Seq(wminShort)) // the mixed whole-content fp
  }

  test("cutWindows: merges overlapping spans, keeps outside bytes, " +
      "empty positions = identity, short dup doc trims to empty") {
    def cut(s: String, pos: Seq[Int], w: Int): String =
      Seq(s).toDF("text")
        .select(txt.cutWindows(col("text"), typedLit(pos), w))
        .as[String].head()
    assert(cut("abcdefghij", Seq(2, 4), 3) == "abhij") // [2,5)∪[4,7)=[2,7)
    assert(cut("abcdefghij", Seq(0, 7), 3) == "defg")  // disjoint spans
    assert(cut("abcdefghij", Seq.empty, 3) == "abcdefghij")
    assert(cut("ab", Seq(0), 3) == "")  // pseudo-window covers whole doc
    assert(cut("abcdefghij", Seq(7), 3) == "abcdefg") // span to the end
  }
}
