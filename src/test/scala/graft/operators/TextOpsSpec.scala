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
}
