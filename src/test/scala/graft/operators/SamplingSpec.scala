package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = sf("documents")

  test("hexThreshold quantizes fractions onto the 16-bit key space") {
    assert(Sampling.hexThreshold(0.0) == "0000")
    assert(Sampling.hexThreshold(0.5) == "8000")
    assert(Sampling.hexThreshold(0.8) == "cccc")
    // 1.0 must sort after every hex key, including "ffff..." prefixes
    assert(Sampling.hexThreshold(1.0) == "g")
    assert("ffff" < Sampling.hexThreshold(1.0))
  }

  test("split covers every row, is deterministic, and tracks weights") {
    val out = Sampling.deterministicSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val n = docs.count()
    assert(out.count() == n) // total preserved, no rounding gap
    val byName = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(byName.keySet == Set("train", "val", "test"))
    // 16-bit uniform key: expect ~binomial; allow wide tolerance at n=50
    assert(byName("train") > n / 2)
    // rerun is bit-identical
    val again = Sampling.deterministicSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("different seeds give different assignments") {
    val a = Sampling.deterministicSplit(docs, "doc_id",
      Seq("x" -> 0.5, "y" -> 0.5), seed = 1L)
    val b = Sampling.deterministicSplit(docs, "doc_id",
      Seq("x" -> 0.5, "y" -> 0.5), seed = 2L)
    assert(a.join(b, Seq("doc_id"))
      .filter(a("split") =!= b("split")).count() > 0)
  }

  test("stratified sample only keeps listed fractions per stratum") {
    val out = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0), default = 0.0)
    // en fully kept, every other stratum dropped
    val langs = out.select("lang").distinct().as[String].collect().toSet
    assert(langs == Set("en"))
    assert(out.count() == docs.filter($"lang" === "en").count())
  }

  test("split membership is stable under repartitioning") {
    val base = Sampling.deterministicSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.2)).select("doc_id", "split")
    val shuffled = Sampling.deterministicSplit(docs.repartition(13), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.2)).select("doc_id", "split")
    assert(base.except(shuffled).isEmpty && shuffled.except(base).isEmpty)
  }
}
