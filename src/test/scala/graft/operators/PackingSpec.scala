package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 200L).map(i => (i, 1L + (i * 37) % 500))

  test("start_tok is the exact exclusive prefix sum; offsets in range") {
    val out = Packing.packSequences(docs.toDF("doc_id", "n_tokens"),
        "doc_id", "n_tokens", budget = 1000L, numPartitions = 7)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "start_tok", "seq_id", "offset")
      .as[(Long, Long, Long, Long, Long)].collect()
    val expectedStarts = docs.map(_._2).scanLeft(0L)(_ + _).init
    out.zip(expectedStarts).foreach { case ((id, n, start, seq, off), exp) =>
      assert(start == exp, s"doc $id")
      assert(seq == start / 1000 && off == start % 1000)
      assert(off >= 0 && off < 1000)
    }
    // packing is gapless: total layout length = total tokens
    assert(out.last._3 + out.last._2 == docs.map(_._2).sum)
  }

  test("result is independent of partitioning (two-phase scan is exact)") {
    val df = docs.toDF("doc_id", "n_tokens")
    val one = Packing.packSequences(df, "doc_id", "n_tokens", 512L,
      numPartitions = 1).orderBy("doc_id").collect()
    val many = Packing.packSequences(df.repartition(13), "doc_id",
      "n_tokens", 512L, numPartitions = 11).orderBy("doc_id").collect()
    assert(one.toSeq == many.toSeq)
  }
}
