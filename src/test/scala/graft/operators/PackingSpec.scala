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

  test("sequenceSpans: spans tile each sequence gaplessly, reassemble " +
      "every doc exactly, and zero-token docs emit nothing") {
    val budget = 100L
    val data = Seq((0L, 40L), (1L, 0L), (2L, 250L), (3L, 10L), (4L, 100L))
    val out = Packing.sequenceSpans(data.toDF("doc_id", "n_tokens"),
        "doc_id", "n_tokens", budget, numPartitions = 3)
      .orderBy("seq_id", "offset")
      .select("seq_id", "doc_id", "offset", "span_len", "pos_in_doc")
      .as[(Long, Long, Long, Long, Long)].collect()
    // doc 1 (0 tokens) never appears
    assert(!out.exists(_._2 == 1L))
    // per-doc reassembly: spans in pos_in_doc order concatenate to the doc
    data.filter(_._2 > 0).foreach { case (id, n) =>
      val spans = out.filter(_._2 == id).sortBy(_._5)
      assert(spans.map(_._4).sum == n, s"doc $id length")
      var pos = 0L
      spans.foreach { s => assert(s._5 == pos, s"doc $id resume"); pos += s._4 }
    }
    // per-sequence tiling: offsets are gapless from 0, never past budget
    out.groupBy(_._1).foreach { case (seq, spans) =>
      var cur = 0L
      spans.sortBy(_._3).foreach { s =>
        assert(s._3 == cur, s"seq $seq gap at ${s._3}")
        cur += s._4
      }
      assert(cur <= budget)
    }
    // doc 2 (250 tokens from start 40) straddles: spans 60 + 100 + 90
    assert(out.filter(_._2 == 2L).sortBy(_._5).map(_._4).toSeq ==
      Seq(60L, 100L, 90L))
  }

  test("result is independent of partitioning (two-phase scan is exact)") {
    val df = docs.toDF("doc_id", "n_tokens")
    val one = Packing.packSequences(df, "doc_id", "n_tokens", 512L,
      numPartitions = 1).orderBy("doc_id").collect()
    val many = Packing.packSequences(df.repartition(13), "doc_id",
      "n_tokens", 512L, numPartitions = 11).orderBy("doc_id").collect()
    assert(one.toSeq == many.toSeq)
  }

  test("packSequences carryCols ride through unchanged and never " +
      "perturb the layout") {
    val df = docs.toDF("doc_id", "n_tokens")
      .withColumn("src", concat(lit("s"), pmod(col("doc_id"), lit(3))))
    def layout(d: org.apache.spark.sql.DataFrame) = d
      .select("doc_id", "start_tok", "seq_id", "offset")
      .orderBy("doc_id").collect().toSeq
    val plain = Packing.packSequences(df, "doc_id", "n_tokens", 1000L,
      numPartitions = 7)
    val carried = Packing.packSequences(df, "doc_id", "n_tokens", 1000L,
      numPartitions = 7, carryCols = Seq("src"))
    assert(layout(plain) == layout(carried))
    carried.select("doc_id", "src").as[(Long, String)].collect()
      .foreach { case (id, s) => assert(s == "s" + (id % 3)) }
  }

  test("tokenChunks: windows are exact array slices, cover every " +
      "position, and the scalar summary matches the slice") {
    val chunkTok = 8
    val stride = 6
    val data = Seq(
      0L -> Array.empty[Int],
      1L -> Array(7),
      2L -> (1 to 5).toArray,
      3L -> (10 until 18).toArray, // exactly one full window
      4L -> (0 until 13).toArray, // tail window shorter than overlap
      5L -> (100 until 120).toArray) // several windows
    val out = Packing.tokenChunks(
        data.toDF("doc_id", "ids"), "doc_id", "ids", chunkTok, stride)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "tok_start", "n_tok", "first_id",
        "last_id", "id_wsum", "chunk")
      .as[(Long, Int, Int, Int, Int, Int, Long, Seq[Int])].collect()
    assert(!out.exists(_._1 == 0L), "empty doc emits nothing")
    data.filter(_._2.nonEmpty).foreach { case (id, ids) =>
      val rows = out.filter(_._1 == id).sortBy(_._2)
      val expStarts = 0 until ids.length by stride
      assert(rows.map(_._3).toSeq == expStarts.toSeq, s"doc $id starts")
      rows.foreach { case (_, ci, start, n, first, last, wsum, chunk) =>
        val exp = ids.slice(start, start + chunkTok).toSeq
        assert(chunk == exp, s"doc $id chunk $ci content")
        assert(ci == start / stride && n == exp.length)
        assert(first == exp.head && last == exp.last)
        assert(wsum ==
          exp.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum)
      }
      // coverage: every token position falls in some window
      val covered = rows.flatMap(r => r._3 until (r._3 + r._4)).toSet
      assert(covered == ids.indices.toSet, s"doc $id coverage")
    }
    // stride == chunkTok partitions the stream: no overlap, exact tiling
    val part = Packing.tokenChunks(
        data.toDF("doc_id", "ids"), "doc_id", "ids", 6, 6)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk").as[(Long, Seq[Int])].collect()
    data.filter(_._2.nonEmpty).foreach { case (id, ids) =>
      assert(part.filter(_._1 == id).flatMap(_._2).toSeq == ids.toSeq,
        s"doc $id tiling")
    }
  }

  test("packTokenIds: every sequence is exactly budget tokens except " +
      "the last, and the gathered sequences concatenate to the doc-order " +
      "id stream (straddle case pinned)") {
    // 60 + 100 + 90 over budget 100: doc 2 straddles the first cut,
    // doc 3 the second; doc 4 is empty and must vanish
    val docs = Seq(
      (1L, (1 to 60).toSeq),
      (2L, (61 to 160).toSeq),
      (3L, (161 to 250).toSeq),
      (4L, Seq.empty[Int]))
    val df = docs.toDF("doc_id", "ids")
    val out = Packing.packTokenIds(df, "doc_id", "ids", budget = 100L)
      .orderBy("seq_id")
      .as[(Long, Long, Seq[Int])].collect()
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(out.map(_._2).toSeq == Seq(100L, 100L, 50L),
      "full sequences then the short tail")
    assert(out.forall { case (_, n, ids) => ids.length.toLong == n })
    // the straddle: seq 0 = doc1 + doc2's first 40; seq 1 = doc2's
    // last 60 + doc3's first 40; seq 2 = doc3's last 50
    assert(out(0)._3 == (1 to 100).toSeq)
    assert(out(1)._3 == (101 to 200).toSeq)
    assert(out(2)._3 == (201 to 250).toSeq)
    // global invariant, re-stated directly: concatenation in seq order
    // IS the doc-order concatenation
    assert(out.flatMap(_._3).toSeq == (1 to 250).toSeq)
    // partitioning independence (the C11 two-phase scan underneath)
    val re = Packing.packTokenIds(df.repartition(7), "doc_id", "ids",
        budget = 100L)
      .orderBy("seq_id").as[(Long, Long, Seq[Int])].collect()
    assert(re.toSeq == out.toSeq)
  }
}
