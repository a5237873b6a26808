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

  test("packTokenIds with eosId/bosId: separators wrap every doc's " +
      "stream (empty docs included) before the layout, and the " +
      "separator-free form is unchanged") {
    val docs = Seq(
      (1L, (1 to 60).toSeq),
      (2L, (61 to 160).toSeq),
      (3L, Seq.empty[Int]))
    val df = docs.toDF("doc_id", "ids")
    val EOS = 999
    val BOS = 998
    val out = Packing.packTokenIds(df, "doc_id", "ids", budget = 100L,
        eosId = Some(EOS))
      .orderBy("seq_id").as[(Long, Long, Seq[Int])].collect()
    val stream = out.flatMap(_._3).toSeq
    // the packed stream IS the doc-order concatenation of
    // (ids :+ EOS) per doc — the empty doc still emits its boundary
    assert(stream ==
      ((1 to 60) ++ Seq(EOS) ++ (61 to 160) ++ Seq(EOS, EOS)).toSeq)
    assert(stream.count(_ == EOS) == docs.length,
      "one boundary per document, empty docs included")
    assert(out.map(_._2).sum == 160L + docs.length,
      "token accounting includes the separators")
    // BOS+EOS: every doc contributes [BOS] ++ ids ++ [EOS]
    val both = Packing.packTokenIds(df, "doc_id", "ids", budget = 100L,
        bosId = Some(BOS), eosId = Some(EOS))
      .orderBy("seq_id").as[(Long, Long, Seq[Int])].collect()
      .flatMap(_._3).toSeq
    assert(both == (Seq(BOS) ++ (1 to 60) ++ Seq(EOS, BOS) ++
      (61 to 160) ++ Seq(EOS, BOS, EOS)).toSeq)
    // None/None is byte-identical to the plain form
    val plain = Packing.packTokenIds(df, "doc_id", "ids", budget = 100L)
      .orderBy("seq_id").as[(Long, Long, Seq[Int])].collect()
    assert(plain.flatMap(_._3).toSeq == ((1 to 160)).toSeq)
    // emptiness arriving as SQL NULL (a nulls-instead-of-[] schema) is
    // the same boundary contract: concat(NULL, [eos]) must not eat the
    // doc's separator
    val withNull = spark.sql(
      "SELECT 1L AS doc_id, array(1, 2) AS ids " +
        "UNION ALL SELECT 2L, CAST(NULL AS ARRAY<INT>) " +
        "UNION ALL SELECT 3L, array(3)")
    val nullOut = Packing.packTokenIds(withNull, "doc_id", "ids",
        budget = 100L, bosId = Some(BOS), eosId = Some(EOS))
      .orderBy("seq_id").as[(Long, Long, Seq[Int])].collect()
      .flatMap(_._3).toSeq
    assert(nullOut == Seq(BOS, 1, 2, EOS, BOS, EOS, BOS, 3, EOS),
      s"a NULL ids doc still emits its separators, got $nullOut")
  }

  test("exportTokenShards: contiguous range shards reconcile file-for-" +
      "file with the packed rows, manifest numbers match the files, " +
      "and shard order concatenates to training order") {
    // 23 sequences over 4 shards: ceil = 6, so ranges 0-5/6-11/12-17/
    // 18-22 — the last shard is short, the general case
    val docs = (1L to 23L).map(i =>
      (i, ((i * 100) until (i * 100 + 100)).map(_.toInt)))
    val df = docs.toDF("doc_id", "ids")
    val packed = Packing.packTokenIds(df, "doc_id", "ids", budget = 100L)
    val dir = java.nio.file.Files.createTempDirectory("tok_shards").toString
    val manifest = Packing.exportTokenShards(packed, dir, shards = 4)
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(manifest.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(manifest.map(_._2).toSeq == Seq(6L, 6L, 6L, 5L),
      "ceil-sized ranges with a short tail shard")
    assert(manifest.forall { case (s, _, _, first, last) =>
      first == s * 6L && last == first + (if (s == 3) 4 else 5) },
      "shards must be contiguous seq_id ranges")
    // file reconciliation: the partition-discovering read returns
    // exactly the packed rows, and each shard dir holds its range
    val back = spark.read.parquet(dir)
    assert(back.select("seq_id", "n_tokens", "ids")
        .as[(Long, Long, Seq[Int])].collect().toSet ==
      packed.as[(Long, Long, Seq[Int])].collect().toSet,
      "read-back must equal the packed rows (the _manifest dir is " +
        "invisible to partition discovery)")
    val shard2 = spark.read.parquet(s"$dir/shard=2")
      .select("seq_id").as[Long].collect().sorted.toSeq
    assert(shard2 == (12L to 17L).toSeq, "shard dir holds its range")
    // manifest token totals equal the actual files' totals
    val fileTotals = back.groupBy("shard")
      .agg(sum("n_tokens").as("t")).as[(Int, Long)].collect().toMap
    assert(manifest.forall { case (s, _, t, _, _) => fileTotals(s) == t })
    // concatenating shards 0..3, each sorted by seq_id, IS training
    // order 0..22
    val streamOrder = (0 to 3).flatMap(s =>
      spark.read.parquet(s"$dir/shard=$s")
        .select("seq_id").as[Long].collect().sorted)
    assert(streamOrder == (0L until 23L).toSeq)
  }

  test("packingStats: per-sequence census equals a driver-side roll-up " +
      "of the span table, carry-in marks exactly the mid-doc openers") {
    val docs = sf("documents")
    val spans = graft.queries.Pipeline.seqSpans(docs).collect()
      .map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("offset"), r.getAs[Long]("span_len"),
        r.getAs[Long]("pos_in_doc")))
    val expect = spans.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (seq, ss) => (seq, ss.length.toLong, ss.map(_._4).sum,
        if (ss.exists(s => s._3 == 0 && s._5 > 0)) 1L else 0L,
        ss.map(_._2).min, ss.map(_._2).max)
    }
    val got = graft.queries.Pipeline.packingStats(docs).collect()
      .map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("carry_in"),
        r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))
    assert(got.toSeq == expect, s"stats drifted from the span table")
    // every full sequence holds exactly the budget; only the tail may be short
    val full = got.dropRight(1)
    assert(full.forall(_._3 == 2048L), "interior sequences must be full")
    // a carry-in sequence's first doc continues from the previous row
    got.sliding(2).foreach {
      case Array(prev, cur) if cur._4 == 1L =>
        assert(prev._6 == cur._5,
          s"carry-in seq ${cur._1} must open with the previous tail doc")
      case _ =>
    }
  }

}
