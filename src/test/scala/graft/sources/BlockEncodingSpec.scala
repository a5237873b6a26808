package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import graft.sources.HFile.{HCell, compareCells}
import org.scalatest.funsuite.AnyFunSuite

/** Direct encoder/decoder coverage for [[BlockEncoding]], independent of
  * the file framing (HFileSpec covers that): wire primitives and the
  * cell-stream edge cases a real cluster produces — negative and huge
  * timestamps (the 8-byte `longFitsIn` path), empty values, shared-value
  * runs, single-cell blocks, tags/mvcc appendices.
  */
class BlockEncodingSpec extends AnyFunSuite {

  private def roundTrip(cells: Seq[HCell], encoding: Int,
                        layout: HFileReader.CellLayout =
                          HFileReader.PlainLayout): Seq[HCell] = {
    val baos = new ByteArrayOutputStream()
    val out = new DataOutputStream(baos)
    val enc = new BlockEncoding.Encoder(encoding, layout)
    cells.foreach(enc.encode(_, out))
    BlockEncoding.decode(encoding, baos.toByteArray, layout).toSeq
  }

  private def assertSame(a: Seq[HCell], b: Seq[HCell]): Unit = {
    assert(a.size == b.size)
    a.zip(b).foreach { case (x, y) =>
      assert(compareCells(x, y) == 0 && x.value.sameElements(y.value) &&
        x.tags.sameElements(y.tags) && x.mvcc == y.mvcc,
        s"cell mismatch: $x vs $y")
    }
  }

  test("compressed int: LEB128 round-trip across the range") {
    for (v <- Seq(0, 1, 0x7f, 0x80, 300, 16383, 16384, Int.MaxValue)) {
      val baos = new ByteArrayOutputStream()
      BlockEncoding.putCompressedInt(new DataOutputStream(baos), v)
      assert(BlockEncoding.readCompressedInt(
        ByteBuffer.wrap(baos.toByteArray)) == v, s"v=$v")
    }
  }

  test("putLong/longFitsIn: minimal little-endian bytes, negatives take 8") {
    for (v <- Seq(0L, 1L, 255L, 256L, 65535L, 1L << 40, Long.MaxValue,
                  -1L, Long.MinValue)) {
      val fit = BlockEncoding.longFitsIn(v)
      assert(fit == 8 || v >= 0)
      val baos = new ByteArrayOutputStream()
      BlockEncoding.putLong(new DataOutputStream(baos), v, fit)
      assert(baos.size() == fit)
      val back = BlockEncoding.readLong(ByteBuffer.wrap(baos.toByteArray), fit)
      // sub-8-byte reads reconstruct non-negative values exactly; 8-byte
      // reads reconstruct everything
      assert(back == v, s"v=$v fit=$fit")
    }
  }

  test("edge cells round-trip under PREFIX and FAST_DIFF") {
    def c(row: String, qual: String, ts: Long, v: Array[Byte],
          typ: Byte = HFile.KeyTypePut): HCell =
      HCell(row.getBytes, "fam".getBytes, qual.getBytes, ts, v, typ)
    // strictly increasing key order; ts DESC within a column (comparator
    // order), exercising: negative ts (8-byte path), ts=0, huge ts,
    // empty values, a shared-value run (FAST_DIFF same-value flag), a
    // delete type change, and single-byte rows
    val shared = "same-bytes".getBytes
    val cells = Seq(
      c("a", "q", 5L, Array.emptyByteArray),
      c("row1", "qa", Long.MaxValue, shared),
      c("row1", "qa", 77L, shared),
      c("row1", "qa", 0L, shared),
      c("row1", "qa", -3L, "after-negative-ts".getBytes),
      c("row1", "qb", -1L, Array.emptyByteArray, HFile.KeyTypeDeleteColumn),
      c("row1longersuffix", "q", 9L, "v".getBytes),
      c("z", "q", Long.MinValue, "end".getBytes))
    cells.sliding(2).foreach { case Seq(x, y) =>
      assert(compareCells(x, y) < 0, s"fixture must be sorted: $x !< $y") }
    for (enc <- Seq(BlockEncoding.Prefix, BlockEncoding.Diff,
        BlockEncoding.FastDiff))
      assertSame(roundTrip(cells, enc), cells)
  }

  test("DIFF exercises ts-diff vs raw, sign flags, and qualifier-suffix " +
      "deltas within a row") {
    def c(row: String, qual: String, ts: Long, v: Array[Byte],
          typ: Byte = HFile.KeyTypePut): HCell =
      HCell(row.getBytes, "f".getBytes, qual.getBytes, ts, v, typ)
    val cells = Seq(
      // same row + qualifier: ts DESC runs hit TIMESTAMP_IS_DIFF with a
      // small positive delta (prevTs - ts > 0)...
      c("r1", "qual-aaaa", 1700000002000L, "a".getBytes),
      c("r1", "qual-aaaa", 1700000001000L, "b".getBytes),
      c("r1", "qual-aaaa", 1700000000990L, "c".getBytes),
      // ...same-row qualifier change: common prefix covers the row, so
      // only the qualifier suffix is written; new column restarts at a
      // big ts (negative diff -> sign flag on the diff path)
      c("r1", "qual-bbbb", 1700000009000L, "d".getBytes),
      // row change with a shared "r" first byte: common < rowRegion
      c("r2", "q", -5L, "e".getBytes), // negative raw ts (sign, no diff)
      c("r2", "q", Long.MinValue + 1, Array.emptyByteArray,
        HFile.KeyTypeDeleteColumn),
      // row-length change: common prefix stops inside the 2-byte rowLen
      c("r2-longer-row", "q", 0L, "g".getBytes))
    cells.sliding(2).foreach { case Seq(x, y) =>
      assert(compareCells(x, y) < 0, s"fixture must be sorted: $x !< $y") }
    assertSame(roundTrip(cells, BlockEncoding.Diff), cells)
  }

  test("DIFF rejects a second column family loudly") {
    val out = new DataOutputStream(new ByteArrayOutputStream())
    val enc = new BlockEncoding.Encoder(BlockEncoding.Diff)
    enc.encode(HCell("a".getBytes, "f".getBytes, "q".getBytes, 1L,
      "v".getBytes, HFile.KeyTypePut), out)
    val e = intercept[IllegalArgumentException](
      enc.encode(HCell("b".getBytes, "g".getBytes, "q".getBytes, 1L,
        "v".getBytes, HFile.KeyTypePut), out))
    assert(e.getMessage.contains("single column family"))
  }

  test("single cell and randomized streams round-trip, with tags+mvcc") {
    val rnd = new scala.util.Random(23)
    val layout = HFileReader.CellLayout(tags = true, mvcc = true)
    for (enc <- Seq(BlockEncoding.Prefix, BlockEncoding.Diff,
           BlockEncoding.FastDiff);
         trial <- 0 until 5) {
      val raw = (0 until 1 + rnd.nextInt(150)).map { _ =>
        HCell(
          Array.fill(1 + rnd.nextInt(12))(rnd.nextInt(256).toByte),
          "f".getBytes,
          s"q${rnd.nextInt(4)}".getBytes,
          rnd.nextLong(),
          Array.fill(rnd.nextInt(30))(rnd.nextInt(256).toByte),
          if (rnd.nextBoolean()) HFile.KeyTypePut else HFile.KeyTypeDelete,
          Array.fill(rnd.nextInt(10))(rnd.nextInt(256).toByte),
          math.abs(rnd.nextLong() % 100000))
      }
      val cells = raw.sortWith(compareCells(_, _) < 0)
        .foldLeft(Vector.empty[HCell]) { (acc, c) =>
          if (acc.nonEmpty && compareCells(acc.last, c) == 0) acc else acc :+ c
        }
      assertSame(roundTrip(cells, enc, layout), cells)
    }
  }

  test("unsupported encodings are rejected by name and by id") {
    intercept[IllegalArgumentException](BlockEncoding.idOf("PREFIX_TREE"))
    intercept[IllegalArgumentException](BlockEncoding.idOf("ROW_INDEX_V1"))
    intercept[IllegalArgumentException](
      BlockEncoding.decode(BlockEncoding.RowIndexV1, Array[Byte](1, 2, 3),
        HFileReader.PlainLayout).toSeq)
    intercept[IllegalArgumentException](
      new BlockEncoding.Encoder(BlockEncoding.RowIndexV1))
  }
}
