package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.util.zip.CRC32C

import graft.sources.HFile.{HCell, compareCells}
import org.scalatest.funsuite.AnyFunSuite

/** Golden FULL-FILE fixture: a complete tiny HFile v3 with cell tags and
  * mvcc ids, assembled byte-by-byte HERE, from the public format
  * description alone (the HBase book's "HFile format" appendix and the
  * format comments in HBase's HFileBlock / FixedFileTrailer / KeyValue
  * sources) — deliberately NOT via [[HFileWriter]], so this spec is an
  * independent second implementation of the on-disk layout. If
  * [[HFileReader]] parses this stream cell-exactly, it parses what a
  * region server writes for the same logical content; a writer/reader
  * pair that merely round-trips its own private dialect would pass
  * HFileSpec but fail here.
  *
  * The fixture freezes the exact layout a region-server-written v3 file
  * has (the reference consumes such files through the HBase jars,
  * AbstractTableInputFormat.java): per-cell u16-length-prefixed tags and
  * a Hadoop-vlong memstore ts after every value, declared in the file
  * info via `hfile.MAX_TAGS_LEN` / `KEY_VALUE_VERSION` /
  * `MAX_MEMSTORE_TS`; 33-byte block headers with CRC32C per 16 KiB
  * chunk; a root data index + (empty) root meta index + file info in the
  * load-on-open section; and the 4096-byte fixed trailer whose protobuf
  * carries the offsets. A SHA-256 pin at the end freezes the assembled
  * bytes so any drift in this fixture itself is loud.
  */
class HFileGoldenSpec extends AnyFunSuite {

  // ---- independent wire helpers (hand-coded from the public format) ----

  /** Hadoop WritableUtils.writeVLong: one byte for [-112, 127]; else a
    * marker byte encoding sign + byte count, then big-endian magnitude.
    */
  private def vlong(out: ByteArrayOutputStream, i: Long): Unit = {
    if (i >= -112 && i <= 127) { out.write(i.toInt); return }
    var len = -112
    var v = i
    if (v < 0) { v ^= -1L; len = -120 }
    var tmp = v
    while (tmp != 0) { tmp >>>= 8; len -= 1 }
    out.write(len)
    val n = if (len < -120) -(len + 120) else -(len + 112)
    var idx = n
    while (idx != 0) {
      out.write(((v >>> ((idx - 1) * 8)) & 0xff).toInt)
      idx -= 1
    }
  }

  /** Protobuf LEB128 varint. */
  private def leb(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def pbVarint(out: ByteArrayOutputStream, field: Int, v: Long): Unit = {
    leb(out, (field << 3) | 0); leb(out, v)
  }

  private def pbBytes(out: ByteArrayOutputStream, field: Int,
                      b: Array[Byte]): Unit = {
    leb(out, (field << 3) | 2); leb(out, b.length); out.write(b)
  }

  private def i32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).putInt(v).array()
  private def i64(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).putLong(v).array()

  /** Serialized cell key: rowLen(i16) row famLen(u8) family qualifier
    * ts(i64) type(u8).
    */
  private def keyOf(c: HCell): Array[Byte] = {
    val b = ByteBuffer.allocate(2 + c.rowkey.length + 1 + c.family.length +
      c.qualifier.length + 9)
    b.putShort(c.rowkey.length.toShort).put(c.rowkey)
    b.put(c.family.length.toByte).put(c.family).put(c.qualifier)
    b.putLong(c.ts).put(c.keyType)
    b.array()
  }

  /** One region-server-shaped KeyValue with the v3 appendices:
    * keyLen(i32) valueLen(i32) key value tagsLen(u16) tags mvcc(vlong).
    */
  private def kv(out: ByteArrayOutputStream, c: HCell): Unit = {
    val key = keyOf(c)
    out.write(i32(key.length)); out.write(i32(c.value.length))
    out.write(key); out.write(c.value)
    out.write((c.tags.length >>> 8) & 0xff); out.write(c.tags.length & 0xff)
    out.write(c.tags)
    vlong(out, c.mvcc)
  }

  /** v2+ block: magic(8) onDiskSizeWithoutHeader(i32)
    * uncompressedSizeWithoutHeader(i32) prevBlockOffset(i64)
    * checksumType(u8)=2 bytesPerChecksum(i32)=16384
    * onDiskDataSizeWithHeader(i32), payload, CRC32C(i32) per 16 KiB
    * chunk of header+payload. Returns the block's on-disk size.
    */
  private def block(out: ByteArrayOutputStream, magic: String,
                    payload: Array[Byte], prevOffset: Long): Int = {
    val bpc = 16384
    val nChunks = (33 + payload.length + bpc - 1) / bpc
    val h = ByteBuffer.allocate(33)
    h.put(magic.getBytes("UTF-8"))
    h.putInt(payload.length + 4 * nChunks)
    h.putInt(payload.length)
    h.putLong(prevOffset)
    h.put(2.toByte)
    h.putInt(bpc)
    h.putInt(33 + payload.length)
    val headed = h.array() ++ payload
    out.write(headed)
    var p = 0
    while (p < headed.length) {
      val n = math.min(bpc, headed.length - p)
      val crc = new CRC32C()
      crc.update(headed, p, n)
      out.write(i32(crc.getValue.toInt))
      p += n
    }
    33 + payload.length + 4 * nChunks
  }

  // ---- the fixture content ---------------------------------------------

  private val f = "f".getBytes("UTF-8")
  private def c(row: String, qual: String, ts: Long, value: String,
                typ: Byte, tags: Array[Byte], mvcc: Long) =
    HCell(row.getBytes("UTF-8"), f, qual.getBytes("UTF-8"), ts,
      value.getBytes("UTF-8"), typ, tags, mvcc)

  /** Five cells over two data blocks, covering: multiple qualifiers per
    * row, a Delete marker, empty + non-empty tags, and mvcc vlongs in
    * all three width classes (1-byte, 2-byte, multi-byte).
    */
  private val cells = Seq(
    c("alpha", "q",  100L, "v1", HFile.KeyTypePut,    Array[Byte](1, 7, 42), 1L),
    c("alpha", "q2",  90L, "v2", HFile.KeyTypePut,    Array.emptyByteArray, 130L),
    c("beta",  "q",   80L, "v3", HFile.KeyTypePut,    Array[Byte](9),
      0x12345678L),
    c("delta", "q",   60L, "",   HFile.KeyTypeDelete, Array.emptyByteArray, 2L),
    c("gamma", "q",   70L, "v5", HFile.KeyTypePut,    Array[Byte](-1, 0), 5L))

  private def assemble(): Array[Byte] = {
    val file = new ByteArrayOutputStream()

    // scanned section: two data blocks (3 + 2 cells)
    val blockCells = Seq(cells.take(3), cells.drop(3))
    var offset = 0L
    var prev = -1L
    val index = blockCells.map { bc =>
      val payload = new ByteArrayOutputStream()
      bc.foreach(kv(payload, _))
      val at = offset
      val size = block(file, "DATABLK*", payload.toByteArray, prev)
      prev = at
      offset += size
      (at, size, keyOf(bc.head))
    }

    // load-on-open: root data index
    val loadOnOpen = offset
    val idxPayload = new ByteArrayOutputStream()
    index.foreach { case (at, size, firstKey) =>
      idxPayload.write(i64(at)); idxPayload.write(i32(size))
      vlong(idxPayload, firstKey.length.toLong); idxPayload.write(firstKey)
    }
    val rootSize = block(file, "IDXROOT2", idxPayload.toByteArray, prev)
    prev = loadOnOpen
    offset += rootSize

    // root meta index: present but empty (no meta blocks in the fixture)
    val metaAt = offset
    offset += block(file, "IDXROOT2", Array.emptyByteArray, prev)
    prev = metaAt

    // file info: PBUF + varint-prefixed FileInfoProto of BytesBytesPairs,
    // with the three v3 region-server flags the reader keys its cell
    // layout on
    val fileInfoAt = offset
    val entries = Seq[(String, Array[Byte])](
      "hfile.LASTKEY" -> keyOf(cells.last),
      "hfile.AVG_KEY_LEN" -> i32(18),
      "hfile.AVG_VALUE_LEN" -> i32(2),
      "hfile.MAX_TAGS_LEN" -> i32(3),
      "hfile.TAGS_COMPRESSED" -> Array[Byte](0),
      "KEY_VALUE_VERSION" -> i32(1),
      "MAX_MEMSTORE_TS" -> i64(0x12345678L))
    val proto = new ByteArrayOutputStream()
    entries.foreach { case (k, v) =>
      val pair = new ByteArrayOutputStream()
      pbBytes(pair, 1, k.getBytes("UTF-8"))
      pbBytes(pair, 2, v)
      pbBytes(proto, 1, pair.toByteArray)
    }
    val fiPayload = new ByteArrayOutputStream()
    fiPayload.write("PBUF".getBytes("UTF-8"))
    leb(fiPayload, proto.size().toLong)
    proto.writeTo(fiPayload)
    offset += block(file, "FILEINF2", fiPayload.toByteArray, prev)

    // fixed 4096-byte trailer region: magic, PBUF, varint-prefixed
    // FileTrailerProto, zero padding, and major|minor<<24 in the last
    // 4 bytes
    val tp = new ByteArrayOutputStream()
    pbVarint(tp, 1, fileInfoAt)            // file_info_offset
    pbVarint(tp, 2, loadOnOpen)            // load_on_open_data_offset
    pbVarint(tp, 5, index.size.toLong)     // data_index_count (root)
    pbVarint(tp, 6, 0L)                    // meta_index_count
    pbVarint(tp, 7, cells.size.toLong)     // entry_count
    pbVarint(tp, 8, 1L)                    // num_data_index_levels
    pbVarint(tp, 9, index.head._1)         // first_data_block_offset
    pbVarint(tp, 10, index.last._1)        // last_data_block_offset
    pbBytes(tp, 11,
      "org.apache.hadoop.hbase.CellComparatorImpl".getBytes("UTF-8"))
    pbVarint(tp, 12, 2L)                   // compression_codec = NONE
    val trailer = ByteBuffer.allocate(4096)
    trailer.put("TRABLK\"$".getBytes("UTF-8"))
    trailer.put("PBUF".getBytes("UTF-8"))
    val lenPrefix = new ByteArrayOutputStream()
    leb(lenPrefix, tp.size().toLong)
    trailer.put(lenPrefix.toByteArray)
    trailer.put(tp.toByteArray)
    trailer.position(4096 - 4)
    trailer.putInt(3 | (3 << 24))          // major 3, minor 3
    file.write(trailer.array())

    file.toByteArray
  }

  private def sha256(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
      .map(x => f"$x%02x").mkString

  test("hand-assembled v3 file with tags+mvcc scans cell-exactly") {
    val bytes = assemble()
    val back = HFileReader.scan(new HFileReader.BytesRead(bytes)).toSeq
    assert(back.size == cells.size)
    back.zip(cells).foreach { case (a, b) =>
      assert(compareCells(a, b) == 0, s"key mismatch: $a vs $b")
      assert(a.value.sameElements(b.value))
      assert(a.tags.sameElements(b.tags),
        s"tags mismatch on ${new String(b.rowkey)}")
      assert(a.mvcc == b.mvcc, s"mvcc mismatch on ${new String(b.rowkey)}")
      assert(a.keyType == b.keyType)
    }
  }

  test("hand-assembled file passes the full structural audit") {
    val stats = HFileReader.validate(new HFileReader.BytesRead(assemble()))
    assert(stats.nDataBlocks == 2 && stats.nCells == 5 &&
      stats.nIndexEntries == 2 && stats.nBloomChunks == 0)
    assert(stats.fileInfo.get("KEY_VALUE_VERSION")
      .exists(b => ByteBuffer.wrap(b).getInt == 1))
    assert(stats.fileInfo.get("hfile.MAX_TAGS_LEN")
      .exists(b => ByteBuffer.wrap(b).getInt == 3))
  }

  test("point reads against the hand-assembled file: range + multiGet") {
    val bytes = assemble()
    val range = HFileReader.rowkeyRange(new HFileReader.BytesRead(bytes))
    assert(range.exists { case (lo, hi) =>
      lo.sameElements("alpha".getBytes) && hi.sameElements("gamma".getBytes)
    })
    val got = HFileReader.multiGet(new HFileReader.BytesRead(bytes),
      Seq("beta".getBytes, "delta".getBytes, "nope".getBytes))
    assert(got.size == 2)
    val beta = got.find(c => c.rowkey.sameElements("beta".getBytes)).get
    assert(beta.value.sameElements("v3".getBytes) &&
      beta.mvcc == 0x12345678L && beta.tags.sameElements(Array[Byte](9)))
    val delta = got.find(c => c.rowkey.sameElements("delta".getBytes)).get
    assert(delta.keyType == HFile.KeyTypeDelete && delta.value.isEmpty)
  }

  test("the fixture bytes are frozen") {
    // recorded from the first green assembly; a change to the fixture
    // helpers (= the independent format implementation) must be
    // deliberate and re-pinned, never accidental
    assert(sha256(assemble()) ==
      "058e90c33c30dd45f980af9543be77050f679ac8f304689458c62883bd7b4cf6")
  }
}
