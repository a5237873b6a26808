package graft.sources

import java.nio.ByteBuffer
import java.util.zip.CRC32C

import scala.collection.mutable.ArrayBuffer

/** Validating HFile reader for the [[HFile]] layout.
  *
  * Reads the fixed trailer, then streams the data blocks in file order
  * with O(one block) memory — the shape a distributed scan needs: each
  * executor thread walks one file sequentially, so a directory of
  * HFiles scans with the same IO pattern as any splittable columnar
  * read (block-at-a-time, no whole-file buffering).
  *
  * Everything structural is verified while scanning: block magics, the
  * CRC32C of every 16 KiB chunk, the prev-block-offset chain, block
  * sizes against header fields, cell sort order, and (via [[validate]])
  * the root index entries against the blocks actually seen and the
  * trailer's entry/block counts.
  */
object HFileReader {
  import HFile._

  /** Positional-read abstraction so tests can scan in-memory bytes and
    * the Spark path can scan Hadoop streams.
    */
  trait RandomRead extends AutoCloseable {
    def length: Long
    def readFully(pos: Long, len: Int): Array[Byte]
    def close(): Unit = ()
  }

  final class BytesRead(bytes: Array[Byte]) extends RandomRead {
    def length: Long = bytes.length.toLong
    def readFully(pos: Long, len: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(bytes, pos.toInt, pos.toInt + len)
  }

  case class Trailer(fileInfoOffset: Long, loadOnOpenOffset: Long,
                     dataIndexCount: Int, entryCount: Long,
                     numDataIndexLevels: Int, firstDataBlockOffset: Long,
                     lastDataBlockOffset: Long, comparator: String,
                     majorVersion: Int, minorVersion: Int,
                     compressionCodec: Int)

  def readTrailer(r: RandomRead): Trailer = {
    require(r.length >= TrailerSize, s"file too short for trailer: ${r.length}")
    val region = r.readFully(r.length - TrailerSize, TrailerSize)
    require(region.startsWith(TrailerMagic),
      "bad trailer magic — not a graft HFile")
    val version = ByteBuffer.wrap(region, TrailerSize - 4, 4).getInt
    val major = version & 0x00ffffff
    val minor = version >>> 24
    require(major == MajorVersion, s"unsupported HFile major version $major")
    var pos = TrailerMagic.length
    require(region.slice(pos, pos + PbMagic.length).sameElements(PbMagic),
      "missing PBUF magic in trailer")
    pos += PbMagic.length
    val pre = new ProtoReader(region, pos, region.length)
    val protoLen = pre.readVarint().toInt
    val p = new ProtoReader(region, pre.pos, pre.pos + protoLen)
    var fileInfoOffset, loadOnOpen, entryCount = 0L
    var dataIndexCount, levels = 0
    var firstData, lastData = -1L
    var comparator = ""
    var codec = HFile.CodecNone // proto3 default absence = writer's NONE
    while (p.hasMore) p.readField() match {
      case (1, Left(v))  => fileInfoOffset = v
      case (2, Left(v))  => loadOnOpen = v
      case (5, Left(v))  => dataIndexCount = v.toInt
      case (7, Left(v))  => entryCount = v
      case (8, Left(v))  => levels = v.toInt
      case (9, Left(v))  => firstData = v
      case (10, Left(v)) => lastData = v
      case (11, Right(b)) => comparator = new String(b, "UTF-8")
      case (12, Left(v)) => codec = v.toInt
      case _ => // ignore unknown/unused fields
    }
    Trailer(fileInfoOffset, loadOnOpen, dataIndexCount, entryCount, levels,
      firstData, lastData, comparator, major, minor, codec)
  }

  private case class Block(offset: Long, magic: Array[Byte],
                           payload: Array[Byte], onDiskSizeWithHeader: Int)

  /** Sentinel for [[readBlock]]: skip the prev-offset chain check (random
    * access into the load-on-open section, where the previous block's
    * offset isn't known without walking the whole file).
    */
  private val AnyPrevOffset = Long.MinValue

  /** Reads + fully verifies one block at `pos` (magic, checksums, header
    * size fields, prev-offset chain), decompressing the payload per the
    * trailer's codec. Checksums cover the on-disk (compressed) bytes;
    * uncompressedSizeWithoutHeader is verified against the inflated
    * payload.
    */
  private def readBlock(r: RandomRead, pos: Long, expectPrevOffset: Long,
                        codec: Int = HFile.CodecNone): Block = {
    val header = r.readFully(pos, HeaderSize)
    val hb = ByteBuffer.wrap(header)
    val magic = new Array[Byte](8); hb.get(magic)
    val onDiskSizeWithoutHeader = hb.getInt
    val uncompressedSize = hb.getInt
    val prevOffset = hb.getLong
    val checksumType = hb.get()
    val bytesPerChecksum = hb.getInt
    val onDiskDataSizeWithHeader = hb.getInt
    require(checksumType == ChecksumTypeCrc32c,
      s"unsupported checksum type $checksumType")
    require(expectPrevOffset == AnyPrevOffset || prevOffset == expectPrevOffset,
      s"broken prev-block chain at $pos: $prevOffset != $expectPrevOffset")
    val payloadLen = onDiskDataSizeWithHeader - HeaderSize
    require(payloadLen >= 0 && payloadLen <= onDiskSizeWithoutHeader,
      s"header size fields disagree at $pos")
    if (codec == CodecNone)
      require(payloadLen == uncompressedSize,
        s"header size fields disagree at $pos")
    val payloadAndChecks = r.readFully(pos + HeaderSize, onDiskSizeWithoutHeader)
    val checksums = ByteBuffer.wrap(payloadAndChecks, payloadLen,
      onDiskSizeWithoutHeader - payloadLen)
    val checksummed = new Array[Byte](HeaderSize + payloadLen)
    System.arraycopy(header, 0, checksummed, 0, HeaderSize)
    System.arraycopy(payloadAndChecks, 0, checksummed, HeaderSize, payloadLen)
    var p = 0
    while (p < checksummed.length) {
      val n = math.min(bytesPerChecksum, checksummed.length - p)
      val crc = new CRC32C()
      crc.update(checksummed, p, n)
      require(checksums.getInt == crc.getValue.toInt,
        s"CRC32C mismatch in block at $pos (chunk at $p)")
      p += n
    }
    val raw = java.util.Arrays.copyOfRange(payloadAndChecks, 0, payloadLen)
    val payload = HFile.decompress(codec, raw, uncompressedSize)
    Block(pos, magic, payload, HeaderSize + onDiskSizeWithoutHeader)
  }

  /** Per-cell serialization flags a v3 file declares in its file info:
    * a region-server-written file appends a u16-length-prefixed tags
    * run (`hfile.MAX_TAGS_LEN` present) and/or a Hadoop-vlong memstore
    * sequence id (`KEY_VALUE_VERSION` >= 1) after every cell's value.
    * graft's own files carry neither; honoring the flags is what lets
    * the reader scan arbitrary cluster files (the reference reads them
    * through the HBase jars, AbstractTableInputFormat.java).
    */
  private[graft] case class CellLayout(tags: Boolean, mvcc: Boolean,
                                         encoding: Int = BlockEncoding.None)

  private[graft] val PlainLayout = CellLayout(tags = false, mvcc = false)

  /** Reads the file-info block and derives the cell layout. One extra
    * short read per file open — nothing at scan scale. Dictionary-
    * compressed tags (`hfile.TAGS_COMPRESSED` = true) are rejected
    * loudly rather than mis-parsed.
    */
  private[graft] def cellLayoutOf(r: RandomRead, trailer: Trailer): CellLayout = {
    if (trailer.entryCount == 0) return PlainLayout
    val fi = readBlock(r, trailer.fileInfoOffset, AnyPrevOffset,
      trailer.compressionCodec)
    require(fi.magic.sameElements(BlockMagicFileInfo), "missing file info")
    val info = parseFileInfo(fi.payload)
    val tags = info.contains("hfile.MAX_TAGS_LEN")
    if (tags) require(!info.get("hfile.TAGS_COMPRESSED").exists(
      b => b.nonEmpty && b(0) != 0),
      "dictionary-compressed tags are not supported")
    val mvcc = info.get("KEY_VALUE_VERSION")
      .exists(b => b.length >= 4 && ByteBuffer.wrap(b).getInt >= 1)
    // DATA_BLOCK_ENCODING names the delta encoding of every data block;
    // an unsupported name (DIFF, ROW_INDEX_V1) fails here, loudly, not
    // as a mis-parse later
    val encoding = info.get("DATA_BLOCK_ENCODING")
      .map(b => BlockEncoding.idOf(new String(b, "UTF-8")))
      .getOrElse(BlockEncoding.None)
    CellLayout(tags, mvcc, encoding)
  }

  private def isDataMagic(m: Array[Byte]): Boolean =
    m.sameElements(BlockMagicData) || m.sameElements(BlockMagicEncodedData)

  /** Cell stream of one data block, dispatching on its magic: a plain
    * KeyValue stream, or an ENCODED_DATA payload whose leading 2-byte
    * encoding id is verified against the file info's
    * `DATA_BLOCK_ENCODING` declaration — a file must be uniformly
    * encoded or uniformly plain, anything else is corruption.
    */
  private def parseDataBlock(magic: Array[Byte], payload: Array[Byte],
                             layout: CellLayout): Iterator[HCell] =
    if (magic.sameElements(BlockMagicEncodedData)) {
      require(payload.length >= 2, "encoded data block too short for its id")
      val id = ((payload(0) & 0xff) << 8) | (payload(1) & 0xff)
      require(id == layout.encoding,
        s"block encoding id ${BlockEncoding.nameOf(id)} != file info " +
          s"DATA_BLOCK_ENCODING ${BlockEncoding.nameOf(layout.encoding)}")
      BlockEncoding.decode(id,
        java.util.Arrays.copyOfRange(payload, 2, payload.length), layout)
    } else {
      require(layout.encoding == BlockEncoding.None,
        "plain data block in a file declaring DATA_BLOCK_ENCODING " +
          BlockEncoding.nameOf(layout.encoding))
      parseCells(payload, layout)
    }

  private def parseCells(payload: Array[Byte],
                         layout: CellLayout): Iterator[HCell] =
    new Iterator[HCell] {
      private val buf = ByteBuffer.wrap(payload)
      def hasNext: Boolean = buf.remaining() > 0
      def next(): HCell = {
        val keyLen = buf.getInt
        val valueLen = buf.getInt
        val rowLen = buf.getShort & 0xffff
        val rowkey = new Array[Byte](rowLen); buf.get(rowkey)
        val famLen = buf.get() & 0xff
        val family = new Array[Byte](famLen); buf.get(family)
        val qualLen = keyLen - 2 - rowLen - 1 - famLen - 8 - 1
        require(qualLen >= 0, "negative qualifier length — corrupt key")
        val qualifier = new Array[Byte](qualLen); buf.get(qualifier)
        val ts = buf.getLong
        val typ = buf.get()
        require(typ == KeyTypePut || typ == KeyTypeDelete ||
          typ == KeyTypeDeleteColumn || typ == KeyTypeDeleteFamily,
          s"unexpected key type $typ")
        val value = new Array[Byte](valueLen); buf.get(value)
        val tags =
          if (!layout.tags) Array.emptyByteArray
          else {
            val tagsLen = buf.getShort & 0xffff
            val t = new Array[Byte](tagsLen); buf.get(t)
            t
          }
        val mvcc = if (layout.mvcc) readHadoopVLong(buf) else 0L
        HCell(rowkey, family, qualifier, ts, value, typ, tags, mvcc)
      }
    }

  /** Streams every cell in file order, verifying block structure and
    * cell sort order as it goes. Bloom chunks and meta blocks interleave
    * with data blocks (HBase's inline-block layout) and are skipped.
    * Closes `r` when exhausted.
    */
  def scan(r: RandomRead): Iterator[HCell] = {
    val trailer = readTrailer(r)
    if (trailer.firstDataBlockOffset < 0 || trailer.entryCount == 0) {
      r.close(); return Iterator.empty
    }
    val layout = cellLayoutOf(r, trailer)
    var pos = 0L // walk from the first block: a bloom chunk may precede it
    var prev = -1L
    var lastCell: HCell = null
    var seen = 0L
    new Iterator[HCell] {
      private var current: Iterator[HCell] = Iterator.empty
      private def advance(): Unit =
        while (!current.hasNext && pos < trailer.loadOnOpenOffset) {
          val b = readBlock(r, pos, prev, trailer.compressionCodec)
          prev = pos
          pos += b.onDiskSizeWithHeader
          if (isDataMagic(b.magic))
            current = parseDataBlock(b.magic, b.payload, layout)
          else require(b.magic.sameElements(BlockMagicBloomChunk) ||
            b.magic.sameElements(BlockMagicMeta) ||
            b.magic.sameElements(BlockMagicLeafIndex) ||
            b.magic.sameElements(BlockMagicIntermediateIndex),
            s"unexpected block magic in scanned section at ${pos - b.onDiskSizeWithHeader}")
        }
      def hasNext: Boolean = {
        advance()
        val more = current.hasNext
        if (!more) {
          require(seen == trailer.entryCount,
            s"cell count ${seen} != trailer entry_count ${trailer.entryCount}")
          r.close()
        }
        more
      }
      def next(): HCell = {
        advance()
        val c = current.next()
        require(lastCell == null || compareCells(lastCell, c) < 0,
          "cells out of order in file")
        lastCell = c
        seen += 1
        c
      }
    }
  }

  /** Parses a file-info block payload (`PBUF` + varint-prefixed
    * FileInfoProto) into its key → bytes map.
    */
  private def parseFileInfo(payload: Array[Byte]): Map[String, Array[Byte]] = {
    require(payload.slice(0, PbMagic.length).sameElements(PbMagic),
      "file info lacks PBUF magic")
    val pre = new ProtoReader(payload, PbMagic.length, payload.length)
    val protoLen = pre.readVarint().toInt
    val p = new ProtoReader(payload, pre.pos, pre.pos + protoLen)
    val info = scala.collection.mutable.Map[String, Array[Byte]]()
    while (p.hasMore) p.readField() match {
      case (1, Right(pair)) =>
        val pp = new ProtoReader(pair, 0, pair.length)
        var k: Array[Byte] = null; var v: Array[Byte] = null
        while (pp.hasMore) pp.readField() match {
          case (1, Right(b)) => k = b
          case (2, Right(b)) => v = b
          case _ =>
        }
        info += new String(k, "UTF-8") -> v
      case _ =>
    }
    info.toMap
  }

  /** The rowkey portion of a serialized cell key
    * (`rowLen(i16) row famLen(u8) ...`).
    */
  private def rowkeyOfKey(key: Array[Byte]): Array[Byte] = {
    val rowLen = ((key(0) & 0xff) << 8) | (key(1) & 0xff)
    java.util.Arrays.copyOfRange(key, 2, 2 + rowLen)
  }

  /** Cheap (three short reads, no data-block IO) first/last rowkey of a
    * file: the trailer, the root data index's first entry, and the file
    * info's `hfile.LASTKEY`. `None` for an empty file. This is what a
    * planner needs to prune whole files against a rowkey range — the
    * file-skipping analogue of a parquet footer's min/max.
    */
  def rowkeyRange(r: RandomRead): Option[(Array[Byte], Array[Byte])] = {
    val trailer = readTrailer(r)
    if (trailer.entryCount == 0 || trailer.firstDataBlockOffset < 0)
      return None
    val idx = readBlock(r, trailer.loadOnOpenOffset, AnyPrevOffset,
      trailer.compressionCodec)
    require(idx.magic.sameElements(BlockMagicRootIndex), "missing root index")
    val ib = ByteBuffer.wrap(idx.payload)
    ib.getLong; ib.getInt // first entry's offset + on-disk size
    val keyLen = readHadoopVLong(ib).toInt
    val firstKey = new Array[Byte](keyLen); ib.get(firstKey)
    val fi = readBlock(r, trailer.fileInfoOffset, AnyPrevOffset,
      trailer.compressionCodec)
    require(fi.magic.sameElements(BlockMagicFileInfo), "missing file info")
    val lastKey = parseFileInfo(fi.payload).getOrElse("hfile.LASTKEY",
      throw new IllegalStateException("file info lacks hfile.LASTKEY"))
    Some((rowkeyOfKey(firstKey), rowkeyOfKey(lastKey)))
  }

  /** Full structural audit: everything [[scan]] checks, plus the root
    * index entries (offsets, sizes, first keys) against the data blocks
    * actually present, and the file info block.
    */
  def validate(r: RandomRead): FileStats = {
    val trailer = readTrailer(r)
    val layout = cellLayoutOf(r, trailer)
    // walk every block in the scanned section (data + inline bloom
    // chunks + meta blocks)
    var pos = 0L
    var prev = -1L
    var nBlocks = 0
    var nCells = 0L
    var nBloomChunks = 0
    var firstKey = ""; var lastKey = ""
    val blockStarts = ArrayBuffer[(Long, Int, Array[Byte])]()
    val metaStarts = ArrayBuffer[(Long, Int)]()
    while (pos < trailer.loadOnOpenOffset) {
      val b = readBlock(r, pos, prev, trailer.compressionCodec)
      if (isDataMagic(b.magic)) {
        var blockFirstKey: Array[Byte] = null
        var last: HCell = null
        parseDataBlock(b.magic, b.payload, layout).foreach { c =>
          require(last == null || compareCells(last, c) < 0, "cells out of order")
          val keyHex = (c.rowkey ++ c.family ++ c.qualifier).map(x => f"$x%02x").mkString
          if (firstKey.isEmpty) firstKey = keyHex
          lastKey = keyHex
          if (blockFirstKey == null)
            blockFirstKey = serializeKey(c)
          last = c
          nCells += 1
        }
        blockStarts += ((pos, b.onDiskSizeWithHeader, blockFirstKey))
        nBlocks += 1
      } else if (b.magic.sameElements(BlockMagicBloomChunk)) {
        nBloomChunks += 1
      } else if (b.magic.sameElements(BlockMagicMeta)) {
        metaStarts += ((pos, b.onDiskSizeWithHeader))
      } else if (b.magic.sameElements(BlockMagicLeafIndex) ||
          b.magic.sameElements(BlockMagicIntermediateIndex)) {
        // sub-root index blocks; verified via the root descent below
      } else {
        throw new IllegalStateException(s"unexpected block magic at $pos")
      }
      prev = pos
      pos += b.onDiskSizeWithHeader
    }
    // dataIndexCount counts ROOT entries: data blocks when single-level,
    // top-level index blocks otherwise (checked against the root below)
    if (trailer.numDataIndexLevels == 1)
      require(nBlocks == trailer.dataIndexCount,
        s"$nBlocks data blocks != trailer data_index_count ${trailer.dataIndexCount}")
    require(nCells == trailer.entryCount,
      s"$nCells cells != trailer entry_count ${trailer.entryCount}")

    // root index block + multi-level descent down to the data entries
    val idx = readBlock(r, trailer.loadOnOpenOffset, prev,
      trailer.compressionCodec)
    require(idx.magic.sameElements(BlockMagicRootIndex), "missing root index")
    require(parseIndexEntries(idx.payload).length == trailer.dataIndexCount,
      "root entry count != trailer data_index_count")
    val dataEntries = collectDataEntries(r, idx.payload,
      trailer.numDataIndexLevels, trailer.compressionCodec)
    var nIdx = 0
    dataEntries.foreach { case (off, size, key) =>
      val (expOff, expSize, expKey) = blockStarts(nIdx)
      require(off == expOff && size == expSize,
        s"index entry $nIdx points at ($off,$size), block is ($expOff,$expSize)")
      require(key.sameElements(expKey), s"index entry $nIdx first-key mismatch")
      nIdx += 1
    }
    require(nIdx == nBlocks, s"$nIdx index entries for $nBlocks blocks")

    // root META index block (always present; entries point at the META
    // blocks seen in the body walk)
    val metaOffset = trailer.loadOnOpenOffset + idx.onDiskSizeWithHeader
    val metaIdx = readBlock(r, metaOffset, trailer.loadOnOpenOffset,
      trailer.compressionCodec)
    require(metaIdx.magic.sameElements(BlockMagicRootIndex),
      "missing root meta index")
    val metaEntries = parseMetaIndex(metaIdx.payload)
    require(metaEntries.size == metaStarts.size,
      s"meta index lists ${metaEntries.size} blocks, ${metaStarts.size} present")
    metaEntries.values.zip(metaStarts).foreach { case ((off, size), (eo, es)) =>
      require(off == eo && size == es, "meta index entry offset/size mismatch")
    }
    // bloom meta (when present) must agree with the chunks actually seen
    metaEntries.get(HFile.BloomMetaName).foreach { case (off, _) =>
      val bm = readBlock(r, off, AnyPrevOffset, trailer.compressionCodec)
      require(bm.magic.sameElements(BlockMagicMeta), "bloom meta magic")
      val chunks = parseBloomMeta(bm.payload)
      require(chunks.length == nBloomChunks,
        s"bloom meta lists ${chunks.length} chunks, $nBloomChunks present")
    }

    // file info block
    val fi = readBlock(r, trailer.fileInfoOffset, metaOffset,
      trailer.compressionCodec)
    require(fi.magic.sameElements(BlockMagicFileInfo), "missing file info")
    val info = parseFileInfo(fi.payload)
    r.close()
    FileStats(nBlocks, nCells, nIdx, info, firstKey, lastKey, nBloomChunks)
  }

  /** Root meta index payload → name → (offset, onDiskSizeWithHeader),
    * insertion-ordered.
    */
  private def parseMetaIndex(payload: Array[Byte])
      : scala.collection.SeqMap[String, (Long, Int)] = {
    val ib = ByteBuffer.wrap(payload)
    val out = scala.collection.mutable.LinkedHashMap[String, (Long, Int)]()
    while (ib.remaining() > 0) {
      val off = ib.getLong
      val size = ib.getInt
      val nameLen = readHadoopVLong(ib).toInt
      val name = new Array[Byte](nameLen); ib.get(name)
      out += new String(name, "UTF-8") -> ((off, size))
    }
    out
  }

  /** Bloom meta payload → (chunkOffset, chunkOnDiskSize, firstRowkey)
    * per chunk, in key order.
    */
  private def parseBloomMeta(payload: Array[Byte])
      : Array[(Long, Int, Array[Byte])] = {
    val buf = ByteBuffer.wrap(payload)
    val version = buf.getInt
    require(version == 1, s"unsupported bloom meta version $version")
    buf.getLong // totalKeys
    buf.getInt  // chunkKeys
    val n = buf.getInt
    Array.fill(n) {
      val off = buf.getLong
      val size = buf.getInt
      val rowLen = readHadoopVLong(buf).toInt
      val row = new Array[Byte](rowLen); buf.get(row)
      (off, size, row)
    }
  }

  /** Bloom membership probe for a rowkey: `Some(false)` = definitely
    * absent (prune the file), `Some(true)` = maybe present, `None` = the
    * file carries no bloom (fall back to the key range). Five short
    * reads: trailer, root index, meta index, bloom meta, one chunk.
    */
  def rowkeyMayContain(r: RandomRead, rowkey: Array[Byte]): Option[Boolean] = {
    val trailer = readTrailer(r)
    if (trailer.entryCount == 0) return Some(false)
    val idx = readBlock(r, trailer.loadOnOpenOffset, AnyPrevOffset,
      trailer.compressionCodec)
    require(idx.magic.sameElements(BlockMagicRootIndex), "missing root index")
    val metaIdx = readBlock(r,
      trailer.loadOnOpenOffset + idx.onDiskSizeWithHeader, AnyPrevOffset,
      trailer.compressionCodec)
    require(metaIdx.magic.sameElements(BlockMagicRootIndex),
      "missing root meta index")
    parseMetaIndex(metaIdx.payload).get(HFile.BloomMetaName).map {
      case (off, _) =>
        val bm = readBlock(r, off, AnyPrevOffset, trailer.compressionCodec)
        require(bm.magic.sameElements(BlockMagicMeta), "bloom meta magic")
        val chunks = parseBloomMeta(bm.payload)
        // the owning chunk is the last whose firstRowkey <= key (chunks
        // partition the sorted key stream into contiguous ranges)
        var lo = 0; var hi = chunks.length - 1; var owner = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (java.util.Arrays.compareUnsigned(chunks(mid)._3, rowkey) <= 0) {
            owner = mid; lo = mid + 1
          } else hi = mid - 1
        }
        owner >= 0 && {
          val (coff, _, _) = chunks(owner)
          val cb = readBlock(r, coff, AnyPrevOffset, trailer.compressionCodec)
          require(cb.magic.sameElements(BlockMagicBloomChunk),
            "bloom chunk magic")
          HFile.bloomMayContain(cb.payload, rowkey)
        }
    }
  }

  // ---- multi-level index -------------------------------------------------

  /** `(offset, onDiskSizeWithHeader, firstKey)` triples of one index
    * block payload (any level — the entry shape is uniform).
    */
  private def parseIndexEntries(payload: Array[Byte])
      : Array[(Long, Int, Array[Byte])] = {
    val ib = ByteBuffer.wrap(payload)
    val out = ArrayBuffer[(Long, Int, Array[Byte])]()
    while (ib.remaining() > 0) {
      val off = ib.getLong
      val size = ib.getInt
      val keyLen = readHadoopVLong(ib).toInt
      val key = new Array[Byte](keyLen); ib.get(key)
      out += ((off, size, key))
    }
    out.toArray
  }

  /** Full descent: every data-block entry under an index payload,
    * verifying sub-level block magics on the way down.
    */
  private def collectDataEntries(r: RandomRead, payload: Array[Byte],
                                 levels: Int, codec: Int)
      : Array[(Long, Int, Array[Byte])] = {
    val entries = parseIndexEntries(payload)
    if (levels <= 1) entries
    else entries.flatMap { case (off, _, _) =>
      val b = readBlock(r, off, AnyPrevOffset, codec)
      require(b.magic.sameElements(BlockMagicLeafIndex) ||
        b.magic.sameElements(BlockMagicIntermediateIndex),
        s"expected index block at $off")
      collectDataEntries(r, b.payload, levels - 1, codec)
    }
  }

  /** Data blocks whose key range may intersect `[lower, upper]`
    * (inclusive rowkey bounds, either side optional), found by descending
    * the index — O(levels × log fanout) block reads, not a file walk. The
    * shape a point-GET task needs: stream 1-2 blocks of a multi-GiB file.
    */
  private[sources] def dataBlocksInRange(r: RandomRead,
                                         lower: Option[Array[Byte]],
                                         upper: Option[Array[Byte]])
      : Seq[(Long, Int)] = {
    val trailer = readTrailer(r)
    if (trailer.entryCount == 0) return Nil
    val root = readBlock(r, trailer.loadOnOpenOffset, AnyPrevOffset,
      trailer.compressionCodec)
    require(root.magic.sameElements(BlockMagicRootIndex), "missing root index")

    // an entry covers [firstRow_i, firstRow_{i+1}] (inclusive right edge:
    // a row's cells can span the boundary); keep i when that span can
    // intersect [lower, upper]
    def select(entries: Array[(Long, Int, Array[Byte])])
        : Array[(Long, Int, Array[Byte])] =
      entries.zipWithIndex.filter { case ((_, _, key), i) =>
        val row = rowkeyOfKey(key)
        val belowUpper = upper.forall(u =>
          java.util.Arrays.compareUnsigned(row, u) <= 0)
        val aboveLower = lower.forall { l =>
          i == entries.length - 1 ||
            java.util.Arrays.compareUnsigned(
              rowkeyOfKey(entries(i + 1)._3), l) >= 0
        }
        belowUpper && aboveLower
      }.map(_._1)

    var level = select(parseIndexEntries(root.payload))
    var depth = trailer.numDataIndexLevels
    while (depth > 1) {
      level = level.flatMap { case (off, _, _) =>
        val b = readBlock(r, off, AnyPrevOffset, trailer.compressionCodec)
        require(b.magic.sameElements(BlockMagicLeafIndex) ||
          b.magic.sameElements(BlockMagicIntermediateIndex),
          s"expected index block at $off")
        select(parseIndexEntries(b.payload))
      }
      depth -= 1
    }
    level.map { case (off, size, _) => (off, size) }.toSeq
  }

  /** Batched point-GETs against one open file — the multi-get primitive a
    * distributed keyed lookup needs. One trailer/root/meta read for the
    * whole batch; per key a (cached) bloom-chunk probe, then an index
    * descent with index/data blocks cached by offset, so a sorted key
    * batch landing in the same block costs one block read. Does NOT close
    * `r` (callers batch multiple calls over one stream).
    */
  def multiGet(r: RandomRead, keys0: Seq[Array[Byte]]): Seq[HCell] = {
    if (keys0.isEmpty) return Nil
    val trailer = readTrailer(r)
    if (trailer.entryCount == 0) return Nil
    val codec = trailer.compressionCodec
    val layout = cellLayoutOf(r, trailer)
    val root = readBlock(r, trailer.loadOnOpenOffset, AnyPrevOffset, codec)
    require(root.magic.sameElements(BlockMagicRootIndex), "missing root index")
    val metaIdx = readBlock(r,
      trailer.loadOnOpenOffset + root.onDiskSizeWithHeader, AnyPrevOffset, codec)
    require(metaIdx.magic.sameElements(BlockMagicRootIndex),
      "missing root meta index")
    val bloomChunks = parseMetaIndex(metaIdx.payload).get(HFile.BloomMetaName)
      .map { case (off, _) =>
        val bm = readBlock(r, off, AnyPrevOffset, codec)
        require(bm.magic.sameElements(BlockMagicMeta), "bloom meta magic")
        parseBloomMeta(bm.payload)
      }
    val blockCache = scala.collection.mutable.Map[Long, Block]()
    def cachedBlock(off: Long): Block =
      blockCache.getOrElseUpdate(off, readBlock(r, off, AnyPrevOffset, codec))
    def cachedPayload(off: Long, wantMagic: Array[Byte]): Array[Byte] = {
      val b = cachedBlock(off)
      require(b.magic.sameElements(wantMagic),
        s"unexpected block magic at $off")
      b.payload
    }
    def cmp(a: Array[Byte], b: Array[Byte]) =
      java.util.Arrays.compareUnsigned(a, b)

    // Array equality is referential, so .distinct would NOT dedup equal
    // byte arrays — sort first, then drop adjacent duplicates by content
    val keys = keys0.sortWith(cmp(_, _) < 0)
      .foldLeft(Vector.empty[Array[Byte]]) { (acc, k) =>
        if (acc.nonEmpty && cmp(acc.last, k) == 0) acc else acc :+ k
      }
    keys.flatMap { k =>
      val bloomPass = bloomChunks.forall { chunks =>
        var lo = 0; var hi = chunks.length - 1; var owner = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (cmp(chunks(mid)._3, k) <= 0) { owner = mid; lo = mid + 1 }
          else hi = mid - 1
        }
        owner >= 0 && HFile.bloomMayContain(
          cachedPayload(chunks(owner)._1, BlockMagicBloomChunk), k)
      }
      if (!bloomPass) Nil
      else {
        // descend every level keeping each entry that may cover k: its own
        // first row is <= k and the NEXT entry's first row is >= k (>=,
        // not > — a row's cells can span a block boundary, leaving the
        // key's earlier cells in the preceding block)
        def covering(payload: Array[Byte]): Array[(Long, Int, Array[Byte])] = {
          val entries = parseIndexEntries(payload)
          entries.zipWithIndex.filter { case ((_, _, key), i) =>
            cmp(rowkeyOfKey(key), k) <= 0 &&
              (i == entries.length - 1 ||
                cmp(rowkeyOfKey(entries(i + 1)._3), k) >= 0)
          }.map(_._1)
        }
        var level = covering(root.payload)
        var depth = trailer.numDataIndexLevels
        while (depth > 1) {
          val magic = if (depth == 2) BlockMagicLeafIndex
            else BlockMagicIntermediateIndex
          level = level.flatMap { case (off, _, _) =>
            covering(cachedPayload(off, magic))
          }
          depth -= 1
        }
        level.toSeq.flatMap { case (off, _, _) =>
          val b = cachedBlock(off)
          require(isDataMagic(b.magic), s"unexpected block magic at $off")
          parseDataBlock(b.magic, b.payload, layout)
            .filter(c => cmp(c.rowkey, k) == 0)
        }
      }
    }
  }

  /** Streams the cells of `[lower, upper]` (inclusive rowkey bounds) by
    * reading only the covering data blocks via the index. Block-level
    * checks (magic, checksums, sizes) stay active; the prev-offset chain
    * and total entry count can't be verified on a partial scan. Rows
    * outside the bounds at the edges of the covering blocks are filtered
    * here. Closes `r` when exhausted.
    */
  def scanRange(r: RandomRead, lower: Option[Array[Byte]],
                upper: Option[Array[Byte]]): Iterator[HCell] = {
    val blocks = dataBlocksInRange(r, lower, upper)
    if (blocks.isEmpty) { r.close(); return Iterator.empty }
    val trailer = readTrailer(r)
    val layout = cellLayoutOf(r, trailer)
    val it = blocks.iterator.flatMap { case (off, _) =>
      val b = readBlock(r, off, AnyPrevOffset, trailer.compressionCodec)
      require(isDataMagic(b.magic),
        s"index pointed at non-data block at $off")
      parseDataBlock(b.magic, b.payload, layout)
    }.filter { c =>
      lower.forall(l => java.util.Arrays.compareUnsigned(c.rowkey, l) >= 0) &&
        upper.forall(u => java.util.Arrays.compareUnsigned(c.rowkey, u) <= 0)
    }
    new Iterator[HCell] {
      def hasNext: Boolean = { val m = it.hasNext; if (!m) r.close(); m }
      def next(): HCell = it.next()
    }
  }
}
