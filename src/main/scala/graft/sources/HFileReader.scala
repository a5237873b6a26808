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
    val payload = codec match {
      case CodecNone => raw
      case CodecGz =>
        val inflated = HFile.gunzip(raw)
        require(inflated.length == uncompressedSize,
          s"decompressed size ${inflated.length} != header uncompressed size " +
            s"$uncompressedSize at $pos")
        inflated
      case other =>
        throw new IllegalStateException(s"unsupported compression codec $other")
    }
    Block(pos, magic, payload, HeaderSize + onDiskSizeWithoutHeader)
  }

  private def parseCells(payload: Array[Byte]): Iterator[HCell] =
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
        HCell(rowkey, family, qualifier, ts, value, typ)
      }
    }

  /** Streams every cell in file order, verifying block structure and
    * cell sort order as it goes. Closes `r` when exhausted.
    */
  def scan(r: RandomRead): Iterator[HCell] = {
    val trailer = readTrailer(r)
    if (trailer.firstDataBlockOffset < 0 || trailer.entryCount == 0) {
      r.close(); return Iterator.empty
    }
    var pos = trailer.firstDataBlockOffset
    var prev = -1L
    var lastCell: HCell = null
    var seen = 0L
    new Iterator[HCell] {
      private var current: Iterator[HCell] = Iterator.empty
      private def advance(): Unit =
        while (!current.hasNext && pos < trailer.loadOnOpenOffset) {
          val b = readBlock(r, pos, prev, trailer.compressionCodec)
          require(b.magic.sameElements(BlockMagicData),
            s"expected data block at $pos")
          prev = pos
          pos += b.onDiskSizeWithHeader
          current = parseCells(b.payload)
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
    // walk data blocks
    var pos = if (trailer.firstDataBlockOffset < 0) trailer.loadOnOpenOffset
      else trailer.firstDataBlockOffset
    var prev = -1L
    var nBlocks = 0
    var nCells = 0L
    var firstKey = ""; var lastKey = ""
    val blockStarts = ArrayBuffer[(Long, Int, Array[Byte])]()
    while (pos < trailer.loadOnOpenOffset) {
      val b = readBlock(r, pos, prev, trailer.compressionCodec)
      require(b.magic.sameElements(BlockMagicData), s"expected data at $pos")
      var blockFirstKey: Array[Byte] = null
      var last: HCell = null
      parseCells(b.payload).foreach { c =>
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
      prev = pos
      pos += b.onDiskSizeWithHeader
    }
    require(nBlocks == trailer.dataIndexCount,
      s"$nBlocks data blocks != trailer data_index_count ${trailer.dataIndexCount}")
    require(nCells == trailer.entryCount,
      s"$nCells cells != trailer entry_count ${trailer.entryCount}")

    // root index block
    val idx = readBlock(r, trailer.loadOnOpenOffset, prev,
      trailer.compressionCodec)
    require(idx.magic.sameElements(BlockMagicRootIndex), "missing root index")
    val ib = ByteBuffer.wrap(idx.payload)
    var nIdx = 0
    while (ib.remaining() > 0) {
      val off = ib.getLong
      val size = ib.getInt
      val keyLen = readHadoopVLong(ib).toInt
      val key = new Array[Byte](keyLen); ib.get(key)
      val (expOff, expSize, expKey) = blockStarts(nIdx)
      require(off == expOff && size == expSize,
        s"index entry $nIdx points at ($off,$size), block is ($expOff,$expSize)")
      require(key.sameElements(expKey), s"index entry $nIdx first-key mismatch")
      nIdx += 1
    }
    require(nIdx == nBlocks, s"$nIdx index entries for $nBlocks blocks")

    // root META index block (always present, empty — no meta blocks)
    val metaOffset = trailer.loadOnOpenOffset + idx.onDiskSizeWithHeader
    val metaIdx = readBlock(r, metaOffset, trailer.loadOnOpenOffset,
      trailer.compressionCodec)
    require(metaIdx.magic.sameElements(BlockMagicRootIndex),
      "missing root meta index")
    require(metaIdx.payload.isEmpty,
      s"meta index lists ${metaIdx.payload.length} payload bytes but no meta blocks are written")

    // file info block
    val fi = readBlock(r, trailer.fileInfoOffset, metaOffset,
      trailer.compressionCodec)
    require(fi.magic.sameElements(BlockMagicFileInfo), "missing file info")
    val info = parseFileInfo(fi.payload)
    r.close()
    FileStats(nBlocks, nCells, nIdx, info, firstKey, lastKey)
  }
}
