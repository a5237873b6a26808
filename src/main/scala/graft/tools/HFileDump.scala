package graft.tools

import graft.sources.HFileReader

/** Diagnostic CLI for graft HFiles — the `hbase hfile -m -p` analogue:
  *
  * {{{
  *   sbt "runMain graft.tools.HFileDump <file.hfile> [maxCells]"
  * }}}
  *
  * Prints the trailer, the full structural audit (block/index/file-info
  * verification with checksums), and the first `maxCells` cells. Exits
  * non-zero if any structural check fails, so it doubles as an
  * integrity probe in scripts.
  */
object HFileDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: HFileDump <file.hfile> [maxCells]")
    val maxCells = if (args.length > 1) args(1).toInt else 10
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args(0)))

    val t = HFileReader.readTrailer(new HFileReader.BytesRead(bytes))
    println(s"file: ${args(0)} (${bytes.length} bytes)")
    println(s"version: ${t.majorVersion}.${t.minorVersion}  " +
      s"comparator: ${t.comparator}")
    val codecName = t.compressionCodec match {
      case graft.sources.HFile.CodecGz => "GZ"
      case graft.sources.HFile.CodecNone => "NONE"
      case graft.sources.HFile.CodecSnappy => "SNAPPY"
      case graft.sources.HFile.CodecLz4 => "LZ4"
      case graft.sources.HFile.CodecZstd => "ZSTD"
      case other => s"unknown($other)"
    }
    println(s"cells: ${t.entryCount}  root index entries: ${t.dataIndexCount}  " +
      s"index levels: ${t.numDataIndexLevels}  compression: $codecName")
    println(s"offsets: firstData=${t.firstDataBlockOffset} " +
      s"lastData=${t.lastDataBlockOffset} loadOnOpen=${t.loadOnOpenOffset} " +
      s"fileInfo=${t.fileInfoOffset}")

    val stats = HFileReader.validate(new HFileReader.BytesRead(bytes))
    println(s"audit: OK (${stats.nDataBlocks} blocks, ${stats.nCells} " +
      s"cells, ${stats.nIndexEntries} index entries, " +
      s"${stats.nBloomChunks} bloom chunks, checksums verified)")
    println(s"key range: ${stats.firstKeyHex.take(48)} .. " +
      stats.lastKeyHex.take(48))
    stats.fileInfo.foreach { case (k, v) =>
      println(f"  info $k%-24s ${v.map(b => f"$b%02x").mkString.take(48)}")
    }

    HFileReader.scan(new HFileReader.BytesRead(bytes)).take(maxCells)
      .foreach { c =>
        val rk = c.rowkey.map(b => f"$b%02x").mkString
        println(s"  cell $rk/${new String(c.family, "UTF-8")}:" +
          s"${new String(c.qualifier, "UTF-8")}/ts=${c.ts}/type=${c.keyType}" +
          s"/vlen=${c.value.length}")
      }
  }
}
