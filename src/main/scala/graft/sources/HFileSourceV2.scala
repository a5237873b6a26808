package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch-read format for [[graft.operators.BulkLoad.writeHFiles]]
  * output: `spark.read.format("graft-hfile").load(dir)`.
  *
  * The RDD-free, planner-integrated twin of `BulkLoad.readHFiles`, built
  * the way a 100 TB scan wants to be planned:
  *
  *  - '''one InputPartition per HFile''' — a bulk-load directory holds one
  *    sorted, non-overlapping run per file, so file = natural split; each
  *    executor task streams one file block-at-a-time in O(block) memory
  *    with every [[HFileReader]] structural check active;
  *  - '''column pruning''' ([[SupportsPushDownRequiredColumns]]) — a
  *    `select(qualifier)` never materializes values;
  *  - '''file pruning''' ([[SupportsPushDownFilters]]) — `bucket` equality
  *    and `rowkey` range predicates skip whole files at plan time using
  *    the `bucket=N` directory name and [[HFileReader.rowkeyRange]] (the
  *    trailer + first-index-key + LASTKEY triple: three short reads per
  *    file, the HFile analogue of a parquet footer's min/max). Pruning
  *    filters are reported pushed but conservatively re-evaluated by
  *    Spark — the source skips files, not rows.
  *
  * The schema matches [[graft.operators.HFileCellRow]], so
  * `spark.read.format("graft-hfile")` and `BulkLoad.readHFiles` are
  * drop-in interchangeable.
  */
class HFileSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-hfile"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HFileSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new HFileTable(HFileSource.pathOf(
      new CaseInsensitiveStringMap(properties)))

  override def supportsExternalMetadata(): Boolean = false
}

object HFileSource {
  val Schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("rowkey", BinaryType, nullable = false),
    StructField("family", StringType, nullable = false),
    StructField("qualifier", StringType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("value", BinaryType, nullable = false),
    StructField("key_type", IntegerType, nullable = false)))

  private[sources] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft-hfile requires a load path: spark.read.format(\"graft-hfile\").load(dir)")
    p
  }

  /** `bucket=N` partition value parsed from a file path, -1 if absent. */
  private[sources] def bucketOf(file: String): Int =
    "bucket=(-?\\d+)".r.findFirstMatchIn(file)
      .map(_.group(1).toInt).getOrElse(-1)

  private[sources] def hadoopConfMap(spark: SparkSession): Map[String, String] = {
    val it = spark.sparkContext.hadoopConfiguration.iterator()
    val m = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); m += e.getKey -> e.getValue }
    m.result()
  }

  private[sources] def confOf(m: Map[String, String]): Configuration = {
    val conf = new Configuration(false)
    m.foreach { case (k, v) => conf.set(k, v) }
    conf
  }

  private[sources] def openRandomRead(file: String,
                                      conf: Configuration): HFileReader.RandomRead = {
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    new HFileReader.RandomRead {
      def length: Long = len
      def readFully(pos: Long, n: Int): Array[Byte] = {
        val buf = new Array[Byte](n)
        in.readFully(pos, buf)
        buf
      }
      override def close(): Unit = in.close()
    }
  }
}

class HFileTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-hfile:$path"
  override def schema(): StructType = HFileSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HFileScanBuilder(path)
}

class HFileScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = HFileSource.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accepts `bucket` equality/membership and `rowkey` comparisons for
    * FILE pruning. All filters are returned as residuals — the source
    * skips whole files whose key range can't match, it does not filter
    * rows — so Spark keeps the exact row-level Filter above the scan.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("bucket", _: Int)             => true
      case In("bucket", _)                       => true
      case GreaterThan("rowkey", _: Array[Byte]) => true
      case GreaterThanOrEqual("rowkey", _: Array[Byte]) => true
      case LessThan("rowkey", _: Array[Byte])    => true
      case LessThanOrEqual("rowkey", _: Array[Byte]) => true
      case EqualTo("rowkey", _: Array[Byte])     => true
      case _                                     => false
    }
    filters // all residual: row-level evaluation stays with Spark
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new HFileScan(path, required, pushed,
      HFileSource.hadoopConfMap(SparkSession.active))
}

case class HFileInputPartition(file: String, bucket: Int) extends InputPartition

class HFileScan(path: String, required: StructType, pushed: Array[Filter],
                confMap: Map[String, String]) extends Scan with Batch {
  import HFileSource._

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-hfile $path, pruned by [${pushed.mkString(", ")}]"

  private def cmp(a: Array[Byte], b: Array[Byte]): Int =
    java.util.Arrays.compareUnsigned(a, b)

  /** File survives iff every pushed predicate can match somewhere in the
    * file's [first, last] rowkey range (conservative: any doubt keeps
    * the file).
    */
  private def mayMatch(bucket: Int, range: Option[(Array[Byte], Array[Byte])],
                       f: Filter): Boolean = f match {
    case EqualTo("bucket", v: Int) => bucket == v
    case In("bucket", vs) => vs.exists {
      case v: Int => v == bucket
      case _      => true
    }
    case _ => range match {
      case None => false // empty file: no rowkey can match
      case Some((first, last)) => f match {
        case GreaterThan("rowkey", v: Array[Byte])        => cmp(last, v) > 0
        case GreaterThanOrEqual("rowkey", v: Array[Byte]) => cmp(last, v) >= 0
        case LessThan("rowkey", v: Array[Byte])           => cmp(first, v) < 0
        case LessThanOrEqual("rowkey", v: Array[Byte])    => cmp(first, v) <= 0
        case EqualTo("rowkey", v: Array[Byte]) =>
          cmp(first, v) <= 0 && cmp(last, v) >= 0
        case _ => true
      }
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = confOf(confMap)
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files = Option(fs.globStatus(new Path(root, "bucket=*/*.hfile")))
      .getOrElse(Array.empty)
      .map(_.getPath.toString)
    require(files.nonEmpty, s"no HFiles found under $path")
    val (bucketFilters, rowkeyFilters) =
      pushed.partition(_.references.contains("bucket"))
    files.iterator
      .map(f => (f, bucketOf(f)))
      // directory-name pruning first: costs nothing, avoids the trailer
      // reads for buckets that can't match
      .filter { case (_, b) => bucketFilters.forall(mayMatch(b, None, _)) }
      .filter { case (f, b) =>
        rowkeyFilters.isEmpty || {
          val r = openRandomRead(f, conf)
          val range = try HFileReader.rowkeyRange(r) finally r.close()
          rowkeyFilters.forall(mayMatch(b, range, _))
        }
      }
      .map { case (f, b) => HFileInputPartition(f, b): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new HFileReaderFactory(required, confMap)
}

class HFileReaderFactory(required: StructType, confMap: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[HFileInputPartition]
    new HFilePartitionReader(p, required, confMap)
  }
}

class HFilePartitionReader(p: HFileInputPartition, required: StructType,
                           confMap: Map[String, String])
    extends PartitionReader[InternalRow] {
  import HFile.HCell

  private val fileUtf8 = UTF8String.fromString(p.file)
  // one projector per required column, resolved once — the row loop
  // stays a flat array fill
  private val fields: Array[HCell => Any] = required.fieldNames.map {
    case "file"      => (_: HCell) => fileUtf8
    case "bucket"    => (_: HCell) => p.bucket
    case "rowkey"    => (c: HCell) => c.rowkey
    case "family"    => (c: HCell) => UTF8String.fromBytes(c.family)
    case "qualifier" => (c: HCell) => UTF8String.fromBytes(c.qualifier)
    case "ts"        => (c: HCell) => c.ts
    case "value"     => (c: HCell) => c.value
    case "key_type"  => (c: HCell) => c.keyType.toInt
    case other => throw new IllegalArgumentException(s"unknown column $other")
  }

  private val rr =
    HFileSource.openRandomRead(p.file, HFileSource.confOf(confMap))
  private val cells = HFileReader.scan(rr)
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (!cells.hasNext) return false
    val c = cells.next()
    val out = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) { out(i) = fields(i)(c); i += 1 }
    row = new GenericInternalRow(out)
    true
  }

  override def get(): InternalRow = row

  // scan() closes the stream on exhaustion; this covers early
  // termination (limit, task kill) — FSDataInputStream close is idempotent
  override def close(): Unit = rr.close()
}
