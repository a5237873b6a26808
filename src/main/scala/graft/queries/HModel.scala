package graft.queries

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import graft.functions.hb
import graft.model.{HColumn, HTableSchema}
import graft.operators.{BulkLoad, Cells, Salt}

/** HBase data-model queries (SURVEY.md §2 B-series): the reference's core
  * rowkey/cell/salt/bulkload semantics, surfaced as oracle-checkable
  * DataFrames.
  */
object HModel {

  /** Cell mapping used for the orders table in B2/B3. */
  val ordersSchema: HTableSchema = HTableSchema(
    rowKey = Seq("o_orderkey"),
    columns = Seq(
      HColumn("f", "custkey", "o_custkey", LongType),
      HColumn("f", "priority", "o_orderpriority", StringType),
      HColumn("f", "status", "o_orderstatus", StringType)))

  /** B1: typed field → big-endian rowkey (HBaseSerde.createFieldEncoder),
    * surfaced as hex so DuckDB can reproduce it arithmetically.
    */
  def rowkeyEncode(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey"),
      hex(hb.encode(col("c_custkey"))).as("rk_hex"),
      hex(concat(hb.encode(col("c_custkey")), hb.encode(col("c_name"))))
        .as("rk_composite_hex"))
      .orderBy(col("c_custkey"))

  /** B2: wide row → cell stream (createPutMutation semantics). */
  def cellsExtract(orders: DataFrame): DataFrame =
    Cells.toCells(orders, ordersSchema)
      .select(hex(col("rowkey")).as("rk_hex"), col("family"),
        col("qualifier"), hex(col("value")).as("value_hex"))
      .orderBy(col("rk_hex"), col("qualifier"))

  /** B3: cells → wide row (convertToRow semantics): encode out, decode
    * back, and the result must equal a plain projection of the source.
    */
  def cellsPivot(orders: DataFrame): DataFrame = {
    val cells = Cells.toCells(orders, ordersSchema)
    Cells.fromCells(cells, ordersSchema)
      .select(
        hb.decode(col("rowkey"), LongType).as("o_orderkey"),
        col("o_custkey"), col("o_orderpriority"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
  }

  /** B4: salt-bucket histogram with exact reference parity
    * (abs(Arrays.hashCode(rowkey)) % buckets, TsdbBulkload.java:90-98).
    */
  def saltDistribution(events: DataFrame, buckets: Int): DataFrame =
    events
      .groupBy(Salt.bucket(hb.encode(col("user_id")), buckets).cast("long")
        .as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_keys"))
      .orderBy(col("bucket"))

  /** B5: the HFile plan: salt + range-sort a cell stream, then report per
    * bucket the cell count, distinct hour prefixes, and the key range —
    * the file-roll boundaries of HadoopOutputFormat2.java:88-100.
    */
  def bulkloadPlan(events: DataFrame, buckets: Int): DataFrame = {
    val cells = events.select(
      col("user_id"),
      concat(hb.encode(col("user_id")), hb.encode(col("event_id")))
        .as("rowkey"),
      lit("f").as("family"),
      lit("value").as("qualifier"),
      hb.encode(col("value")).as("value"),
      expr("(ts DIV 1000000000 DIV 3600) * 3600").cast("int").as("hour_sec"))
    val prepared = BulkLoad.prepare(cells, buckets, numPartitions = 32,
      saltBase = Some(hb.encode(col("user_id"))),
      epochSec = Some(col("hour_sec")))
    prepared
      .groupBy(col("bucket").cast("long").as("bucket"))
      .agg(
        count(lit(1)).as("n_cells"),
        countDistinct(col("hour_sec")).as("n_hours"),
        min(hex(col("salted_key"))).as("min_key_hex"),
        max(hex(col("salted_key"))).as("max_key_hex"))
      .orderBy(col("bucket"))
  }

  /** B10: multi-version cell stream with VERSIONS=n retention — the
    * reference explodes `family → qualifier → versions` and keeps the
    * newest (TsdbBulkload.java:120-155); this keeps the last `n` per
    * cell via [[Cells.lastVersions]]. Events become a versioned cell
    * stream keyed (user rowkey, family m, qualifier = event type);
    * ties in ts break on value DESC so the oracle can reproduce the
    * order.
    */
  def cellsVersions(events: DataFrame, n: Int = 3): DataFrame = {
    val cells = events.select(
      hb.encode(col("user_id")).as("rowkey"),
      lit("m").as("family"),
      col("event_type").as("qualifier"),
      expr("ts DIV 1000000").as("ts"),
      col("value"))
    Cells.lastVersions(cells, n, tieBreak = Seq(col("value").desc))
      .select(hex(col("rowkey")).as("rk_hex"), col("family"),
        col("qualifier"), col("version_rank"), col("ts").as("ts_ms"),
        col("value"))
      .orderBy(col("rk_hex"), col("qualifier"), col("version_rank"))
  }

  /** B14: major-compaction semantics, oracle-checked — a versioned cell
    * stream from events plus deterministically-derived delete markers of
    * all three kinds, resolved by [[Compaction.applyDeletes]] and
    * VERSIONS=2 retention:
    *  - users ≡ 0 (mod 5): `DeleteFamily` at the user's (min+max)/2 ms —
    *    masks every column at or before mid-history;
    *  - users ≡ 0 (mod 7): `DeleteColumn` on 'click' at the user's max
    *    click ms — wipes the whole click column;
    *  - users ≡ 0 (mod 11): exact `Delete` of the newest 'view' cell —
    *    the runner-up view becomes version 1.
    * The oracle replays the thresholds with joins + a rank window.
    */
  def compactCells(events: DataFrame, versions: Int = 2,
                   cacheCells: Boolean = true): DataFrame = {
    import graft.operators.Compaction
    val all = cellsWithMarkers(events, cacheCells)
    val kept = Compaction.retainVersions(Compaction.applyDeletes(all), versions)
    kept.select(hex(col("rowkey")).as("rk_hex"), col("qualifier"),
        col("ts").as("ts_ms"), col("value"))
      .orderBy(col("rk_hex"), col("qualifier"), col("ts_ms"))
  }

  /** The shared put+marker cell stream compact_cells / compact_cells_ttl
    * resolve (columns rowkey/family/qualifier/ts/value/key_type).
    */
  private def cellsWithMarkers(events: DataFrame,
                               cacheCells: Boolean): DataFrame = {
    import graft.sources.HFile
    // the typed cell projection feeds seven plan branches (three marker
    // derivations + the four key_type filters in applyDeletes); without
    // caching, each branch re-scans events and re-runs hb.encode. Persist
    // it once (the Dedup.cacheShingles pattern) — LRU-evictable, sized
    // O(cells); pass cacheCells = false when memory is tighter than CPU.
    val cellsPlan = events.select(
      hb.encode(col("user_id")).as("rowkey"),
      lit("m").as("family"),
      col("event_type").as("qualifier"),
      expr("ts DIV 1000000").as("ts"),
      col("value"),
      lit(HFile.KeyTypePut.toInt).as("key_type"),
      col("user_id"))
    val cells = if (cacheCells)
      cellsPlan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else cellsPlan
    val noValue = lit(null).cast("double").as("value")
    // ONE threshold aggregation for all three marker classes (r19): the
    // per-class groupBys each shuffled their filtered slice of the
    // cached cells separately — three exchanges and three cache scans
    // for one logical pass. The union of the class predicates now feeds
    // ONE (rowkey, user) aggregation computing every threshold
    // (conditional aggs are null for absent qualifiers, filtered below
    // exactly where the old per-class pre-filter dropped the group);
    // the three marker branches are filters over the SAME aggregation
    // subtree, so the planner reuses one exchange for all of them.
    // Equivalence: a %5 user's `marked` rows are ALL its cells (the
    // first disjunct keeps everything), so `_mid` is the same
    // min/max-over-all-cells midpoint; `_maxclick`/`_maxview` only ever
    // aggregate click/view rows regardless of which disjunct admitted
    // the user.
    val marked = cells.filter(
      pmod(col("user_id"), lit(5)) === 0 ||
        (pmod(col("user_id"), lit(7)) === 0 &&
          col("qualifier") === "click") ||
        (pmod(col("user_id"), lit(11)) === 0 &&
          col("qualifier") === "view"))
    // the threshold frame is PERSISTED (same cacheCells flag): the three
    // marker filters are on the grouping key, so without a cache barrier
    // PushDownPredicates splits them back below the aggregation into
    // three separate shuffles — each now of the WHOLE marked set
    // (measured at the x100 scale cell: compact_cells_ttl ratio100 3.1 →
    // 6.7 before this persist). The frame is one row per marked user —
    // tiny at any scale.
    val thrPlan = marked.groupBy(col("rowkey"), col("user_id"))
      .agg(expr("(min(ts) + max(ts)) DIV 2").as("_mid"),
        max(when(col("qualifier") === "click", col("ts"))).as("_maxclick"),
        max(when(col("qualifier") === "view", col("ts"))).as("_maxview"))
    val thr = if (cacheCells)
      thrPlan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else thrPlan
    val famDel = thr.filter(pmod(col("user_id"), lit(5)) === 0)
      .select(col("rowkey"), lit("m").as("family"), lit("").as("qualifier"),
        col("_mid").as("ts"), noValue,
        lit(HFile.KeyTypeDeleteFamily.toInt).as("key_type"), col("user_id"))
    val colDel = thr
      .filter(pmod(col("user_id"), lit(7)) === 0 &&
        col("_maxclick").isNotNull)
      .select(col("rowkey"), lit("m").as("family"),
        lit("click").as("qualifier"), col("_maxclick").as("ts"), noValue,
        lit(HFile.KeyTypeDeleteColumn.toInt).as("key_type"), col("user_id"))
    val exactDel = thr
      .filter(pmod(col("user_id"), lit(11)) === 0 &&
        col("_maxview").isNotNull)
      .select(col("rowkey"), lit("m").as("family"),
        lit("view").as("qualifier"), col("_maxview").as("ts"), noValue,
        lit(HFile.KeyTypeDelete.toInt).as("key_type"), col("user_id"))
    cells.unionByName(famDel).unionByName(colDel)
      .unionByName(exactDel).drop("user_id")
  }

  /** B16: TTL-aware major compaction, oracle-checked — the same
    * put+marker stream as [[compactCells]], but expired first by
    * [[Compaction.applyTtl]] at a FIXED `nowMs` (2024-02-01T00:00Z, just
    * past the one-month event window):
    *  - family `m` carries a 25-day TTL → every cell (put AND marker)
    *    older than Jan 7 expires — a mid-January `DeleteFamily` marker
    *    can itself expire, un-masking the younger puts it covered;
    *  - `click` puts carry a per-cell TTL TAG of 10 days (HBase tag
    *    type 8, preceded by a non-TTL tag so the parser's skip logic is
    *    on the oracle path) → clicks older than Jan 22 expire even
    *    though the family would keep them (`min(cell, family)` rule).
    * The oracle replays both thresholds as plain ts predicates, then the
    * marker/versions pipeline exactly as compact_cells.
    */
  def compactCellsTtl(events: DataFrame, versions: Int = 2,
                      cacheCells: Boolean = true): DataFrame = {
    import graft.operators.Compaction
    import graft.functions.BytesCodec
    import graft.sources.HFile
    val nowMs = 1706745600000L            // 2024-02-01T00:00:00Z
    val famTtlMs = 25L * 24 * 3600 * 1000 // family m: 25 days
    val clickTtlMs = 10L * 24 * 3600 * 1000 // click cell tag: 10 days
    // [len=3][type=1][2-byte payload] [len=9][type=8][8-byte TTL ms]
    val clickTags: Array[Byte] =
      BytesCodec.encodeShort(3.toShort) ++ Array[Byte](1, 0x7f, 0x01) ++
        BytesCodec.encodeShort(9.toShort) ++ Array[Byte](8) ++
        BytesCodec.encodeLong(clickTtlMs)
    val all = cellsWithMarkers(events, cacheCells)
    val tagged = all.withColumn("tags",
      when(col("key_type") === HFile.KeyTypePut.toInt &&
        col("qualifier") === "click", lit(clickTags))
        .otherwise(lit(Array.emptyByteArray)))
    val live = Compaction.applyTtl(tagged, nowMs, Map("m" -> famTtlMs))
      .drop("tags")
    val kept = Compaction.retainVersions(Compaction.applyDeletes(live), versions)
    kept.select(hex(col("rowkey")).as("rk_hex"), col("qualifier"),
        col("ts").as("ts_ms"), col("value"))
      .orderBy(col("rk_hex"), col("qualifier"), col("ts_ms"))
  }

  /** One bulk-load fixture directory per sf dir for [[hfilePointLookup]],
    * written once per JVM (TrieMap) and once per machine (`_done` marker)
    * — bench's repeated runs and the verify run reuse it.
    */
  private val lookupDirs =
    scala.collection.concurrent.TrieMap[(String, Int), String]()
  private[graft] def ensureLookupDir(events: DataFrame, sfDir: String,
                                     buckets: Int): String =
    lookupDirs.getOrElseUpdate((sfDir, buckets), {
      val dir = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_lookup_v1_b${buckets}_${dirKey(sfDir)}"
      val spark = events.sparkSession
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val done = new org.apache.hadoop.fs.Path(root, "_done")
      if (!fs.exists(done)) {
        val cells = events.select(
          col("user_id"),
          concat(hb.encode(col("user_id")), hb.encode(col("event_id")))
            .as("rowkey"),
          lit("f").as("family"),
          lit("v").as("qualifier"),
          hb.encode(col("value")).as("value"),
          expr("ts DIV 1000000").as("ms"))
        val prepared = BulkLoad.prepare(cells, buckets, numPartitions = 16,
          saltBase = Some(hb.encode(col("user_id"))))
        BulkLoad.writeHFiles(prepared, dir, tsCol = Some("ms"))
        fs.create(done, true).close()
      }
      dir
    })

  /** B13 driven end-to-end: the reference's point-GET lookup
    * (HBaseRowDataLookupFunction.java fetches one row by rowkey) through
    * the `graft-hfile` DSv2 source. Events are bulk-written once (salted,
    * sorted, per-bucket non-overlapping runs), then ONE user's row range
    * is read back with pushed `bucket` equality (directory pruning) and
    * `rowkey` range predicates (trailer-range file pruning — the scan
    * opens a bounded number of files, not the directory). The cells
    * decode back to `(event_id, ts_ms, value)`, which DuckDB reproduces
    * straight from the events table.
    */
  def hfilePointLookup(events: DataFrame, sfDir: String,
                       userId: Long = 7L, buckets: Int = 4): DataFrame = {
    import graft.functions.BytesCodec
    val spark = events.sparkSession
    val dir = ensureLookupDir(events, sfDir, buckets)
    val ub = BytesCodec.encodeLong(userId)
    // same salt the writer used: abs(Arrays.hashCode(bytes)) % buckets
    val bucket = math.abs(java.util.Arrays.hashCode(ub) % buckets)
    val prefix = BytesCodec.encodeShort(bucket.toShort) ++ ub
    val base = spark.read.format("graft-hfile").load(dir)
      .filter(col("bucket") === bucket && col("rowkey") >= lit(prefix))
    // exclusive upper bound of the user's key range, carry-propagating
    // (None = all-0xFF prefix = unbounded above)
    val ranged = BytesCodec.prefixSuccessor(prefix) match {
      case Some(next) => base.filter(col("rowkey") < lit(next))
      case None => base
    }
    ranged
      .select(
        hb.decode(expr("substring(rowkey, 11, 8)"), LongType).as("event_id"),
        col("ts").as("ts_ms"),
        hb.decode(col("value"),
          org.apache.spark.sql.types.DoubleType).as("value"))
      .orderBy(col("event_id"))
  }

  /** B17: rowkey prefix scan written the way an HBase user writes it —
    * `startswith(rowkey, salt ++ user)`, the PrefixFilter idiom — NOT
    * the hand-built `>= prefix AND < successor` range
    * [[hfilePointLookup]] constructs. Binary `startswith` has no DSv2
    * source-filter form, so on a plain session this predicate cannot
    * push and the source reads every file; the
    * [[graft.plans.PrefixRangeRewrite]] optimizer rule (injected by
    * `graft.GraftExtensions`, which every engine session enables)
    * rewrites it to the equivalent range bounds in the logical plan,
    * V2 pushdown hands them to the source, and the scan prunes to the
    * user's files against the `_manifest` key ranges at plan time.
    * Same decode as the point lookup; the oracle recomputes from the
    * events table.
    */
  def hfilePrefixScan(events: DataFrame, sfDir: String,
                      userId: Long = 5L, buckets: Int = 4): DataFrame = {
    import graft.functions.BytesCodec
    val spark = events.sparkSession
    val dir = ensureLookupDir(events, sfDir, buckets)
    val ub = BytesCodec.encodeLong(userId)
    val bucket = math.abs(java.util.Arrays.hashCode(ub) % buckets)
    val prefix = BytesCodec.encodeShort(bucket.toShort) ++ ub
    spark.read.format("graft-hfile").load(dir)
      .filter(col("bucket") === bucket &&
        startswith(col("rowkey"), lit(prefix)))
      .select(
        hb.decode(expr("substring(rowkey, 11, 8)"), LongType).as("event_id"),
        col("ts").as("ts_ms"),
        hb.decode(col("value"),
          org.apache.spark.sql.types.DoubleType).as("value"))
      .orderBy(col("event_id"))
  }

  /** B13/B11 driven end-to-end: batched keyed lookup (multi-get) through
    * [[BulkLoad.multiGet]] — rowkeys of two users' events are fetched by
    * bloom + index probes against the bulk fixture (never a file scan)
    * and decoded back; DuckDB reproduces the result from the events
    * table directly.
    */
  def hfileMultiGet(events: DataFrame, sfDir: String,
                    userIds: Seq[Long] = Seq(3L, 11L),
                    buckets: Int = 4): DataFrame = {
    val spark = events.sparkSession
    val dir = ensureLookupDir(events, sfDir, buckets)
    val keys = events
      .filter(col("user_id").isin(userIds: _*))
      .select(concat(
        hb.encode(Salt.bucket(hb.encode(col("user_id")), buckets)
          .cast("short")),
        hb.encode(col("user_id")),
        hb.encode(col("event_id"))).as("rowkey"))
    BulkLoad.multiGet(spark, dir, keys)
      .select(
        hb.decode(expr("substring(rowkey, 11, 8)"),
          org.apache.spark.sql.types.LongType).as("event_id"),
        col("ts").as("ts_ms"),
        hb.decode(col("value"),
          org.apache.spark.sql.types.DoubleType).as("value"))
      .orderBy(col("event_id"))
  }

  /** B9: general fuzzy-rowkey scan — the reference's FuzzyRowFilter
    * (TsdbScanner.java:16-53) in full generality. TSDB-layout rowkey =
    * metric(3B, low bytes of user_id) + time-sec(4B) + event-id(8B);
    * one (pattern, mask) pair per selected whole hour, the 3 metric
    * bytes wildcarded and the 4 time bytes pinned (mask {1,1,1,0,0,0,0},
    * exactly the reference's 7-byte filter), OR'd across pairs by
    * [[graft.functions.FuzzyRowMatch]].
    *
    * `hoursOfDay` selects non-contiguous hour-of-day slices across
    * [floor(start,1h), floor(end,1h)) — a shape a plain range predicate
    * cannot express, so the byte matcher is load-bearing. A coarse raw-ts
    * range predicate covering the whole pattern span is still pushed to
    * the parquet scan for row-group pruning (the Scan.setStartRow/
    * setStopRow analogue around HBase's server-side filter).
    */
  def fuzzyScan(events: DataFrame, startTs: String, endTs: String,
                hoursOfDay: Seq[Int]): DataFrame = {
    import graft.functions.BytesCodec
    val hourMs = 3600L * 1000
    val loMs = Core.parseUtcMs(startTs); val hiMs = Core.parseUtcMs(endTs)
    val loSec = (loMs - loMs % hourMs) / 1000
    val hiSec = (hiMs - hiMs % hourMs) / 1000
    val mask = Array[Byte](1, 1, 1, 0, 0, 0, 0)
    val pairs = (loSec until hiSec by 3600L)
      .filter(h => hoursOfDay.contains(((h / 3600) % 24).toInt))
      .map(h => (Array[Byte](0, 0, 0) ++ BytesCodec.encodeInt(h.toInt), mask))
    val rowkey = concat(
      substring(hb.encode(col("user_id")), 6, 3),
      hb.encode(expr("(ts DIV 1000000000 DIV 3600) * 3600").cast("int")),
      hb.encode(col("event_id")))
    // no selected hours in [start, end) — e.g. a sub-hour span or a
    // disjoint hoursOfDay — is the natural empty scan, not a plan error
    // (FuzzyRowMatch itself requires a non-empty pair list)
    val rowMatch =
      if (pairs.isEmpty) lit(false) else hb.fuzzyRowMatch(rowkey, pairs)
    graft.Tables.tsRange(events, loSec * 1000000000L, hiSec * 1000000000L)
      .filter(rowMatch)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** B12: Z-order (Morton) layout key — interleave(user_id, epoch_hour)
    * via the codegen [[graft.functions.zo.zorder]] kernel, then the
    * per-(user, hour) cell counts in curve order. Sorting a bulk load on
    * `z` clusters rows close in BOTH dimensions into contiguous key
    * ranges, so user-range × time-range scans prune to a bounded set of
    * regions/row-groups — where the plain `(user, hour)` concatenation
    * (B5) prunes only on the leading column. The oracle recomputes the
    * interleave arithmetically per bit.
    */
  def zorderLayout(events: DataFrame, limit: Int = 100): DataFrame =
    events
      .select(col("user_id"),
        expr("ts DIV 1000000000 DIV 3600").as("epoch_hour"))
      .withColumn("z",
        graft.functions.zo.zorder(col("user_id"), col("epoch_hour")))
      .groupBy("user_id", "epoch_hour", "z")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("z")
      .limit(limit)

  /** One Z-ORDERED bulk-load fixture per sf dir: events written as
    * HFiles whose rowkey is `encode(interleave(user_id, epoch_hour)) ++
    * encode(event_id)` — curve-sorted, UNSALTED (a Z-order layout
    * replaces hash salting: multi-dimensional locality IS the
    * spreading strategy, and salting would destroy the contiguous key
    * ranges the read side prunes on), one bucket of non-overlapping
    * sorted runs. Written once per JVM / machine like
    * [[ensureLookupDir]].
    */
  private val zorderDirs =
    scala.collection.concurrent.TrieMap[String, String]()

  /** Collision-free fixture-dir key for an sf path: 16 hex chars of
    * md5 over the FULL path. A 32-bit `String.hashCode` can collide
    * across two sf dirs (silently serving the wrong fixture) and
    * `math.abs(Int.MinValue)` stays negative (malformed dir name) —
    * md5 has neither failure mode.
    */
  private[graft] def dirKey(sfDir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8"))
      .take(8).map(b => f"${b & 0xff}%02x").mkString
  private[graft] def ensureZorderDir(events: DataFrame,
                                     sfDir: String): String =
    zorderDirs.getOrElseUpdate(sfDir, {
      val dir = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_zorder_v1_${dirKey(sfDir)}"
      val spark = events.sparkSession
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val done = new org.apache.hadoop.fs.Path(root, "_done")
      if (!fs.exists(done)) {
        val z = graft.functions.zo.zorder(col("user_id"),
          expr("ts DIV 1000000000 DIV 3600"))
        val cells = events.select(
          concat(hb.encode(z), hb.encode(col("event_id"))).as("rowkey"),
          lit("f").as("family"),
          lit("v").as("qualifier"),
          hb.encode(col("value")).as("value"),
          expr("ts DIV 1000000").as("ms"))
        val prepared = BulkLoad.prepare(cells, buckets = 1,
          numPartitions = 16)
        BulkLoad.writeHFiles(prepared, dir, tsCol = Some("ms"))
        fs.create(done, true).close()
      }
      dir
    })

  /** B12 driven end-to-end: a (user-range × hour-range) BOX query
    * against the Z-ordered bulk fixture — the reference's fuzzy
    * hour-slice read pattern (TsdbScanner.java:16-53 walks salt×hour
    * key ranges) done with a space-filling curve instead of
    * enumerated salt prefixes. The box decomposes on the driver into
    * ≤ `maxRanges` covering Morton intervals
    * ([[graft.functions.ZOrderKernel.queryRanges]], fixed-depth quad
    * decomposition with interval merging), pushed as ONE
    * `(rowkey >= lo AND rowkey < hi) OR …` disjunction that the
    * `graft-hfile` source prunes against its `_manifest` key ranges at
    * plan time from a single scan node (one directory listing, one
    * manifest read, whatever maxRanges is) — so the scan opens only
    * files whose curve segment can intersect the box, however large
    * the fixture grows. The exact box predicate is
    * re-applied on the decoded coordinates after the scan (the
    * standard residual rule — a budget-capped cover may over-cover,
    * never under-cover), then the hourly rollup aggregates per
    * (user, hour). The oracle replays the box + rollup straight from
    * the events table.
    */
  def zorderRangeScan(events: DataFrame, sfDir: String,
                      userLo: Long = 40L, userHi: Long = 80L,
                      hourLo: Long = 473500L, hourHi: Long = 473599L,
                      maxRanges: Int = 32): DataFrame = {
    import graft.functions.{BytesCodec, ZOrderKernel}
    val spark = events.sparkSession
    val dir = ensureZorderDir(events, sfDir)
    val ranges = ZOrderKernel.queryRanges(userLo, userHi, hourLo, hourHi,
      maxRanges)
    val src = spark.read.format("graft-hfile").load(dir)
    // ONE scan carrying the whole interval set as a pushed disjunction:
    // the source prunes files against every interval from a single
    // (listing, manifest) read — a union of per-interval branches would
    // cost O(maxRanges × listing) plan-time IO and a 32-armed plan
    val rangeDisj = ranges.map { case (zs, ze) =>
      val lo = BytesCodec.encodeShort(0.toShort) ++ BytesCodec.encodeLong(zs)
      val hi = BytesCodec.encodeShort(0.toShort) ++ BytesCodec.encodeLong(ze)
      col("rowkey") >= lit(lo) && col("rowkey") < lit(hi)
    }.reduce(_ || _)
    val scanned = src.filter(col("bucket") === 0 && rangeDisj)
    val z = hb.decode(expr("substring(rowkey, 3, 8)"), LongType)
    scanned
      .select(graft.functions.zo.zorderA(z).as("user_id"),
        graft.functions.zo.zorderB(z).as("epoch_hour"),
        hb.decode(col("value"),
          org.apache.spark.sql.types.DoubleType).as("value"))
      .filter(col("user_id").between(userLo, userHi) &&
        col("epoch_hour").between(hourLo, hourHi))
      .groupBy(col("user_id"), col("epoch_hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("sum_value"))
      .orderBy(col("user_id"), col("epoch_hour"))
  }

  /** DuckDB closed form of java.util.Arrays.hashCode over the 8 big-endian
    * bytes of a non-negative BIGINT column: h = 31^8 + Σ 31^(7-i)·sbyte_i,
    * wrapped to int32. Shared by the B4/B5 oracles.
    */
  def arraysHashCodeSql(col: String): String = {
    val terms = (0 until 8).map { i =>
      val shift = 8 * (7 - i)
      val p = math.pow(31, 7 - i).toLong
      val b = s"(($col >> $shift) & 255)"
      s"$p * ($b - (CASE WHEN $b > 127 THEN 256 ELSE 0 END))"
    }.mkString(" + ")
    // 31^8 = 852891037441; wrap int64 -> int32 two's complement
    s"(((852891037441 + $terms + 2147483648) % 4294967296 + 4294967296) % 4294967296 - 2147483648)"
  }
}
