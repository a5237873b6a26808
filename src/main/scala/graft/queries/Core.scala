package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core analytics queries (SURVEY.md §2 A-series).
  *
  * These re-express, Spark-first, the scan/agg/join/rollup semantics the
  * reference's TSDB pipeline implies (TsdbBulkload.java:81-155 rollups &
  * latest-version cells, TsdbScanner.java:16-53 whole-hour time-range
  * scans, HBaseRowDataLookupFunction.java point-GET lookup joins,
  * HBaseController.java:199-227 interval-batched jobs).
  *
  * Determinism rules (SURVEY.md §5): money aggregates go through exact
  * DECIMAL so float summation order can never flip the driver's hash
  * compare; `events.ts` (ns parquet) is only ever surfaced as epoch
  * millis / hour buckets; every top-N has a full tiebreaker.
  */
object Core {

  /** Exact decimal sum surfaced as double: summation-order independent. */
  private def dsum(c: Column, prec: Int = 18, scale: Int = 4): Column =
    sum(c.cast(DecimalType(prec, scale))).cast("double")

  /** events.ts is read as long nanos (see [[graft.Tables]]); epoch millis
    * via exact integer division.
    */
  private def tsMs: Column = expr("ts DIV 1000000")

  private[queries] def parseUtcMs(s: String): Long =
    java.time.LocalDateTime
      .parse(s, java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli

  /** A1: full-scan aggregation (TPC-H Q1 shape). Map-side partial agg. */
  def q1PricingSummary(lineitem: DataFrame): DataFrame = {
    val disc  = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val charge = disc * (lit(1) + col("l_tax"))
    lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-02")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(disc, 28, 4).as("sum_disc_price"),
        dsum(charge, 28, 6).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** A2: filtered 3-way join + agg + deterministic top-N. Dim side of the
    * join (filtered customers) stays broadcastable at any scale factor.
    */
  def q3ShippingPriority(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame): DataFrame = {
    val cut = to_timestamp(lit("1998-03-15"))
    customer.filter(col("c_mktsegment") === "BUILDING")
      .join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < cut)
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > cut)
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 28, 4)
        .as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_orderdate_ms"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** A3: 6-way star join. Broadcast hints ONLY on the fixed-cardinality
   *  dims (region = 5 rows, nation = 25 — constant at any scale factor).
   *  customer and supplier scale linearly with the corpus, so they carry
   *  NO hint: an explicit `broadcast()` would override
   *  autoBroadcastJoinThreshold and force a driver-side build of a
   *  multi-billion-row table at a real 100 TB scale factor. AQE picks the
   *  side at runtime — it still broadcasts them at small sf, and
   *  shuffle-joins at scale. Shape pinned by PlanShapeSpec.
   */
  def q5RegionRevenue(region: DataFrame, nation: DataFrame,
                      customer: DataFrame, supplier: DataFrame,
                      orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val lo = to_timestamp(lit("1996-01-01"))
    val hi = to_timestamp(lit("1998-01-01"))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier,
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 28, 4)
        .as("revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** A4: window top-N per group with full tiebreakers. */
  def topCustomersPerNation(customer: DataFrame, nation: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    customer
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("rnk"), col("c_custkey"), col("c_name"),
        col("c_acctbal"))
      .orderBy(col("n_name"), col("rnk"))
  }

  /** A5: running (cumulative) revenue by order date; the cumulative sum
    * stays in exact DECIMAL until the final cast.
    */
  def runningRevenue(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The unpartitioned window is DELIBERATE (r19, measured): it runs
    // over the per-day aggregate spine — bounded by retention (≤ ~36 k
    // rows per century), never by order volume — after the one partial-
    // agg shuffle of the raw stream, so the single task holds a few KB
    // at any corpus size. A two-phase rewrite (per-year window + prior-
    // year totals re-based via a triangular year self-join, daily spine
    // localCheckpointed for its two consumers) was implemented, proved
    // oracle-identical, and measured 0.46 → 0.74–0.80 s at bench — the
    // extra agg/join/checkpoint stages cost more than the funnel ever
    // could. Reverted; the WindowExec warning on this operator is benign
    // by construction.
    val daily = orders
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 4))).as("d"))
    val w = Window.orderBy(col("order_date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .select(col("order_date"), col("d").cast("double").as("daily_revenue"),
        sum(col("d")).over(w).cast("double").as("running_revenue"))
      .orderBy(col("order_date"))
  }

  /** A6: lookup join (HBaseRowDataLookupFunction semantics): point-GET of
    * dimension rows by key -> broadcast hash join, LEFT so missed GETs
    * surface as nulls exactly like the connector's null row mode.
    */
  def ordersEnriched(events: DataFrame, customer: DataFrame,
                     nation: DataFrame): DataFrame = {
    events
      .join(broadcast(customer), col("user_id") === col("c_custkey"), "left")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"), "left")
      .groupBy(col("n_name"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n_name"), col("event_type"))
  }

  /** A7: TsdbScanner.buildScan semantics: scan rows whose rowkey time
    * falls in [floor(start,1h), floor(end,1h)) -- expressed as a plain
    * timestamp predicate that pushes down to the parquet scan instead of
    * the reference's FuzzyRowFilter byte gymnastics
    * (TsdbScanner.java:16-53).
    */
  def timeRangeScan(events: DataFrame, startTs: String, endTs: String): DataFrame = {
    val hourMs = 3600L * 1000
    val loMs = parseUtcMs(startTs); val hiMs = parseUtcMs(endTs)
    // whole-hour pinning, then a raw-column predicate so parquet min/max
    // row-group pruning applies (the scan-side analogue of FuzzyRowFilter)
    val loNs = (loMs - loMs % hourMs) * 1000000L
    val hiNs = (hiMs - hiMs % hourMs) * 1000000L
    graft.Tables.tsRange(events, loNs, hiNs)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** A8: HBase keeps the latest cell version per (rowkey, qualifier); the
    * bulkload picks values[last] per qualifier (TsdbBulkload.java:135-137).
    * Same semantics per user here, with a total order (ts ms, event_id) —
    * expressed as a `max_by` aggregation rather than a row_number window
    * so map-side partial aggregation collapses each partition to one
    * candidate per user before the shuffle (a window would shuffle and
    * sort every event).
    */
  def latestEventPerUser(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_id"), col("event_type"), col("value"),
          tsMs.as("ts_ms")),
        struct(tsMs, col("event_id"))).as("e"))
      .select(col("user_id"), col("e.event_id").as("event_id"),
        col("e.event_type").as("event_type"), col("e.value").as("value"),
        col("e.ts_ms").as("ts_ms"))
      .orderBy(col("user_id"))

  /** A9/A10: OpenTSDB rollup tables = pre-aggregated series at a coarser
    * granularity (TsdbBulkload rollup route). One shuffle, partial aggs.
    */
  def rollup(events: DataFrame, granularity: String): DataFrame = {
    val gMs = granularity match {
      case "hour" => 3600000L
      case "day"  => 86400000L
      case other  => throw new IllegalArgumentException(other)
    }
    events
      .groupBy(
        expr(s"((ts DIV 1000000) DIV $gMs) * $gMs").as("bucket_ms"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        (dsum(col("value")) / count(lit(1))).as("avg_value"))
      .orderBy(col("bucket_ms"), col("event_type"))
  }

  /** A22: trailing-window z-score anomaly detection on the hourly
    * rollup series (the TSDB alerting read path): each
    * (event_type, hour) count is tested against the mean/variance of
    * its preceding `window` hours; rows with at least `minBase` base
    * hours and |z| > k are emitted with the trailing mean.
    *
    * The z² > k² rule is cleared of divisions and square roots —
    * `(n·x − S)² > k²·(n·Q − S²)` with S = Σxᵢ, Q = Σxᵢ² over the base
    * window — so the whole test is EXACT integer arithmetic (DECIMAL(38)
    * headroom for the squares: hourly counts up to ~10¹⁸ before
    * overflow). No float drift, no summation-order surface, and a flat
    * series with any deviation still flags (variance 0 ⇒ any dev² > 0
    * trips, the correct alert for a constant baseline).
    *
    * Scale: the window function runs on the ROLLED-UP series —
    * |event types| × |hours| rows (~10⁶/year at 100-type cardinality)
    * — AFTER the one partial-agg rollup shuffle of the raw stream; the
    * per-series sort rides the same exchange. The raw 100 TB never
    * meets a window operator.
    */
  def rollupAnomaly(events: DataFrame, window: Int = 24, minBase: Int = 12,
                    k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = DecimalType(38, 0)
    val hourly = events
      .groupBy(
        expr("((ts DIV 1000000) DIV 3600000) * 3600000").as("bucket_ms"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      // square projected BEFORE the window so all three frame aggs read
      // plain attributes — one Window pass instead of two
      .withColumn("cntsq", col("cnt").cast(dec) * col("cnt").cast(dec))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket_ms"))
      .rowsBetween(-window, -1)
    hourly
      .withColumn("base_n", count(col("cnt")).over(w))
      .withColumn("base_sum", sum(col("cnt")).over(w))
      .withColumn("base_sumsq", sum(col("cntsq")).over(w))
      .filter(col("base_n") >= minBase)
      .withColumn("dev",
        (col("base_n").cast(dec) * col("cnt") - col("base_sum")).cast(dec))
      .withColumn("varn",
        col("base_n").cast(dec) * col("base_sumsq") -
          col("base_sum").cast(dec) * col("base_sum").cast(dec))
      .filter(col("dev") * col("dev") > lit(k.toLong * k) * col("varn"))
      .select(col("event_type"), col("bucket_ms"), col("cnt"),
        col("base_n"),
        expr("CAST((base_sum * 1000) DIV base_n AS LONG)").as("mean_milli"))
      .orderBy(col("event_type"), col("bucket_ms"))
  }

  /** A23: semi-structured ingest — `props` carries a JSON payload (the
    * tag/attribute blob every event pipeline ships); typed fields are
    * extracted AT SCAN TIME (`get_json_object` is codegen'd — the
    * extraction is a pure scan-stage map, no UDF), then aggregated per
    * (event_type, k-decile) through one partial-agg shuffle. Rows whose
    * payload lacks the field drop out before the shuffle.
    */
  def eventsPropsExtract(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").as("ks"))
      // integer-formatted values only: '6.5' would CAST to 6 in Spark
      // but round to 7 under DuckDB's TRY_CAST — gate the format so
      // both engines see identical longs (malformed JSON already
      // surfaces as null from get_json_object)
      .filter(col("ks").rlike("^-?[0-9]+$"))
      .withColumn("k", col("ks").cast("long"))
      // truncating division on BOTH sides: DuckDB's integer `//`
      // truncates toward zero exactly like Spark's DIV (verified:
      // -7 // 10 = 0 there too)
      .withColumn("k_decile", expr("k DIV 10"))
      .groupBy(col("event_type"), col("k_decile"))
      .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"), col("k_decile"))

  /** A24: time-weighted hourly average — the irregular-sample
    * downsample semantics a TSDB needs when samples are not evenly
    * spaced (OpenTSDB/Prometheus-style): within each (event_type,
    * hour) bucket, each sample's value is weighted by its holding time
    * (the millis until the bucket's next sample) and
    * `twavg = Σ vᵢ·wᵢ / (t_last − t_first)`. An evenly-spaced series
    * gives the plain mean; a series that parks at a value for most of
    * the hour is dominated by it — which a plain mean gets wrong.
    * Buckets with no span (single sample / all simultaneous) are
    * dropped (no holding time to weight by).
    *
    * Determinism: weights are exact integer millis, values weight
    * through exact DECIMAL, and the one float step (`tw_sum / span`)
    * is a single division of identical inputs in both engines.
    *
    * Scale: the lead() window partitions by (type, hour) — bounded by
    * one bucket's samples — and rides the same hash exchange the
    * final groupBy uses; one shuffle total.
    */
  def rollupTimeWeighted(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucket = expr("((ts DIV 1000000) DIV 3600000) * 3600000")
    val w = Window.partitionBy(col("event_type"), col("bucket_ms"))
      .orderBy(col("ts_ms"), col("event_id"))
    events
      .select(col("event_type"), bucket.as("bucket_ms"),
        expr("ts DIV 1000000").as("ts_ms"), col("event_id"), col("value"))
      .withColumn("w_ms", coalesce(lead(col("ts_ms"), 1).over(w) -
        col("ts_ms"), lit(0L)))
      .groupBy(col("event_type"), col("bucket_ms"))
      .agg(count(lit(1)).as("n_samples"),
        (max(col("ts_ms")) - min(col("ts_ms"))).as("span_ms"),
        sum(col("value").cast(DecimalType(18, 4)) * col("w_ms"))
          .cast("double").as("tw_sum"))
      .filter(col("span_ms") > 0)
      .withColumn("twavg", col("tw_sum") / col("span_ms"))
      .select(col("event_type"), col("bucket_ms"), col("n_samples"),
        col("span_ms"), col("twavg"))
      .orderBy(col("event_type"), col("bucket_ms"))
  }

  /** A12: point-in-time lookup (as-of join): each event gets the user's
    * latest order at/before the event — the versioned-cell GET
    * (`Get.setTimeRange`) semantics of the reference's lookup path, as
    * a single-shuffle union+window plan (see
    * [[graft.operators.AsOfJoin]]).
    */
  def asofLatestOrder(events: DataFrame, orders: DataFrame): DataFrame = {
    val right = orders
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("last_orderkey"))
      .select(col("o_custkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("order_ms"),
        col("last_orderkey"))
    val left = events.select(col("event_id"), col("user_id"), tsMs.as("ts_ms"))
    graft.operators.AsOfJoin
      .asOf(left, "user_id", "ts_ms", right, "o_custkey", "order_ms")
      .orderBy(col("event_id"))
  }

  /** A13: range-containment join with no equi key: per 6-hour
    * maintenance window (anchored at every 997th event's hour), the
    * events falling inside it — bucketed to a hash join instead of a
    * nested loop (see [[graft.operators.RangeJoin]]).
    *
    * The window set is id-bounded so it stays FIXED-SIZE as the event
    * stream scales (the C12 eval-slice pattern): a real report's
    * window list doesn't grow with its input, and without the bound
    * the benchmark's own workload was quadratic under replication —
    * points × windows both grew 100×, a 10,000× join output that
    * measured as ratio100 51.9 with the engine itself still outpacing
    * the output growth. Every driver-SF event id sits under the
    * bound, so small-scale results are unchanged.
    */
  def rangeWindowStats(events: DataFrame): DataFrame = {
    val pts = events.select(col("event_id"), tsMs.as("ts_ms"), col("value"))
    val hourStart = tsMs - (tsMs % lit(3600000L))
    val iv = events
      .filter(pmod(col("event_id"), lit(997)) === 0 &&
        col("event_id") < 100000L)
      .select(col("event_id").as("window_id"), hourStart.as("start_ms"),
        (hourStart + lit(6L * 3600000L)).as("end_ms"))
    graft.operators.RangeJoin
      .bucketed(pts, "ts_ms", iv, "start_ms", "end_ms", bucketMs = 3600000L)
      .groupBy(col("window_id"), col("start_ms"), col("end_ms"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy(col("window_id"))
  }

  /** A14: gap-based sessionization (30-min gap) with per-session stats
    * — see [[graft.operators.Sessionize]].
    */
  def sessionStats(events: DataFrame, gapMs: Long = 1800000L): DataFrame =
    graft.operators.Sessionize
      .stats(events.select(col("user_id"), col("event_id"), tsMs.as("ts_ms")),
        "user_id", "ts_ms", "event_id", gapMs)
      .orderBy(col("user_id"), col("session_idx"))

  /** A15: per-type value percentiles. `exact = true` (the oracle mode)
    * uses interpolated `percentile`, matching DuckDB quantile_cont
    * bit-for-bit — it buffers every group value in executor memory, so
    * it is only safe when groups are modest. `exact = false` is the
    * 100 TB path: `approx_percentile` keeps a bounded mergeable sketch
    * per group (map-side partials, no per-value buffering); `accuracy`
    * trades sketch size for error ≈ 1/accuracy (spec asserts ≤1%
    * relative vs exact at test scale).
    */
  def rollupPercentiles(events: DataFrame, exact: Boolean = true,
                        accuracy: Int = 10000): DataFrame = {
    val pct: Double => Column =
      if (exact) p => expr(s"percentile(value, $p)")
      else p => expr(s"approx_percentile(value, $p, $accuracy)").cast("double")
    events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(pct(0.5), 6).as("p50"),
        round(pct(0.9), 6).as("p90"),
        round(pct(0.95), 6).as("p95"),
        round(pct(0.99), 6).as("p99"))
      .orderBy(col("event_type"))
  }

  /** A18: coarser rollup FROM the finer rollup — OpenTSDB's rollup-table
    * cascade (hourly table feeds the daily table) and the reason
    * pre-aggregation works at 100 TB: the daily pass re-aggregates
    * O(types × hours) hourly rows instead of re-scanning the raw
    * stream. Counts add, sums add (through exact DECIMAL so the result
    * is bit-identical to a from-raw daily rollup — asserted by the
    * oracle), min/max fold, and avg is recomputed from the merged
    * sum/count (never averaged-of-averages).
    */
  def rollupMerge(hourly: DataFrame): DataFrame = {
    val mergedSum = sum(col("sum_value").cast(DecimalType(18, 4)))
      .cast("double")
    hourly
      .groupBy(
        expr("(bucket_ms DIV 86400000) * 86400000").as("bucket_ms"),
        col("event_type"))
      .agg(
        sum(col("n_events")).as("n_events"),
        mergedSum.as("sum_value"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"),
        (mergedSum / sum(col("n_events"))).as("avg_value"))
      .orderBy(col("bucket_ms"), col("event_type"))
  }

  /** A21: incremental rollup maintenance (round 10) — the reason rollup
    * PARTIALS (count/sum/min/max, avg derived) are the stored form: when
    * a new slice of the stream lands, the maintained hourly table is
    * updated by rolling up ONLY the new slice and merging partials on
    * (bucket, type) — history is never rescanned. At 100 TB the
    * alternative (recompute from raw) pays the full corpus scan per
    * ingest cycle; the incremental path pays O(delta) + a merge over
    * O(types × hours) partial rows.
    *
    * The cutoff is deliberately NOT hour-aligned, so the boundary hour
    * genuinely exists as two partial rows (one per slice) and the merge
    * is exercised, not just unioned disjoint keys. Counts add, sums add
    * through exact DECIMAL (bit-identical to a from-raw rollup — the
    * oracle IS rollup_hourly's from-raw SQL), min/max fold, avg is
    * recomputed from merged sum/count.
    */
  def rollupIncremental(events: DataFrame,
                        cutoffMs: Long = 1705325862000L): DataFrame = {
    def partials(slice: DataFrame): DataFrame = slice
      .groupBy(
        expr("((ts DIV 1000000) DIV 3600000) * 3600000").as("bucket_ms"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
    val merged = partials(events.filter(tsMs < cutoffMs))
      .union(partials(events.filter(tsMs >= cutoffMs)))
    val mergedSum = sum(col("sum_value").cast(DecimalType(18, 4)))
      .cast("double")
    merged
      .groupBy(col("bucket_ms"), col("event_type"))
      .agg(
        sum(col("n_events")).as("n_events"),
        mergedSum.as("sum_value"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"),
        (mergedSum / sum(col("n_events"))).as("avg_value"))
      .orderBy(col("bucket_ms"), col("event_type"))
  }

  /** A16: distinct-cardinality rollup. `exact = true` (the oracle mode)
    * runs `count(distinct)` — Catalyst expands it to a two-phase
    * aggregate whose first shuffle carries every (type, user) pair.
    * `exact = false` is the 100 TB path: `approx_count_distinct`
    * (HyperLogLog++) keeps an O(1)-size mergeable sketch per group, one
    * map-side-combined shuffle total; `rsd` is the target relative
    * standard deviation (spec asserts ≤5% observed error vs exact).
    */
  def rollupDistinct(events: DataFrame, exact: Boolean = true,
                     rsd: Double = 0.01): DataFrame = {
    val nUsers =
      if (exact) countDistinct(col("user_id"))
      else approx_count_distinct(col("user_id"), rsd)
    events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), nUsers.as("n_users"))
      .orderBy(col("event_type"))
  }

  /** A19: per-type heavy hitters — top-`k` users by event count, the
    * "hottest series per metric" question (and the hottest-domain /
    * hottest-template question of a curation pipeline). `approx = false`
    * (the oracle mode) is a plain partial-agg groupBy + window top-k —
    * exact, but its first shuffle carries the full (type, user) key
    * space. `approx = true` is the 100 TB path, a sketch-then-refine
    * two-pass (the standard heavy-hitter pattern): pass 1 runs the
    * mergeable Misra–Gries aggregate
    * ([[graft.functions.FreqItemsSketch]]) per type — the shuffle
    * carries ≤ `capacity` counters per type per map task, NOT the
    * distinct-user space — whose guarantee (any item with true count
    * > n/(capacity+1) is present) makes the candidate set a superset
    * of the true top-k whenever the hitters clear that mass bound;
    * pass 2 broadcasts the ≤ types·capacity candidates, semi-joins,
    * and counts them EXACTLY, so the final ranking is deterministic
    * (sketch count_lb values are arrival-order-dependent and are never
    * ranked on). Spec asserts approx == exact on a skew where the
    * guarantee binds, and repartitioning-independence of the refined
    * result.
    */
  def heavyHitters(events: DataFrame, k: Int = 3, approx: Boolean = false,
                   capacity: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counted =
      if (!approx)
        events.groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
      else {
        val cands = events.groupBy(col("event_type"))
          .agg(graft.functions.FreqItemsSketch(col("user_id"), capacity)
            .as("sk"))
          .select(col("event_type"), explode(col("sk")).as("c"))
          .select(col("event_type"), col("c.item").as("user_id"))
        events.join(broadcast(cands), Seq("event_type", "user_id"),
            "left_semi")
          .groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
      }
    counted
      .withColumn("rnk", row_number().over(Window
        .partitionBy(col("event_type"))
        .orderBy(col("n_events").desc, col("user_id"))))
      .filter(col("rnk") <= k)
      .select(col("event_type"), col("rnk").cast("long").as("rnk"),
        col("user_id"), col("n_events"))
      .orderBy(col("event_type"), col("rnk"))
  }

  /** A20: OpenTSDB rate conversion — the `rate` / counter read path a
    * TSDB serves from exactly the tables the reference bulk-loads: per
    * series (user, type) in (ts, event_id) order, the per-second delta
    * between adjacent samples. Two semantics side by side:
    *
    *  - `rate`: the plain gauge derivative `(v − v_prev) / Δt_sec` —
    *    negative deltas pass through;
    *  - `crate`: COUNTER semantics — counters only climb, so a negative
    *    delta means the counter reset and the sample's whole value
    *    accumulated since (OpenTSDB's reset rule with no counterMax):
    *    `v / Δt_sec`.
    *
    * A series' first sample has no predecessor and two samples on the
    * same millisecond have Δt = 0: neither has a defined rate, and a
    * NULL double round-trips as NaN (which no engine-agnostic compare
    * can equate), so those rows are DROPPED — the rate stream starts at
    * each series' second distinct-ms sample, never emits ±Infinity.
    * Every arithmetic step is a single IEEE double op in a fixed shape,
    * so the oracle's replay is bit-identical (no summation-order
    * surface).
    *
    * Scale shape: ONE shuffle on the series key with an in-partition
    * (ts, id) sort — window partitions are bounded by a single series'
    * sample count, never the corpus; the trailing orderBy is
    * presentation-only.
    */
  def rollupRate(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_ms"), col("event_id"))
    events
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts DIV 1000000").as("ts_ms"), col("value"))
      .withColumn("pv", lag(col("value"), 1).over(w))
      .withColumn("pm", lag(col("ts_ms"), 1).over(w))
      .filter(col("pm").isNotNull && col("ts_ms") =!= col("pm"))
      .withColumn("dt_sec", (col("ts_ms") - col("pm")) / lit(1000.0))
      .withColumn("rate", (col("value") - col("pv")) / col("dt_sec"))
      .withColumn("crate",
        when(col("value") >= col("pv"),
          (col("value") - col("pv")) / col("dt_sec"))
          .otherwise(col("value") / col("dt_sec")))
      .select(col("user_id"), col("event_type"), col("ts_ms"),
        col("event_id"), col("rate"), col("crate"))
      .orderBy(col("user_id"), col("event_type"), col("ts_ms"),
        col("event_id"))
  }

  /** A17: gap-filled hourly downsample — OpenTSDB's downsample fill
    * policies over the A9 rollup. Hours with no events appear with
    * `n_events = 0`, `is_gap = true`, `sum_value` carried forward from
    * the previous non-empty hour (PREVIOUS fill; the first hours of a
    * series can still be null if the series starts with a gap — it
    * never does here since spans start at each type's first event),
    * and `lin_sum` LINEAR-interpolated between the previous and next
    * non-empty hours in proportion to the gap position (OpenTSDB's
    * `FillPolicy`/interpolation downsample; interior gaps only by the
    * same spine argument, and a present hour interpolates to itself).
    *
    * Scale shape: the raw stream first reduces to one row per
    * (type, hour) via a partial-aggregating groupBy; the spine
    * (`sequence` + explode) and the two fill windows (carry-forward,
    * and the mirrored carry-backward for the interpolation endpoints)
    * then operate on O(types × hours) rollup rows — bounded by the
    * time span, not the event count — so the per-type window partition
    * holds e.g. ~88k rows for a decade of hours regardless of volume.
    */
  def rollupFill(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = expr("ts DIV 1000000 DIV 3600000") // epoch hour, integer math
    val b = events
      .groupBy(col("event_type"), h.as("h"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("raw_sum"))
    val spine = b.groupBy(col("event_type"))
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"))).as("h"))
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val presentH = when(col("n_events").isNotNull, col("h"))
    spine.join(b, Seq("event_type", "h"), "left")
      .withColumn("pv", last(col("raw_sum"), ignoreNulls = true).over(wPrev))
      .withColumn("ph", last(presentH, ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("raw_sum"), ignoreNulls = true).over(wNext))
      .withColumn("nh", first(presentH, ignoreNulls = true).over(wNext))
      .select(col("event_type"),
        (col("h") * 3600000L).as("bucket_ms"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        (col("n_events").isNull).as("is_gap"),
        col("pv").as("sum_value"),
        // identical operation tree to the oracle SQL: * before /, long
        // hour deltas promoted to double at the multiply
        round(when(col("nh") === col("ph"), col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (col("h") - col("ph")) / (col("nh") - col("ph"))), 6)
          .as("lin_sum"))
      .orderBy(col("event_type"), col("bucket_ms"))
  }

  /** A11: HBaseController.batchBulkload splits [start,end) into
    * timeInterval-sized jobs (HBaseController.java:199-227). In Spark the
    * split is a bucketing expression inside ONE job -- no per-interval
    * job submission.
    */
  def batchIntervalStats(events: DataFrame, startMs: Long, endMs: Long,
                         intervalMs: Long): DataFrame = {
    val ms = tsMs
    events
      .filter(ms >= startMs && ms < endMs)
      .groupBy(floor((ms - lit(startMs)) / lit(intervalMs)).as("interval_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value")).as("sum_value"))
      .withColumn("interval_start_ms",
        (col("interval_id") * lit(intervalMs) + lit(startMs)))
      .orderBy(col("interval_id"))
  }
}
