package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators for training-data
  * pipelines (SURVEY.md §2 C7/C8).
  *
  * A 100 TB corpus cannot be split with `rand()`: the assignment must
  * be reproducible across reruns, stable under repartitioning, and
  * consistent between engines (so an audit query in another SQL engine
  * lands every row in the same split). The standard trick is a salted
  * content hash: `md5(id || ':' || seed)` is uniform over hex strings,
  * so comparing a fixed-length hex prefix against `floor(p * 16^k)`
  * thresholds yields an exact-probability, deterministic assignment.
  * The reference has no sampling surface (its pipelines move whole
  * tables); this generalizes its deterministic-rowkey philosophy
  * (hbase-bulkload-service `HBaseSerde.java:154` — stable keys from
  * content, never from runtime state) to subsetting.
  *
  * Everything here is a narrow map/filter over the scan — no shuffle,
  * no state — so it composes with any downstream operator at any
  * scale, and Parquet column pruning keeps the scan at (id + carried
  * columns).
  */
object Sampling {

  /** Number of leading md5 hex chars compared against thresholds.
    * 4 chars = 16 bits: probabilities quantize to 1/65536, plenty for
    * split weights, and the comparison is a cheap 4-byte string `<`.
    */
  val HexDigits = 4

  private val Space = 1 << (4 * HexDigits) // 65536

  /** `floor(p * 65536)` as a zero-padded hex literal — the exact
    * threshold a uniform 4-hex-char key is compared against. Public so
    * oracle SQL can embed the identical literal. `p = 1.0` returns
    * `"g"`, which sorts after every hex string, so a keep-everything
    * fraction really keeps the `ffff`-prefixed rows too (a `"ffff"`
    * threshold would silently drop 1 in 65536).
    */
  def hexThreshold(p: Double): String = {
    require(p >= 0 && p <= 1, s"fraction $p out of [0,1]")
    val t = math.floor(p * Space).toLong
    if (t >= Space) "g" else f"$t%04x"
  }

  /** The salted uniform hash key: first 4 hex chars of
    * `md5(id ++ ":" ++ seed)`. Deterministic in (id, seed) only.
    */
  def hashKey(id: Column, seed: Long): Column =
    substring(md5(concat(id.cast("string"), lit(":" + seed))), 1, HexDigits)

  /** Assigns every row a named split with exact cumulative-threshold
    * probabilities, e.g. `Seq("train" -> 0.8, "val" -> 0.1,
    * "test" -> 0.1)`. Weights must sum to 1 (±1e-9); the final split
    * absorbs the remainder so every row is assigned.
    */
  def deterministicSplit(df: DataFrame, idCol: String,
                         weights: Seq[(String, Double)],
                         seed: Long = 42L): DataFrame = {
    require(weights.nonEmpty, "at least one split")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"weights must sum to 1: $weights")
    val key = hashKey(col(idCol), seed)
    val cums = weights.map(_._2).scanLeft(0.0)(_ + _).tail
    // last branch is the otherwise-arm: no rounding gap can drop a row
    val assigned = weights.init.zip(cums.init).foldRight(
        lit(weights.last._1)) { case (((name, _), cum), acc) =>
      when(key < lit(hexThreshold(cum)), name).otherwise(acc)
    }
    df.withColumn("split", assigned)
  }

  /** Keeps a deterministic `fractions(stratum)` share of each stratum
    * (`default` for unlisted strata). Unlike `DataFrame.stat.sampleBy`
    * this is exactly reproducible row-by-row: membership depends only
    * on (id, seed), never on partitioning or iteration order.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double], default: Double,
                       seed: Long = 42L): DataFrame = {
    val key = hashKey(col(idCol), seed)
    val thr = fractions.foldRight(lit(hexThreshold(default))) {
      case ((stratum, p), acc) =>
        when(col(strataCol) === stratum, lit(hexThreshold(p))).otherwise(acc)
    }
    df.filter(key < thr)
  }
}
