package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase salted aggregation for skewed grouping keys.
  *
  * A hot key (one user, one metric) funnels its whole partition through
  * a single reducer in a plain groupBy. Salting splits each key into
  * `salts` sub-keys so phase 1 spreads the hot key over `salts` tasks;
  * phase 2 merges the per-salt partials — its input is at most
  * `salts × |keys|` rows, so the second shuffle is tiny.
  *
  * Only reassociable aggregates are supported (sum/count/min/max and
  * avg via sum+count) — exactly the set that can be split this way.
  */
object SkewAgg {

  /** Reassociable aggregate spec: how to compute the phase-1 partial
    * and how to merge partials in phase 2 (referencing the partial's
    * output name).
    */
  case class Agg(partial: Column, merge: String => Column, name: String)

  def sumOf(c: Column, name: String): Agg =
    Agg(sum(c), n => sum(col(n)), name)
  def countAll(name: String): Agg =
    Agg(count(lit(1)), n => sum(col(n)), name)
  def minOf(c: Column, name: String): Agg =
    Agg(min(c), n => min(col(n)), name)
  def maxOf(c: Column, name: String): Agg =
    Agg(max(c), n => max(col(n)), name)

  /** groupBy(keys).agg(aggs) with a `salts`-way salt on phase 1. The
    * result equals the unsalted aggregation for any reassociable aggs.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                aggs: Seq[Agg]): DataFrame = {
    require(aggs.nonEmpty && salts > 0)
    val salt = pmod(spark_partition_id() + monotonically_increasing_id(),
      lit(salts)).as("_salt")
    val phase1 = df
      .withColumn("_salt", salt)
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(aggs.head.partial.as(aggs.head.name),
        aggs.tail.map(a => a.partial.as(a.name)): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(aggs.head.merge(aggs.head.name).as(aggs.head.name),
        aggs.tail.map(a => a.merge(a.name).as(a.name)): _*)
  }
}
