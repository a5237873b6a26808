package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main: stage-by-stage wall timing of the corpus_curate
  * composition on a documents dir (`runMain graft.tools.TimeStages
  * <dir>`), to locate which stage dominates at scale.
  */
object TimeStages {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[stage] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    time("scan_only")(docs.count())
    time("quality_filter")(docs
      .withColumn("quality", graft.operators.TextOps.qualityScore(col("text")))
      .filter(col("quality") >= 0.7).count())
    time("fp_collapse")(docs
      .groupBy(md5(graft.operators.Dedup.normalized(col("text"))).as("fp"))
      .agg(min(col("doc_id"))).count())
    time("decon_gate") {
      val isEval = col("doc_id") % 7 === 0 && col("doc_id") < 50000
      graft.operators.Dedup.decontaminate(docs.filter(!isEval),
        docs.filter(isEval), "doc_id", "text", k = 5).count()
    }
    time("full_curate")(graft.queries.Pipeline.corpusCurate(docs).count())
    val ws = split(trim(col("text")), "\\s+")
    time("split_only")(docs.filter(size(ws) > 3).count())
    time("split_distinct")(docs.filter(
      size(array_distinct(ws)) > 3).count())
    time("stopword_filter")(docs.filter(size(filter(ws,
      w => w.isin(graft.operators.TextOps.Stopwords: _*))) >= 0).count())
    time("punct_extract_all")(docs.filter(
      size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9\\s]"), lit(0)))
        >= 0).count())
    spark.stop()
  }
}
