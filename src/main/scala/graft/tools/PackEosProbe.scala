package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scratch main: phase timing of C32 vs C32c at a scaled documents dir
  * (`runMain graft.tools.PackEosProbe <dir>`), to locate where the EOS
  * variant's extra wall time goes (encode+checkpoint vs span manifest
  * vs gather).
  */
object PackEosProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def phase(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[phase] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    for (eos <- Seq(false, true)) {
      val sep = if (eos) Some(graft.functions.bpe.eosId(
        graft.operators.Bpe.frozenMerges)) else None
      val base = docs.select(col("doc_id"),
        graft.functions.bpe.encodeIds(col("text"),
          graft.operators.Bpe.frozenMerges).as("ids"))
      val withSep = sep.map(e => base.withColumn("ids",
        concat(col("ids"), array(lit(e))))).getOrElse(base)
      var ids: org.apache.spark.sql.DataFrame = null
      phase(s"encode+checkpoint eos=$eos") {
        ids = withSep.select(col("doc_id"), col("ids").as("_ids"))
          .localCheckpoint()
        ids.count()
      }
      var spans: org.apache.spark.sql.DataFrame = null
      phase(s"span manifest eos=$eos") {
        spans = graft.operators.Packing.sequenceSpans(
          ids.select(col("doc_id"),
            size(col("_ids")).cast("long").as("_n")),
          "doc_id", "_n", 2048L)
        spans.count()
      }
      phase(s"gather eos=$eos") {
        spans.join(ids, Seq("doc_id"))
          .withColumn("_slice", slice(col("_ids"),
            (col("pos_in_doc") + 1).cast("int"),
            col("span_len").cast("int")))
          .groupBy(col("seq_id"))
          .agg(flatten(transform(
            sort_array(collect_list(struct(col("offset"), col("_slice")))),
            s => s("_slice"))).as("ids"))
          .count()
      }
    }
    spark.stop()
  }
}
