package graft.tools

import graft.operators.Bpe

/** Regenerates the frozen merge list embedded in
  * [[graft.operators.Bpe.frozenMerges]]: trains `n` merges on a given
  * sf documents table and prints the Scala literal. The frozen list is
  * a TOKENIZER ARTIFACT — the deployment posture for encoding is
  * always "train once, freeze, encode everywhere" (a tokenizer.json in
  * the real world), which is also what makes the encode path exactly
  * SQL-replayable (the merges are plan constants in BOTH engines).
  *
  * usage: runMain graft.tools.BpeFreeze [sfDir] [nMerges]
  */
object BpeFreeze {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val n = if (args.length > 1) args(1).toInt else 48
    val spark = graft.Bench.newSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    try {
      val merges = Bpe.train(graft.Tables(spark, dir, "documents"),
        "text", nMerges = n)
      println(s"// ${merges.length} merges trained on $dir documents")
      println(merges.map { case (a, b) => s"""("$a", "$b")""" }
        .grouped(4).map(_.mkString(", ")).mkString("Vector(\n    ", ",\n    ", ")"))
    } finally spark.stop()
  }
}
