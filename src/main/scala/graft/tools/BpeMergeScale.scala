package graft.tools

import java.io.{File, PrintWriter}

import graft.operators.Bpe

/** Merge-count scaling proof for the incremental BPE trainer: the old
  * per-iteration full recount was O(merges²·vocab) symbol work, a wall
  * at real tokenizer sizes (32k–100k merges). This tool times
  * [[Bpe.train]] end-to-end (Spark vocab pass + in-memory incremental
  * loop) at growing merge counts over ONE fixed rich corpus — built
  * deterministically (seeded) with every word repeated, so every
  * adjacent pair is eligible and tens of thousands of merges are
  * learnable — and reports marginal seconds-per-merge against the
  * merges=0 baseline (the fixed corpus-pass cost). Flat-or-falling
  * marginal cost = training linear in merges; the quadratic trainer's
  * marginal cost grew linearly with the merge count.
  *
  * usage: runMain graft.tools.BpeMergeScale [outPath]
  */
object BpeMergeScale {
  def main(args: Array[String]): Unit = {
    val outPath = if (args.length > 0) args(0) else "/tmp/bpe_merge_scale.json"
    val spark = graft.Bench.newSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    try {
      import spark.implicits._
      // 60k distinct words, len 8..15, each 2..5 times: ~600k learnable
      // merges' worth of symbols, every pair count >= 2
      val rnd = new scala.util.Random(20260814L)
      val words = (0 until 60000).map { _ =>
        val len = 8 + rnd.nextInt(8)
        (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      }.distinct
      val texts = rnd.shuffle(words.flatMap(w =>
        Seq.fill(2 + rnd.nextInt(4))(w)))
        .grouped(60).map(_.mkString(" ")).toSeq
      val df = texts.toDF("text").repartition(32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      def time(n: Int): Double = {
        val t0 = System.nanoTime()
        val m = Bpe.train(df, "text", nMerges = n)
        val sec = (System.nanoTime() - t0) / 1e9
        require(m.length == n, s"corpus exhausted at ${m.length} < $n")
        sec
      }
      time(0) // warm the vocab pass once before measuring
      val base = Seq.fill(3)(time(0)).min
      val rows = Seq(1000, 4000, 16000, 32000).map { n =>
        val sec = Seq.fill(3)(time(n)).min
        val perMerge = (sec - base) / n * 1e6
        Console.err.println(
          f"bpe merges=$n%6d sec=$sec%.3f marginal_us_per_merge=$perMerge%.2f")
        f"""{"merges":$n,"sec":$sec%.4f,"marginal_us_per_merge":$perMerge%.3f}"""
      }
      val json =
        f"""{"metric":"bpe_merge_scaling","vocab":${words.length},""" +
          f""""base_sec":$base%.4f,"rows":[${rows.mkString(",")}]}"""
      val pw = new PrintWriter(new File(outPath))
      try pw.println(json) finally pw.close()
      println(json)
    } finally spark.stop()
  }
}
