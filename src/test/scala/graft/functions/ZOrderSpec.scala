package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def naive(a: Long, b: Long): Long =
    (0 until 32).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
    }

  test("kernel: known values, naive-loop parity, round-trip") {
    assert(ZOrderKernel.interleave(0L, 0L) == 0L)
    assert(ZOrderKernel.interleave(1L, 0L) == 2L)  // a at odd positions
    assert(ZOrderKernel.interleave(0L, 1L) == 1L)
    assert(ZOrderKernel.interleave(3L, 0L) == 10L) // 0b1010
    val samples = Seq(0L, 1L, 2L, 7L, 12345L, 0x7fffffffL, 0xffffffffL,
      0xdeadbeefL) ++ (0 until 50).map(i => (i * 2654435761L) & 0xffffffffL)
    for (a <- samples.take(12); b <- samples.take(12)) {
      val z = ZOrderKernel.interleave(a, b)
      assert(z == naive(a, b), s"interleave($a, $b)")
      assert(ZOrderKernel.aOf(z) == (a & 0xffffffffL))
      assert(ZOrderKernel.bOf(z) == (b & 0xffffffffL))
    }
  }

  test("graft_zorder SQL arity errors are AnalysisExceptions") {
    graft.GraftExtensions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_zorder(1L)").collect()
    }
    assert(e.getMessage.contains("graft_zorder"))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_zorder(1L, 2L, 3L)").collect()
    }
  }

  test("column API runs in codegen and matches the kernel") {
    val df = Seq((3L, 5L), (100L, 473000L), (0L, 0L)).toDF("a", "b")
      .withColumn("z", zo.zorder($"a", $"b"))
      .withColumn("a2", zo.zorderA($"z"))
      .withColumn("b2", zo.zorderB($"z"))
    df.collect().foreach { r =>
      assert(r.getAs[Long]("z") ==
        ZOrderKernel.interleave(r.getAs[Long]("a"), r.getAs[Long]("b")))
      assert(r.getAs[Long]("a2") == r.getAs[Long]("a"))
      assert(r.getAs[Long]("b2") == r.getAs[Long]("b"))
    }
  }

  test("locality: sorting by z clusters both dimensions") {
    // points on a 32x32 grid; walk the z-sorted order and measure the
    // average Chebyshev step — the Morton curve guarantees mostly-small
    // steps (vs ~10.7 expected for a random permutation of the grid)
    val pts = for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong)
    val sorted = pts.sortBy { case (x, y) => ZOrderKernel.interleave(x, y) }
    val steps = sorted.sliding(2).map {
      case Seq((x1, y1), (x2, y2)) =>
        math.max(math.abs(x2 - x1), math.abs(y2 - y1)).toDouble
      case _ => 0.0
    }.toSeq
    assert(steps.sum / steps.size < 2.0, s"avg z-step ${steps.sum / steps.size}")
  }
}
