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

  test("queryRanges: uncapped covers are exact, capped covers are " +
      "supersets, intervals always sorted disjoint and within budget") {
    val rnd = new scala.util.Random(7L)
    for (_ <- 0 until 40) {
      val a0 = rnd.nextInt(60); val a1 = a0 + rnd.nextInt(60)
      val b0 = rnd.nextInt(60); val b1 = b0 + rnd.nextInt(60)
      val box = for (a <- a0 to a1; b <- b0 to b1)
        yield ZOrderKernel.interleave(a, b)
      val boxSet = box.toSet
      // generous budget: the cover is EXACT — covered z-volume equals
      // the box volume and every box point is covered
      val exact = ZOrderKernel.queryRanges(a0, a1, b0, b1,
        maxRanges = 100000)
      assert(exact.map { case (s, e) => e - s }.sum == boxSet.size.toLong,
        s"box ($a0..$a1)x($b0..$b1): uncapped cover must be exact")
      assert(boxSet.forall(z => exact.exists { case (s, e) => z >= s && z < e }))
      // capped budget: never more than maxRanges intervals, still a
      // superset (over-cover allowed, under-cover never)
      val capped = ZOrderKernel.queryRanges(a0, a1, b0, b1, maxRanges = 8)
      assert(capped.size <= 8)
      assert(boxSet.forall(z => capped.exists { case (s, e) => z >= s && z < e }),
        s"box ($a0..$a1)x($b0..$b1): capped cover lost a point")
      // sorted, disjoint, merged (no two touching intervals survive)
      for (Seq((_, e1), (s2, _)) <- capped.sliding(2) if capped.size > 1)
        assert(e1 < s2, s"intervals must be sorted disjoint: $capped")
    }
    // real-coordinate smoke: the sf-style (user x hour) box stays small
    val r = ZOrderKernel.queryRanges(40, 80, 473500, 473599, maxRanges = 32)
    assert(r.nonEmpty && r.size <= 32)
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
