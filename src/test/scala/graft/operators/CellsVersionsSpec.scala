package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multi-version cell retention (SURVEY §2 B10): last N versions per
  * (rowkey, family, qualifier), newest first — the general form of the
  * reference's versions-map explode (TsdbBulkload.java:120-155).
  */
class CellsVersionsSpec extends SparkSpec {
  import spark.implicits._

  private def cells = Seq(
    // (rowkey byte, family, qualifier, ts, value): key A/q1 has 4 versions
    (Array[Byte](1), "f", "q1", 10L, Array[Byte](10)),
    (Array[Byte](1), "f", "q1", 40L, Array[Byte](40)),
    (Array[Byte](1), "f", "q1", 20L, Array[Byte](20)),
    (Array[Byte](1), "f", "q1", 30L, Array[Byte](30)),
    (Array[Byte](1), "f", "q2", 15L, Array[Byte](15)),
    (Array[Byte](2), "f", "q1", 99L, Array[Byte](99))
  ).toDF("rowkey", "family", "qualifier", "ts", "value")

  test("keeps the newest n versions per cell, rank 1 = newest") {
    val out = Cells.lastVersions(cells, n = 2).collect()
    assert(out.length == 4) // 2 of 4 for A/q1, 1 for A/q2, 1 for B/q1
    val aq1 = out.filter(r => r.getAs[Array[Byte]]("rowkey").head == 1 &&
        r.getAs[String]("qualifier") == "q1")
      .sortBy(_.getAs[Long]("version_rank"))
    assert(aq1.map(_.getAs[Long]("ts")).toSeq == Seq(40L, 30L))
    assert(aq1.map(_.getAs[Long]("version_rank")).toSeq == Seq(1L, 2L))
    // singleton cells survive with rank 1
    assert(out.count(_.getAs[Long]("version_rank") == 1L) == 3)
  }

  test("n = 1 agrees with latestVersion") {
    val top1 = Cells.lastVersions(cells, n = 1)
      .select("rowkey", "family", "qualifier", "ts")
      .as[(Array[Byte], String, String, Long)].collect()
      .map { case (rk, f, q, ts) => (rk.toSeq, f, q, ts) }.toSet
    val latest = Cells.latestVersion(cells)
      .select("rowkey", "family", "qualifier", "ts")
      .as[(Array[Byte], String, String, Long)].collect()
      .map { case (rk, f, q, ts) => (rk.toSeq, f, q, ts) }.toSet
    assert(top1 == latest)
  }
}
