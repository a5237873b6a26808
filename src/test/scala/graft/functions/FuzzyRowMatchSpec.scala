package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FuzzyRowFilter parity (TsdbScanner.java:16-53): mask byte 0 pins the
  * pattern byte, nonzero wildcards it; any pair matching ⇒ row matches.
  */
class FuzzyRowMatchSpec extends SparkSpec {
  import spark.implicits._

  test("kernel: fixed bytes pin, wildcard bytes ignore, short rows never match") {
    def m(row: Array[Byte], pat: Array[Byte], mask: Array[Byte]) =
      BytesCodec.fuzzyMatch(row, Array(pat), Array(mask))
    val pat = Array[Byte](0, 0, 0, 9, 8)
    val mask = Array[Byte](1, 1, 1, 0, 0)
    assert(m(Array[Byte](5, 6, 7, 9, 8), pat, mask))      // wildcards differ: ok
    assert(m(Array[Byte](5, 6, 7, 9, 8, 42), pat, mask))  // longer row: ok
    assert(!m(Array[Byte](5, 6, 7, 9, 7), pat, mask))     // pinned byte differs
    assert(!m(Array[Byte](5, 6, 7, 9), pat, mask))        // shorter than pattern
  }

  test("kernel: OR across pairs, reference's 7-byte time filter shape") {
    val mask = Array[Byte](1, 1, 1, 0, 0, 0, 0)
    val hours = Array(3600, 7200)
    val pats = hours.map(h => Array[Byte](0, 0, 0) ++ BytesCodec.encodeInt(h))
    val masks = Array(mask, mask)
    def row(metric: Int, sec: Int) =
      Array[Byte](metric.toByte, 0, 1) ++ BytesCodec.encodeInt(sec) ++
        BytesCodec.encodeLong(99L)
    assert(BytesCodec.fuzzyMatch(row(1, 3600), pats, masks))
    assert(BytesCodec.fuzzyMatch(row(200, 7200), pats, masks))
    assert(!BytesCodec.fuzzyMatch(row(1, 10800), pats, masks))
  }

  test("expression filters a DataFrame through codegen") {
    val df = Seq(1L, 2L, 3L, 256L, 257L).toDF("id")
      .select(col("id"), hb.encode(col("id")).as("rk"))
    // pin the low byte to 1 (ids 1 and 257), wildcard the rest
    val pat = BytesCodec.encodeLong(1L)
    val mask = Array.fill[Byte](7)(1) :+ 0.toByte
    val got = df.filter(hb.fuzzyRowMatch(col("rk"), Seq((pat, mask))))
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 257L))
  }

  test("fuzzyScan with no selected hours is the natural empty scan") {
    val events = sf("events")
    // hour slots that never intersect the span, and a sub-hour span:
    // both produce zero (pattern, mask) pairs — must yield an empty
    // frame, not a plan-time IllegalArgumentException
    val disjoint = graft.queries.HModel.fuzzyScan(events,
      "2024-01-10 05:37:00", "2024-01-25 17:02:00", hoursOfDay = Seq.empty)
    assert(disjoint.count() == 0)
    val subHour = graft.queries.HModel.fuzzyScan(events,
      "2024-01-10 05:10:00", "2024-01-10 05:20:00",
      hoursOfDay = (0 until 24))
    assert(subHour.count() == 0)
    // schema matches the non-degenerate query's
    val normal = graft.queries.HModel.fuzzyScan(events,
      "2024-01-10 05:37:00", "2024-01-25 17:02:00", hoursOfDay = Seq(3, 15))
    assert(disjoint.schema == normal.schema)
  }

  test("expression rejects non-binary input and empty pair lists") {
    val df = Seq(1L).toDF("id")
    intercept[Exception] {
      df.filter(hb.fuzzyRowMatch(col("id"),
        Seq((Array[Byte](0), Array[Byte](0))))).collect()
    }
    intercept[IllegalArgumentException] {
      hb.fuzzyRowMatch(col("id"), Seq.empty)
    }
  }
}
