package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.math.{BigDecimal => JBigDecimal}
import java.sql.{Date, Timestamp}

/** Expression-level encode→decode identity across the full HBase-typed
  * field set (SURVEY.md §2 B7) — exercises both codegen and the typed
  * byte layouts end to end through the Catalyst expressions.
  */
class HbSerdeSpec extends SparkSpec {

  private def roundTrip(dt: DataType, value: Any): Any = {
    val schema = StructType(Seq(StructField("v", dt, nullable = true)))
    val df = spark.createDataFrame(
      java.util.List.of[Row](Row(value)), schema)
    df.select(hb.decode(hb.encode(col("v")), dt).as("r")).head().get(0)
  }

  test("encode→decode identity for every supported type") {
    assert(roundTrip(LongType, 123456789012L) == 123456789012L)
    assert(roundTrip(IntegerType, -42) == -42)
    assert(roundTrip(ShortType, 7.toShort) == 7.toShort)
    assert(roundTrip(ByteType, (-5).toByte) == (-5).toByte)
    assert(roundTrip(DoubleType, math.Pi) == math.Pi)
    assert(roundTrip(FloatType, 2.5f) == 2.5f)
    assert(roundTrip(BooleanType, true) == true)
    assert(roundTrip(StringType, "héllo") == "héllo")
    assert(roundTrip(BinaryType, Array[Byte](1, 2, 3))
      .asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, 3))
    assert(roundTrip(DateType, Date.valueOf("2024-02-29")) ==
      Date.valueOf("2024-02-29"))
    val ts = Timestamp.valueOf("2024-01-15 10:30:00.123")
    assert(roundTrip(TimestampType, ts) == ts) // ms precision preserved
    // sql.Time parity (HBaseTypeUtils.java:72 case 11): millis-of-day
    // as an 8-byte long
    val t = java.time.LocalTime.parse("10:30:00.123")
    assert(roundTrip(TimeType(), t) == t)
    assert(roundTrip(DecimalType(18, 4), new JBigDecimal("12345.6789")) ==
      new JBigDecimal("12345.6789"))
  }

  test("time-of-day sub-millisecond precision floors (reference stores ms)") {
    val t = java.time.LocalTime.parse("23:59:59.123456")
    assert(roundTrip(TimeType(), t) == java.time.LocalTime.parse("23:59:59.123"))
  }

  test("timestamp sub-millisecond precision floors (HBase stores ms)") {
    val ts = Timestamp.valueOf("2024-01-15 10:30:00.123456")
    val back = roundTrip(TimestampType, ts).asInstanceOf[Timestamp]
    assert(back == Timestamp.valueOf("2024-01-15 10:30:00.123"))
  }

  test("null round-trips as null") {
    assert(roundTrip(LongType, null) == null)
    assert(roundTrip(StringType, null) == null)
  }
}
