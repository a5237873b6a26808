package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class BytesCodecSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  test("known byte layouts (HBase Bytes parity)") {
    assert(BytesCodec.encodeLong(1L).toSeq == Seq[Byte](0, 0, 0, 0, 0, 0, 0, 1))
    assert(BytesCodec.encodeLong(-1L).toSeq == Seq.fill(8)((-1).toByte))
    assert(BytesCodec.encodeInt(0xDEADBEEF).toSeq ==
      Seq(0xDE.toByte, 0xAD.toByte, 0xBE.toByte, 0xEF.toByte))
    assert(BytesCodec.encodeShort(258.toShort).toSeq == Seq[Byte](1, 2))
    // HBase Bytes.toBytes(boolean): -1 for true
    assert(BytesCodec.encodeBoolean(true).toSeq == Seq[Byte](-1))
    assert(BytesCodec.encodeBoolean(false).toSeq == Seq[Byte](0))
    // IEEE bits big-endian
    assert(BytesCodec.encodeDouble(1.0).toSeq ==
      Seq[Byte](0x3F, 0xF0.toByte, 0, 0, 0, 0, 0, 0))
  }

  test("java Arrays.hashCode parity") {
    val cases = Seq(
      Array[Byte](), Array[Byte](0), Array[Byte](1, 2, 3),
      Array[Byte](-128, 127, 0, 55), BytesCodec.encodeLong(123456789L)) ++
      (1 to 50).map(n => Array.fill(n)(rnd.nextInt().toByte))
    cases.foreach { a =>
      assert(BytesCodec.javaArraysHashCode(a) == java.util.Arrays.hashCode(a))
    }
  }

  test("round-trips") {
    (1 to 200).foreach { _ =>
      val l = rnd.nextLong()
      assert(BytesCodec.decodeLong(BytesCodec.encodeLong(l)) == l)
      val i = rnd.nextInt()
      assert(BytesCodec.decodeInt(BytesCodec.encodeInt(i)) == i)
      val s = rnd.nextInt().toShort
      assert(BytesCodec.decodeShort(BytesCodec.encodeShort(s)) == s)
      val d = java.lang.Double.longBitsToDouble(rnd.nextLong())
      assert(java.lang.Double.compare(
        BytesCodec.decodeDouble(BytesCodec.encodeDouble(d)), d) == 0 || d.isNaN)
      val f = java.lang.Float.intBitsToFloat(rnd.nextInt())
      assert(java.lang.Float.compare(
        BytesCodec.decodeFloat(BytesCodec.encodeFloat(f)), f) == 0 || f.isNaN)
      val bd = java.math.BigDecimal.valueOf(
        rnd.nextLong() % 1000000L, rnd.nextInt(10))
      assert(BytesCodec.decodeDecimal(BytesCodec.encodeDecimal(bd)) == bd)
    }
  }

  test("big-endian encoding preserves unsigned byte order for non-negative longs") {
    (1 to 500).foreach { _ =>
      val a = rnd.nextLong() & Long.MaxValue
      val b = rnd.nextLong() & Long.MaxValue
      val cmp = java.util.Arrays.compareUnsigned(
        BytesCodec.encodeLong(a), BytesCodec.encodeLong(b))
      assert(Integer.signum(cmp) == java.lang.Long.compare(a, b).sign)
    }
  }

  test("prefixSuccessor: carry through trailing 0xFF, None on all-0xFF, " +
      "and tight bound semantics") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // simple: increment last byte
    assert(BytesCodec.prefixSuccessor(b(0x00, 0x07)).get.sameElements(b(0x00, 0x08)))
    // trailing 0xFF: carry drops it and increments the previous byte —
    // the case a naive bump gets wrong (wraps to 0x00, empty range)
    assert(BytesCodec.prefixSuccessor(b(0x00, 0xFF)).get.sameElements(b(0x01)))
    assert(BytesCodec.prefixSuccessor(b(0x3A, 0xFF, 0xFF)).get.sameElements(b(0x3B)))
    // all 0xFF: no finite exclusive bound exists
    assert(BytesCodec.prefixSuccessor(b(0xFF, 0xFF)).isEmpty)
    assert(BytesCodec.prefixSuccessor(Array.emptyByteArray).isEmpty)
    // property: for random prefixes, successor > any key extending the
    // prefix, and successor is <= any key that sorts after all of them
    (1 to 300).foreach { _ =>
      val p = Array.fill(1 + rnd.nextInt(6))(rnd.nextInt(256).toByte)
      BytesCodec.prefixSuccessor(p).foreach { next =>
        assert(java.util.Arrays.compareUnsigned(p, next) < 0)
        val extended = p ++ Array.fill(rnd.nextInt(4))(0xFF.toByte)
        assert(java.util.Arrays.compareUnsigned(extended, next) < 0)
        // next itself does not start with p (the bound is tight)
        assert(!(next.length >= p.length &&
          java.util.Arrays.equals(next.take(p.length), p)))
      }
    }
  }
}
