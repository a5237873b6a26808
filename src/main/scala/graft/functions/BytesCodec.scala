package graft.functions

/** Byte-level codec with HBase `Bytes` semantics (big-endian, bit-compatible
  * with the reference's serde — HBaseSerde.java:280-463, HBaseTypeUtils.java):
  * long/int/short big-endian; double/float via IEEE bits; boolean as a
  * single 0xFF/0x00 byte; decimal as 4-byte scale + unscaled big-int bytes;
  * string as UTF-8.
  *
  * All methods are static so Catalyst codegen can call them directly from
  * generated Java (see the expressions in [[HbExpressions]]).
  */
object BytesCodec {

  // ---- encoders ---------------------------------------------------------
  def encodeLong(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 7; var x = v
    while (i >= 0) { b(i) = (x & 0xff).toByte; x >>>= 8; i -= 1 }
    b
  }

  def encodeInt(v: Int): Array[Byte] = {
    val b = new Array[Byte](4)
    var i = 3; var x = v
    while (i >= 0) { b(i) = (x & 0xff).toByte; x >>>= 8; i -= 1 }
    b
  }

  def encodeShort(v: Short): Array[Byte] =
    Array(((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  def encodeByte(v: Byte): Array[Byte] = Array(v)

  def encodeDouble(v: Double): Array[Byte] =
    encodeLong(java.lang.Double.doubleToLongBits(v))

  def encodeFloat(v: Float): Array[Byte] =
    encodeInt(java.lang.Float.floatToIntBits(v))

  /** HBase Bytes.toBytes(boolean): {-1} for true, {0} for false. */
  def encodeBoolean(v: Boolean): Array[Byte] =
    Array(if (v) (-1).toByte else 0.toByte)

  /** HBase Bytes.toBytes(BigDecimal): 4-byte scale + unscaled bytes. */
  def encodeDecimal(v: java.math.BigDecimal): Array[Byte] = {
    val unscaled = v.unscaledValue.toByteArray
    encodeInt(v.scale) ++ unscaled
  }

  // ---- decoders ---------------------------------------------------------
  def decodeLong(b: Array[Byte]): Long = {
    require(b.length == 8, s"expected 8 bytes, got ${b.length}")
    var x = 0L; var i = 0
    while (i < 8) { x = (x << 8) | (b(i) & 0xffL); i += 1 }
    x
  }

  def decodeInt(b: Array[Byte]): Int = {
    require(b.length == 4, s"expected 4 bytes, got ${b.length}")
    var x = 0; var i = 0
    while (i < 4) { x = (x << 8) | (b(i) & 0xff); i += 1 }
    x
  }

  def decodeShort(b: Array[Byte]): Short = {
    require(b.length == 2, s"expected 2 bytes, got ${b.length}")
    (((b(0) & 0xff) << 8) | (b(1) & 0xff)).toShort
  }

  def decodeByte(b: Array[Byte]): Byte = b(0)

  def decodeDouble(b: Array[Byte]): Double =
    java.lang.Double.longBitsToDouble(decodeLong(b))

  def decodeFloat(b: Array[Byte]): Float =
    java.lang.Float.intBitsToFloat(decodeInt(b))

  def decodeBoolean(b: Array[Byte]): Boolean = b(0) != 0

  def decodeDecimal(b: Array[Byte]): java.math.BigDecimal = {
    val scale = decodeInt(java.util.Arrays.copyOfRange(b, 0, 4))
    val unscaled = new java.math.BigInteger(
      java.util.Arrays.copyOfRange(b, 4, b.length))
    new java.math.BigDecimal(unscaled, scale)
  }

  /** Exclusive upper bound of the set of byte keys that start with
    * `prefix` (HBase's ClientUtil.calculateTheClosestNextRowKeyForPrefix
    * semantics): drop trailing 0xFF bytes, then increment the last
    * remaining byte — a proper carry, unlike a naive last-byte bump that
    * wraps 0xFF to 0x00 and empties the range. None when the prefix is
    * all 0xFF (every longer key still matches; the range is unbounded
    * above — scan to end-of-table).
    */
  def prefixSuccessor(prefix: Array[Byte]): Option[Array[Byte]] = {
    var i = prefix.length - 1
    while (i >= 0 && prefix(i) == 0xff.toByte) i -= 1
    if (i < 0) None
    else {
      val next = java.util.Arrays.copyOf(prefix, i + 1)
      next(i) = (next(i) + 1).toByte
      Some(next)
    }
  }

  /** java.util.Arrays.hashCode(byte[]) — exact parity with the reference's
    * salt computation (TsdbBulkload.java:94).
    */
  def javaArraysHashCode(b: Array[Byte]): Int = {
    var h = 1; var i = 0
    while (i < b.length) { h = 31 * h + b(i); i += 1 }
    h
  }

  /** HBase cell-tag wire format: repeated `[2-byte length][1-byte type]
    * [payload]` where `length` covers the type byte plus the payload.
    * Returns the payload of the FIRST tag of type `TtlTagType` (8)
    * decoded as a big-endian long of milliseconds — the per-cell TTL
    * HBase's `PrivateCellUtil.getTTL` resolves — or -1 when the buffer
    * carries no TTL tag. A structurally truncated buffer or a TTL tag
    * whose payload is not 8 bytes is rejected loudly: silently treating
    * a corrupt tag block as "no TTL" would immortalize cells a cluster
    * wrote with an expiry.
    */
  val TtlTagType: Byte = 8
  def ttlTagMs(tags: Array[Byte]): Long = {
    var i = 0
    while (i < tags.length) {
      require(i + 3 <= tags.length, s"truncated tag header at offset $i")
      val len = ((tags(i) & 0xff) << 8) | (tags(i + 1) & 0xff)
      require(len >= 1 && i + 2 + len <= tags.length,
        s"truncated tag (len=$len) at offset $i")
      if (tags(i + 2) == TtlTagType) {
        require(len == 9, s"TTL tag payload must be 8 bytes, got ${len - 1}")
        var v = 0L; var j = i + 3
        while (j < i + 11) { v = (v << 8) | (tags(j) & 0xff); j += 1 }
        return v
      }
      i += 2 + len
    }
    -1L
  }

  /** HBase FuzzyRowFilter predicate (the filter TsdbScanner.java:16-53
    * builds): a row matches if ANY (pattern, mask) pair matches, where a
    * mask byte of 0 means "row byte must equal the pattern byte" and any
    * nonzero mask byte is a wildcard. Rows shorter than the pattern
    * never match. Static so Catalyst codegen calls it directly.
    */
  def fuzzyMatch(row: Array[Byte], patterns: Array[Array[Byte]],
                 masks: Array[Array[Byte]]): Boolean = {
    var p = 0
    while (p < patterns.length) {
      val pat = patterns(p); val mask = masks(p)
      if (row.length >= pat.length) {
        var i = 0; var ok = true
        while (ok && i < pat.length) {
          if (mask(i) == 0 && row(i) != pat(i)) ok = false
          i += 1
        }
        if (ok) return true
      }
      p += 1
    }
    false
  }
}
