package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted hash probes true") {
    val vals = spark.range(0, 5000).select(xxhash64(col("id")).as("g"))
    val words = Bloom.build(vals, col("g"), logBits = 16)
    val missed = vals.filter(!Bloom.probe(words, col("g"), 16)).count()
    assert(missed == 0)
  }

  test("false-positive rate stays near the (2n/m)^2 design point") {
    val ins = spark.range(0, 2000).select(xxhash64(col("id")).as("g"))
    val words = Bloom.build(ins, col("g"), logBits = 16) // m = 65536
    // disjoint probe set (different hash seed via offset domain)
    val probes = spark.range(1000000, 1100000)
      .select(xxhash64(col("id")).as("g"))
    val fp = probes.filter(Bloom.probe(words, col("g"), 16)).count()
    // design fp ~ (2*2000/65536)^2 = 0.37%; allow generous 4x headroom
    assert(fp < 100000 * 0.015, s"fp rate ${fp / 100000.0} too high")
  }

  test("probe agrees with a driver-side bitset recompute") {
    val vals = spark.range(0, 500).select(xxhash64(col("id")).as("g"))
    val logBits = 12
    val words = Bloom.build(vals, col("g"), logBits)
    // recompute the bitset on the driver with plain Scala and compare
    val bits = 1L << logBits
    // both probe hashes per value, computed once by the engine — the
    // assertion targets the BITSET layout math (word/bit positions)
    val hashes = vals.select(col("g"), xxhash64(col("g")).as("g2"))
      .as[(Long, Long)].collect()
    val expect = new Array[Long](1 << (logBits - 6))
    def set(p: Long): Unit = {
      val pos = ((p % bits) + bits) % bits
      expect((pos / 64).toInt) |= (1L << (pos % 64).toInt)
    }
    hashes.foreach { case (h, h2) => set(h); set(h2) }
    assert(words.toSeq == expect.toSeq)
  }

  test("buildSized picks ~bitsPerValue bits per value and never saturates") {
    for (n <- Seq(100L, 5000L, 200000L)) {
      val vals = spark.range(0, n).select(xxhash64(col("id")).as("g"))
      val (words, lb) = Bloom.buildSized(vals, col("g"))
      assert((1L << lb) >= math.min(n * 32, 1L << 30), s"n=$n lb=$lb")
      assert(lb >= 14 && lb <= 30)
      // saturation check: well under half the bits set
      val setBits = words.map(java.lang.Long.bitCount).sum.toLong
      assert(setBits * 4 < (1L << lb), s"n=$n: $setBits of ${1L << lb} set")
      // and still no false negatives
      assert(vals.filter(!Bloom.probe(words, col("g"), lb)).count() == 0)
    }
  }

  test("probeWords matches both eval paths, incl. negative hashes and word edges") {
    // ADVICE r18: unit-pin the BloomProbe expression's codegen AND
    // interpreted eval against the probeWords kernel, beyond the
    // end-to-end oracle pinning. Negative hashes exercise the pmod
    // branch; inserted values near word boundaries (multiples of 64±1
    // land across word edges after hashing) exercise the shift-mask.
    val raw = Seq(-1L, Long.MinValue, Long.MinValue + 63, -64L, -63L,
      0L, 1L, 63L, 64L, 65L, 127L, 128L, Long.MaxValue,
      -987654321987L, 123456789123L)
    val ins = raw.toDF("g")
    val logBits = 12
    val words = Bloom.build(ins, col("g"), logBits)
    // absent candidates: a disjoint value set
    val absent = (1000L to 1200L).map(_ * 7919L + 3L).filterNot(raw.contains)
    val all = (raw ++ absent).toDF("g")
    // interpreted path: filter with codegen disabled vs enabled
    def probed(codegen: String): Set[Long] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try all.filter(Bloom.probe(words, col("g"), logBits))
        .as[Long].collect().toSet
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val viaCodegen = probed("CODEGEN_ONLY")
    val viaEval = probed("NO_CODEGEN")
    val viaKernel = (raw ++ absent)
      .filter(g => Bloom.probeWords(words, logBits, g)).toSet
    assert(viaCodegen == viaKernel && viaEval == viaKernel)
    // no false negatives on the inserted set, under every path
    assert(raw.toSet.subsetOf(viaKernel))
  }

  test("bitset size is fixed by logBits, independent of input size") {
    val small = Bloom.build(
      spark.range(0, 10).select(xxhash64(col("id")).as("g")), col("g"), 16)
    val large = Bloom.build(
      spark.range(0, 20000).select(xxhash64(col("id")).as("g")), col("g"), 16)
    assert(small.length == 1024 && large.length == 1024) // 8 KiB each
  }
}
