package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRight}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Fixed-size Bloom filter over 64-bit hash columns, built and probed
  * entirely with codegen'd column expressions — no UDF, no sketch
  * library object crossing the serialization boundary.
  *
  * Why this exists (100 TB posture): several operators probe a
  * driver-collected set from the map side (decontamination's eval gram
  * set, multi-get key sets). An exact broadcast set is fine while it is
  * MBs, but its size grows with the reference collection; a Bloom
  * filter pins the broadcast cost at exactly `2^logBits / 8` bytes
  * (128 KiB at the default 2^20) regardless of how many values went
  * in, at the price of a tunable false-positive rate. Callers that
  * need exactness keep a verification join AFTER the probe — the probe
  * then only bounds how much data reaches that join, never the answer
  * (no false negatives: every inserted value probes true).
  *
  * Layout: a dense `Array[Long]` of `2^logBits / 64` words. k = 2
  * probes per value: `pmod(g, bits)` and `pmod(xxhash64(g), bits)` —
  * `g` is already a 64-bit hash wherever this is used, so two
  * independent positions suffice (fp rate ≈ (2n/m)² at n values into
  * m bits ≈ 0.04% for 100k values into 2^20 bits).
  *
  * Build is ONE distributed partial-agg pass: explode each value into
  * its two (word, bit-mask) pairs, `bit_or` them per word (map-side
  * combined — the shuffle carries ≤ words-per-partition rows), collect
  * the ≤ 2^(logBits-6) non-zero words. Probe compiles to two
  * `element_at` + shift + AND over ONE array literal held by reference
  * in the generated code (never inlined element-by-element), so it
  * rides whole-stage codegen.
  */
object Bloom {

  private def shl(v: Column, n: Column): Column =
    ColumnBridge.column(ShiftLeft(ColumnBridge.expression(v),
      ColumnBridge.expression(n)))

  /** The two probe positions of hash column `g` in a `2^logBits`-bit
    * space (both in [0, bits) — `pmod` handles negative hashes).
    */
  private def positions(g: Column, logBits: Int): Seq[Column] = {
    val bits = 1L << logBits
    Seq(pmod(g, lit(bits)), pmod(xxhash64(g), lit(bits)))
  }

  /** Builds the bitset over every value of hash column `g` in `df`.
    * One partial-agg shuffle of ≤ 2^(logBits-6) word rows; the result
    * is `2^logBits / 8` bytes dense.
    */
  def build(df: DataFrame, g: Column, logBits: Int = 20): Array[Long] = {
    require(logBits >= 6 && logBits <= 30,
      s"logBits $logBits out of [6, 30] (64 bits .. 128 MiB)")
    val rows = df
      .select(explode(array(positions(g, logBits): _*)).as("p"))
      .select((col("p") / 64).cast("long").as("w"),
        shl(lit(1L), (col("p") % 64).cast("int")).as("m"))
      .groupBy("w").agg(expr("bit_or(m)").as("b"))
      .collect()
    val words = new Array[Long](1 << (logBits - 6))
    rows.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    words
  }

  /** [[build]] with the bitset SIZED FROM THE DATA: one count pass,
    * then the smallest `logBits` giving at least `bitsPerValue` bits
    * per distinct value (clamped to [14, 30] — 2 KiB to 128 MiB).
    * A fixed-size bloom silently saturates when the inserted set
    * outgrows it (at 2n ≥ m every probe answers true and a downstream
    * verify join degenerates to the unfiltered stream — measured as a
    * 6× regression on the 100× decontamination corpus before this
    * existed); sizing from the count keeps the fp rate at the design
    * point (≈ (2/bitsPerValue)² = 0.4% at the default 32) at any eval
    * size, while the bitset still scales with the REFERENCE set, never
    * the corpus. Returns the words and the chosen `logBits` (the probe
    * needs it).
    */
  def buildSized(df: DataFrame, g: Column,
                 bitsPerValue: Int = 32): (Array[Long], Int) = {
    require(bitsPerValue >= 4, s"bitsPerValue $bitsPerValue < 4")
    val n = math.max(1L, df.count())
    var lb = 14
    while (lb < 30 && (1L << lb) < n * bitsPerValue) lb += 1
    (build(df, g, lb), lb)
  }

  /** Membership probe: true iff both positions of `g` are set. False
    * positives at the configured rate; false negatives never.
    *
    * The bitset rides the expression as a PLAIN `Array[Long]` reference
    * ([[BloomProbe]], `ctx.addReferenceObj` in codegen), NOT a
    * `typedLit` array literal. The literal form was measured as a
    * driver-side tax the whole query paid: a 2^lb-bit filter is a
    * 2^(lb-6)-element literal (65k longs at the sf0.1 eval set, up to
    * 2^24 at the cap) that CatalystTypeConverters boxes element by
    * element, every optimizer pass re-canonicalizes, constraint
    * propagation COPIES onto the other join side, and the explain
    * string renders in full. Probe semantics are bit-identical:
    * [[probeWords]] replays pmod(g, bits) / pmod(xxhash64(g), bits)
    * (same XXH64 seed 42 as the SQL function) and the same
    * shift-and-mask word test.
    */
  def probe(words: Array[Long], g: Column, logBits: Int = 20): Column = {
    require(words.length == 1 << (logBits - 6),
      s"bitset has ${words.length} words, logBits $logBits needs " +
        s"${1 << (logBits - 6)}")
    ColumnBridge.column(BloomProbe(ColumnBridge.expression(g), words, logBits))
  }

  /** The probe kernel behind [[BloomProbe]]: both positions of `g`
    * (pmod into the bit space; second position from XXH64 at the SQL
    * `xxhash64` seed) tested with the same word/shift arithmetic the
    * old expression tree compiled to.
    */
  def probeWords(words: Array[Long], logBits: Int, g: Long): Boolean = {
    val bits = 1L << logBits
    var p = g % bits; if (p < 0) p += bits
    if (((words((p >>> 6).toInt) >> (p & 63L).toInt) & 1L) != 1L)
      return false
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(g, 42L)
    p = h % bits; if (p < 0) p += bits
    ((words((p >>> 6).toInt) >> (p & 63L).toInt) & 1L) == 1L
  }
}

/** BOOLEAN membership probe of a 64-bit hash column against a
  * driver-held Bloom bitset — the words array is attached by reference
  * (a codegen reference object / a closure field in interpreted eval),
  * so megabyte bitsets never enter the Catalyst expression tree as
  * literals. Equality is reference equality on `words` (case-class
  * array semantics): probes built from the same `build` call compare
  * equal, which is the only dedup the optimizer needs here.
  */
case class BloomProbe(child: org.apache.spark.sql.catalyst.expressions.Expression,
                      words: Array[Long], logBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

  override def prettyName: String = "bloom_probe"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BIGINT, got $other")
  }
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(input: Any): Any =
    Bloom.probeWords(words, logBits, input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Bloom.probeWords($ref, $logBits, $c)")
  }
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): BloomProbe =
    copy(child = newChild)
}
