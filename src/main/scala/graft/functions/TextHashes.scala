package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels for the dedup/fingerprint expressions. Kept as
  * plain static methods so [[TextExpressions]] can call them from
  * generated code (one virtual-call-free invocation per row inside
  * whole-stage codegen).
  *
  * All constants are public-domain mixers (SplitMix64 / MurmurHash3
  * finalizer); nothing here derives from the reference implementation.
  */
object TextHashes {

  /** Upper bound on MinHash permutations (seed table size). */
  val MaxPerms = 512

  /** SplitMix64 step — used to derive one independent seed per MinHash
    * permutation from the permutation index.
    */
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private val seeds: Array[Long] = Array.tabulate(MaxPerms)(j => splitmix64(j.toLong))

  /** Permutation seed `j` — exposed so the DuckDB oracle SQL can inline
    * the exact seed table instead of replicating splitmix64.
    */
  private[graft] def permSeed(j: Int): Long = seeds(j)

  /** MurmurHash3 64-bit finalizer: full-avalanche bijective mixer. */
  private def fmix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33
    h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33
    h *= 0xC4CEB9FE1A85EC53L
    h ^= h >>> 33
    h
  }

  /** MinHash signature over a set of element hashes: one pass over the
    * array, `perms` simulated permutations (hash XOR per-perm seed put
    * through an avalanche mixer — a standard permutation family).
    * Empty input yields Long.MaxValue per slot (the identity of min).
    */
  def minhashSig(hashes: ArrayData, perms: Int): ArrayData = {
    require(perms > 0 && perms <= MaxPerms, s"perms must be in [1,$MaxPerms]")
    val out = new Array[Long](perms)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < perms) {
        val v = fmix64(h ^ seeds(j))
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** 64-bit SimHash over a set of feature hashes: per-bit majority vote
    * (bit set iff strictly more features have it set than clear).
    */
  def simhash64(hashes: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'

  /** One-pass distinct `k`-word-shingle hash set over raw UTF-8 bytes:
    * FNV-1a per word, order-sensitive 31-combine over a k-ring, fmix64
    * avalanche, then sort+unique. Replaces the compositional
    * split→slice→concat_ws→xxhash pipeline (which allocates one string
    * per shingle) with zero per-shingle allocation — ~10× on long docs.
    */
  def wordShingleHashes(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var out = new Array[Long](32)
    var m = 0
    val ring = new Array[Long](k)
    var words = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        var h = 0xCBF29CE484222325L // FNV-1a offset basis
        while (i < n && !isWs(bytes(i))) {
          h = (h ^ (bytes(i) & 0xFF)) * 0x100000001B3L
          i += 1
        }
        ring(words % k) = h
        words += 1
        if (words >= k) {
          var c = 1L
          var j = words - k
          while (j < words) { c = c * 31 + ring(j % k); j += 1 }
          if (m == out.length) out = java.util.Arrays.copyOf(out, m * 2)
          out(m) = fmix64(c)
          m += 1
        }
      }
    }
    val arr = java.util.Arrays.copyOf(out, m)
    java.util.Arrays.sort(arr)
    // unique in place
    var u = 0
    var r = 0
    while (r < arr.length) {
      if (u == 0 || arr(r) != arr(u - 1)) { arr(u) = arr(r); u += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(arr, u))
  }

  /** POSITIONAL variant of [[wordShingleHashes]]: one entry per shingle
    * position in document order, duplicates retained — the multiset a
    * language-model score needs (an LM weighs every occurrence; the
    * distinct-set form would collapse repeated n-grams). Byte-identical
    * per-position values to the set form (same FNV-1a → 31-combine →
    * fmix64 chain), so the two kernels share one oracle replay.
    */
  def wordShingleSeq(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var out = new Array[Long](32)
    var m = 0
    val ring = new Array[Long](k)
    var words = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        var h = 0xCBF29CE484222325L // FNV-1a offset basis
        while (i < n && !isWs(bytes(i))) {
          h = (h ^ (bytes(i) & 0xFF)) * 0x100000001B3L
          i += 1
        }
        ring(words % k) = h
        words += 1
        if (words >= k) {
          var c = 1L
          var j = words - k
          while (j < words) { c = c * 31 + ring(j % k); j += 1 }
          if (m == out.length) out = java.util.Arrays.copyOf(out, m * 2)
          out(m) = fmix64(c)
          m += 1
        }
      }
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, m))
  }

  /** Count of codepoints matching `[^a-zA-Z0-9\s]` — the punctuation
    * count the quality score's compositional form computed with
    * `size(regexp_extract_all(...))`, which allocated one string per
    * match (17 of corpus_curate's 19 s at bench 100×). One pass over
    * UTF-8 bytes, zero allocation: ASCII bytes test the class directly;
    * any multibyte codepoint is outside `[a-zA-Z0-9\s]` by definition
    * and counts once (continuation bytes skipped), matching Java
    * regex's codepoint-unit class semantics. `\s` here is Java's
    * `[ \t\n\x0B\f\r]`, which RE2 (the DuckDB oracle) agrees with.
    */
  /** Quantized-entropy lookup table shared by [[charEntropyStats]],
    * `TextOps.entropy` and the DuckDB oracle: `EntropyLut(q-1)` =
    * round(−log2(q/1024) · 2²⁰) for q in 1..1024 — the information
    * content (in 2⁻²⁰-bit units) of a probability quantized to the
    * q/1024 grid. Computed ONCE here and inlined as the SAME integer
    * literal into the oracle SQL, so no engine evaluates a
    * transcendental.
    */
  val EntropyLut: Array[Long] = Array.tabulate(1024) { i =>
    val q = i + 1
    math.round(-(math.log(q / 1024.0) / math.log(2.0)) * 1048576.0)
  }

  /** Fused per-doc char-entropy statistics:
    * `[n_alnum, n_distinct, ent_scaled]` over the ASCII-alphanumeric
    * alphabet, case-folded byte-wise (`'A'..'Z' | 0x20`) — one O(bytes)
    * pass with a 36-slot count table, zero allocation beyond the
    * 3-element result. `ent_scaled = (Σ c·L(max(1, c·1024 DIV n)))
    * DIV n` with L = [[EntropyLut]]. Non-ASCII codepoints are never
    * counted (continuation bytes can't collide with ASCII: every
    * non-ASCII UTF-8 byte has the high bit set). Replaces the
    * higher-order-function composition (`array_distinct` +
    * per-distinct `filter` = O(n·36) with two array allocations per
    * row) that made text_entropy the bench's slowest corpus-bytes
    * scan.
    */
  def charEntropyStats(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val counts = new Array[Long](36)
    var n = 0L
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xFF
      if (c >= '0' && c <= '9') { counts(26 + (c - '0')) += 1; n += 1 }
      else {
        val lc = c | 0x20
        if (lc >= 'a' && lc <= 'z') { counts(lc - 'a') += 1; n += 1 }
      }
      i += 1
    }
    var distinct = 0L
    var ent = 0L
    var j = 0
    while (j < 36) {
      val c = counts(j)
      if (c > 0) {
        distinct += 1
        var q = c * 1024L / n
        if (q < 1) q = 1
        ent += c * EntropyLut((q - 1).toInt)
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      Array(n, distinct, if (n > 0) ent / n else 0L))
  }

  def punctCount(s: UTF8String): Long = {
    val b = s.getBytes
    var i = 0
    var n = 0L
    while (i < b.length) {
      val c = b(i) & 0xFF
      if (c < 0x80) {
        val alnum = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9')
        val ws = c == ' ' || c == '\t' || c == '\n' || c == 0x0B ||
          c == '\f' || c == '\r'
        if (!alnum && !ws) n += 1
        i += 1
      } else {
        n += 1
        i += 1
        while (i < b.length && (b(i) & 0xC0) == 0x80) i += 1
      }
    }
    n
  }

  /** Fused E1 kernel: ONE zero-allocation pass over the UTF-8 bytes
    * computing [n_tokens, n_bpe_tokens, n_punct, n_digits, n_spaces]
    * with EXACTLY the semantics of the split/regexp_extract_all
    * expression chain it replaced (n_tokens counts
    * `split(trim(t), "\s+")` elements — Spark's split keeps leading
    * AND trailing empties, so the count is whitespace-runs + 1 inside
    * the space-only-trimmed view, and 1 for empty; the BPE-ish token
    * count is letter runs + digit
    * runs + one per other non-whitespace codepoint; whitespace is
    * Java's `\s` ASCII set; a non-ASCII codepoint is a single "other"
    * char, as in the regex classes). The regex chain allocated a
    * string per match across three `regexp_extract_all` arrays —
    * allocation/GC-bound at scale (text_stats t100 44.7 s, ratio100
    * 55); this kernel is pure byte arithmetic.
    */
  def charClassStats(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val len = b.length
    // Spark's trim strips 0x20 ONLY — the token count sees this view
    var st = 0
    var en = len
    while (st < en && b(st) == ' ') st += 1
    while (en > st && b(en - 1) == ' ') en -= 1
    // Spark's split keeps leading AND trailing empty elements (limit
    // -1), so element count = (maximal \s+ runs in the trimmed view)
    // + 1, and exactly 1 for the empty string
    var wsRuns = 0L
    var inWs = false
    var nBpe = 0L
    var nPunct = 0L
    var nDigits = 0L
    var nSpaces = 0L
    var run = 0 // BPE run state: 0 none/other, 1 letter run, 2 digit run
    var i = 0
    while (i < len) {
      val c = b(i) & 0xFF
      var step = 1
      var isWs = false
      if (c < 0x80) {
        isWs = c == ' ' || c == '\t' || c == '\n' || c == 0x0B ||
          c == '\f' || c == '\r'
        val isLetter = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
        val isDigit = c >= '0' && c <= '9'
        if (c == ' ') nSpaces += 1
        if (isDigit) nDigits += 1
        if (!isLetter && !isDigit && !isWs) nPunct += 1
        if (isLetter) { if (run != 1) { nBpe += 1; run = 1 } }
        else if (isDigit) { if (run != 2) { nBpe += 1; run = 2 } }
        else if (!isWs) { nBpe += 1; run = 0 }
        else run = 0
      } else {
        // one non-ASCII codepoint: non-alnum, non-ws "other"
        nPunct += 1
        nBpe += 1
        run = 0
        while (i + step < len && (b(i + step) & 0xC0) == 0x80) step += 1
      }
      if (i >= st && i < en) {
        if (isWs) { if (!inWs) { wsRuns += 1 }; inWs = true }
        else inWs = false
      }
      i += step
    }
    UnsafeArrayData.fromPrimitiveArray(
      Array(wsRuns + 1, nBpe, nPunct, nDigits, nSpaces))
  }

  private val PolyBase = 1000003L // polynomial base (prime, fits a mult)

  /** Whole-content 64-bit polynomial fingerprint over UTF-8 bytes:
    * h = Σ b_i · B^(n-1-i) mod 2^64 (Rabin–Karp style).
    */
  def rollingFp(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * PolyBase + (bytes(i) & 0xFF)
      i += 1
    }
    h
  }

  /** Winnowing-style selection: minimum fmix64-mixed hash over all
    * `w`-byte rolling windows (true O(n) roll: enter/exit via the
    * precomputed B^(w-1) factor). Documents shorter than `w` fall back
    * to the whole-content fingerprint. The mixer decorrelates the raw
    * polynomial value so "min" is uniform over windows.
    */
  def rollingWindowMin(s: UTF8String, w: Int): Long = {
    val bytes = s.getBytes
    if (bytes.length < w) return fmix64(rollingFp(s))
    var pw = 1L // B^(w-1)
    var i = 0
    while (i < w - 1) { pw *= PolyBase; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * PolyBase + (bytes(i) & 0xFF); i += 1 }
    var best = fmix64(h)
    while (i < bytes.length) {
      h = (h - (bytes(i - w) & 0xFF) * pw) * PolyBase + (bytes(i) & 0xFF)
      val m = fmix64(h)
      if (m < best) best = m
      i += 1
    }
    best
  }

  /** All fmix64-mixed hashes of the `w`-byte rolling windows, in
    * position order (same roll and mixer as [[rollingWindowMin]] —
    * that value is exactly the min of this array). Documents shorter
    * than `w` yield the single mixed whole-content fingerprint, so
    * every doc has ≥1 window and short docs compare whole-for-whole.
    */
  def rollingWindows(s: UTF8String, w: Int): ArrayData = {
    val bytes = s.getBytes
    if (bytes.length < w)
      return UnsafeArrayData.fromPrimitiveArray(
        Array(fmix64(rollingFp(s))))
    val out = new Array[Long](bytes.length - w + 1)
    var pw = 1L // B^(w-1)
    var i = 0
    while (i < w - 1) { pw *= PolyBase; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * PolyBase + (bytes(i) & 0xFF); i += 1 }
    out(0) = fmix64(h)
    while (i < bytes.length) {
      h = (h - (bytes(i - w) & 0xFF) * pw) * PolyBase + (bytes(i) & 0xFF)
      out(i - w + 1) = fmix64(h)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Neutral weight of [[hashedLinearScore]]'s integer grid: the value
    * an untrained bucket gets (pos = neg = 0 in the weight formula),
    * subtracted per feature so untrained buckets contribute zero.
    */
  val LinearScoreCenter: Long = 1L << 19

  /** Hashed-vocabulary linear score: Σ over the doc's distinct token
    * hashes of (weights[h & (weights.length-1)] − 2¹⁹). All-long
    * arithmetic — order-independent and bit-exact under any
    * partitioning. `weights.length` must be a power of two.
    */
  def hashedLinearScore(hashes: ArrayData, wq: Array[Long]): Long = {
    val mask = wq.length - 1
    var s = 0L
    var i = 0
    val n = hashes.numElements()
    while (i < n) {
      s += wq((hashes.getLong(i) & mask).toInt) - LinearScoreCenter
      i += 1
    }
    s
  }

  /** Remove the `w`-byte windows starting at the ascending byte
    * positions in `dupPos` from `s`, merging overlapping windows into
    * maximal spans — the span-removal step of exact-substring dedup.
    * A doc shorter than `w` has one pseudo-window covering its whole
    * content ([[rollingWindows]]), so a duplicated short doc trims to
    * empty. Spans are BYTE ranges on the UTF-8 stream (like the
    * reference algorithm, which cuts token/byte ranges); the test
    * corpus is ASCII, where byte == char positions.
    */
  def cutWindows(s: UTF8String, dupPos: ArrayData, w: Int): UTF8String = {
    val n = dupPos.numElements()
    if (n == 0) return s
    val bytes = s.getBytes
    if (bytes.length < w) return UTF8String.EMPTY_UTF8
    val out = new Array[Byte](bytes.length)
    var o = 0
    var cur = 0 // first byte not yet emitted or skipped
    var k = 0
    while (k < n) {
      val p = dupPos.getInt(k)
      if (p > cur) {
        System.arraycopy(bytes, cur, out, o, p - cur)
        o += p - cur
        cur = p
      }
      if (p + w > cur) cur = p + w
      k += 1
    }
    if (bytes.length > cur) {
      System.arraycopy(bytes, cur, out, o, bytes.length - cur)
      o += bytes.length - cur
    }
    UTF8String.fromBytes(out, 0, o)
  }
}
