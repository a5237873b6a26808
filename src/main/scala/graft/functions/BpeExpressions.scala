package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding kernels (SURVEY E12). Merges are carried as two
  * parallel String arrays (left/right symbol of each ordered merge) —
  * plan constants via `addReferenceObj`, exactly like the hyperplane
  * tables.
  *
  * BYTE-LEVEL base alphabet (the GPT-2 / tiktoken convention): a
  * word's initial symbols are its UTF-8 BYTES, one symbol per byte,
  * each rendered as a fixed-width 2-char UPPERCASE-HEX string (the
  * same rendering DuckDB's `hex(encode(w))` produces, which is what
  * makes the oracle replay byte-exact). Every possible text is
  * representable in the 256-entry base vocab, so `<unk>` is
  * unreachable by construction — the whole point of byte-level BPE.
  * Uppercase hex is order-faithful: it is fixed-width and monotone
  * per byte ('0'-'9' < 'A'-'F' in ASCII), so unsigned-byte comparison
  * of hex-rendered symbol strings equals comparison of the underlying
  * byte sequences — tie-breaks, and therefore learned merge lists,
  * are a pure function of the corpus bytes.
  *
  * Pretokenization is WHITESPACE-FAITHFUL ([[BpeKernel
  * .foreachPretoken]], the GPT-2 space-prefix convention): separators
  * fold into the following word's byte stream, so whitespace bytes
  * carry ids, `" the"` and `"the"` are distinct tokens, and
  * `decode(encode(text)) == text` exactly — token counts match what a
  * deployed byte-level tokenizer produces.
  */
object BpeKernel {

  private val HexDigits = "0123456789ABCDEF".toCharArray

  /** 0 = whitespace (Java-regex `\s`, the one whitespace definition
    * every kernel, the trainer, and the oracle's pretokenizer share),
    * 1 = letter (`\p{L}`), 2 = digit (`\p{N}`),
    * 3 = everything else — BY CODE POINT, so an SMP letter (a
    * surrogate pair in UTF-16) classifies exactly as Java's and RE2's
    * `\p{L}` do, not as two "other" chars. `Character.isLetter(int)`
    * is precisely the Lu/Ll/Lt/Lm/Lo set `\p{L}` names, and
    * `Character.isDigit` misses Nl/No, so digits go through getType.
    */
  @inline private def catOf(cp: Int): Int =
    if (cp < 128) {
      if (cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r') 0
      else if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) 1
      else if (cp >= '0' && cp <= '9') 2
      else 3
    } else if (Character.isLetter(cp)) 1
    else {
      val t = Character.getType(cp)
      if (t == Character.DECIMAL_DIGIT_NUMBER ||
        t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER) 2
      else 3
    }

  /** WHITESPACE-FAITHFUL, CATEGORY-AWARE pretokenization — the hand
    * scanner for [[graft.operators.Bpe.PretokenRegex]] (the
    * tiktoken-style pattern under the space-prefix fold; spec-pinned
    * equal to the compiled regex on every edge shape): the GPT-2
    * contraction suffixes (`'s 't 're 've 'm 'll 'd`, lowercase) split
    * off first, then each whitespace run folds into the FOLLOWING
    * letter / digit / punctuation RUN (`" the"` ≠ `"the"`, and
    * `"end."` is now `end` + `.`), and a trailing run with no
    * following word stands alone. Pretokens CONCATENATE BACK TO THE
    * EXACT SOURCE, so whitespace carries token ids (0x20 is a base
    * byte symbol like any other) and `decode(encode(text)) == text`
    * byte-for-byte. Calls `f` once per pretoken; pretokens are never
    * empty.
    */
  def foreachPretoken(text: String)(f: String => Unit): Unit =
    foreachPretoken(text, gpt2Ws = false)(f)

  /** [[foreachPretoken]] with the whitespace mode explicit: `gpt2Ws =
    * true` is the hand scanner for [[graft.operators.Bpe
    * .Gpt2WsPretokenRegex]] — at most ONE literal space folds into the
    * following run, `\s+(?!\S)` claims a whitespace run minus its last
    * char before a word, and a last non-space whitespace char stands
    * alone (bare `\s+`) — deployed-tiktoken segmentation on
    * multi-space / indented text. Both modes partition the source
    * exactly.
    */
  def foreachPretoken(text: String, gpt2Ws: Boolean)
                     (f: String => Unit): Unit = {
    val len = text.length
    var i = 0
    while (i < len) {
      val start = i
      // contraction first (regex alternative order): apostrophe + one
      // of the lowercase GPT-2 suffixes, longest suffix wins within
      // the group's own order (re/ve/ll before their prefixes never
      // conflict: s,t,m,d are single chars, re/ve/ll distinct firsts)
      if (text.charAt(i) == '\'' && i + 1 < len) {
        val c1 = text.charAt(i + 1)
        val c2 = if (i + 2 < len) text.charAt(i + 2) else ' '
        val take =
          if (c1 == 's' || c1 == 't' || c1 == 'm' || c1 == 'd') 2
          else if ((c1 == 'r' && c2 == 'e') || (c1 == 'v' && c2 == 'e') ||
            (c1 == 'l' && c2 == 'l')) 3
          else 0
        if (take > 0) {
          i += take
          f(text.substring(start, i))
        }
      }
      if (i == start) {
        // j = end of the whitespace prefix (may be empty)
        var j = i
        while (j < len && catOf(text.codePointAt(j)) == 0) j += 1
        if (j == len) { f(text.substring(i, j)); i = j } // trailing `\s+`
        else if (!gpt2Ws || j == i) {
          // default fold (the whole run joins the following category
          // run), or no whitespace at all: scan the run and emit once
          i = j
          val cat = catOf(text.codePointAt(i))
          while (i < len && catOf(text.codePointAt(i)) == cat)
            i += Character.charCount(text.codePointAt(i))
          f(text.substring(start, i))
        } else {
          // gpt2Ws, ws prefix before a word: `\s+(?!\S)` stands the
          // run minus its last char alone...
          if (j - i >= 2) f(text.substring(i, j - 1))
          if (text.charAt(j - 1) == ' ') {
            // ...and ` ?<run>` folds the remaining literal space
            i = j
            val cat = catOf(text.codePointAt(i))
            while (i < len && catOf(text.codePointAt(i)) == cat)
              i += Character.charCount(text.codePointAt(i))
            f(text.substring(j - 1, i))
          } else {
            // a last non-space whitespace char matches bare `\s+`
            // alone; the following run restarts the loop (so a
            // contraction there keeps its alternation priority)
            f(text.substring(j - 1, j))
            i = j
          }
        }
      }
    }
  }

  /** [[foreachPretoken]] materialized — spec/driver convenience. */
  def pretokens(text: String): Array[String] = pretokens(text, gpt2Ws = false)

  def pretokens(text: String, gpt2Ws: Boolean): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    foreachPretoken(text, gpt2Ws)(out += _)
    out.toArray
  }

  /** One word's initial BPE symbols: its UTF-8 bytes, one 2-char
    * uppercase-hex symbol per byte.
    */
  def byteSyms(word: String): Array[String] = {
    val bs = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bs.length)
    var i = 0
    while (i < bs.length) {
      val v = bs(i) & 0xff
      out(i) = new String(
        Array(HexDigits(v >>> 4), HexDigits(v & 0xf)))
      i += 1
    }
    out
  }

  /** Parse a 2-char uppercase-hex base symbol back to its byte value
    * 0..255 — the base-vocab id.
    */
  def hexByte(sym: String): Int =
    (Character.digit(sym.charAt(0), 16) << 4) |
      Character.digit(sym.charAt(1), 16)

  /** Apply the ordered merge list to one word's UTF-8 BYTE symbols
    * ([[byteSyms]] — byte-level, so non-BMP text needs no surrogate
    * special-casing and nothing is ever out-of-alphabet): for each
    * merge (a, b) in order, replace adjacent (a, b) symbol
    * occurrences LEFT-TO-RIGHT, NON-OVERLAPPING ("aaa" under
    * (61,61) → [6161, 61]) — the standard BPE application rule.
    */
  def segment(word: String, ma: Array[String],
              mb: Array[String]): Array[String] = {
    var syms: Array[String] = byteSyms(word)
    var m = 0
    while (m < ma.length && syms.length > 1) {
      val a = ma(m); val b = mb(m)
      val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += a + b; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toArray
      m += 1
    }
    syms
  }

  /** True iff a word is a single ASCII char — exactly one UTF-8 byte,
    * so one base symbol, no pairs, no merges: the fast path every
    * byte-level kernel below takes (a single NON-ASCII char is
    * multiple bytes and must go through [[segment]]).
    */
  @inline private def singleByte(w: String): Boolean =
    w.length == 1 && w.charAt(0) < 0x80

  /** All adjacent-symbol pair keys (`"a b"`, space-separated — hex
    * symbols never contain a space, keeping the separator
    * unambiguous) of one string's PRETOKENS ([[foreachPretoken]] —
    * whitespace-faithful) under the current merges — OVERLAPS
    * INCLUDED ("aaa" yields (61,61) twice), the standard BPE counting
    * rule; the non-overlap rule applies at merge time, not count time.
    */
  def adjacentPairs(text: UTF8String, ma: Array[String],
                    mb: Array[String],
                    gpt2Ws: Boolean = false): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    foreachPretoken(text.toString, gpt2Ws) { w =>
      if (!singleByte(w)) {
        val s = segment(w, ma, mb)
        var i = 0
        while (i + 1 < s.length) {
          out += UTF8String.fromString(s(i) + " " + s(i + 1))
          i += 1
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Per-thread word→token-count memo for [[tokenCount]], valid for
    * one merge-table identity: corpora are Zipf — most word
    * occurrences are repeats — so encoding collapses from
    * O(occurrences × merges × len) to O(DISTINCT words × merges ×
    * len) + O(occurrences) lookups (measured 10× at the 100× scale
    * row: text_bpe_encode t100 21.3 s → 2.05 s). Keys on the merge
    * arrays' object identity (they are
    * `addReferenceObj` plan constants — one instance per generated
    * plan copy; a different plan's tables reset the memo), capped to
    * bound memory against adversarial all-distinct vocabularies.
    */
  private final class Memo {
    var ma: Array[String] = _
    var mb: Array[String] = _
    var chars = 0L // total memoized key chars — the real memory bound
    val counts = new java.util.HashMap[String, java.lang.Long]()
  }
  private val memo = new ThreadLocal[Memo] {
    override def initialValue(): Memo = new Memo
  }
  // the ThreadLocal lives as long as the executor thread, so the cache
  // must be SMALL in bytes, not just entries: cap entry count AND a
  // retained-size budget, and never memoize a pathological
  // whitespace-free mega-"word" — its segment cost is paid once
  // either way. Each entry is charged key length + MemoEntryOverhead
  // units (HashMap node + String/Long object headers, ~64 machine
  // bytes beyond the chars), so the 2^22-unit budget bounds the REAL
  // worst-case footprint at ~2 bytes/unit ≈ 8 MB/thread even for an
  // adversarial all-short-key vocabulary (4M/64 = 65536 entries, the
  // same ceiling MemoCap enforces).
  private val MemoCap = 1 << 16
  private val MemoMaxChars = 1L << 22
  private val MemoEntryOverhead = 64L
  private val MemoMaxWordLen = 1 << 10

  /** Per-thread word→ids memo for [[encodeIds]] — same identity /
    * cap / retained-size discipline as the token-count [[Memo]]
    * (ids add 4 bytes per token, charged below).
    */
  private final class IdMemo {
    var ma: Array[String] = _
    var mb: Array[String] = _
    var chars = 0L
    val ids = new java.util.HashMap[String, Array[Int]]()
  }
  private val idMemo = new ThreadLocal[IdMemo] {
    override def initialValue(): IdMemo = new IdMemo
  }

  /** Token-ID array of a string under the merges — the thing a
    * training loader actually consumes. Symbol→id is the GPT-2
    * byte-level vocab convention: a single UTF-8 byte is its own id
    * (base vocab 0..255 — a 2-char hex symbol parses straight to its
    * id), merge i's output symbol is id 256+i (first merge wins on a
    * duplicate output). Every symbol [[segment]] can emit is either a
    * base byte or a merge output, so the reserved `unk` id is
    * unreachable by construction — kept only as a defensive sentinel.
    * Pretokens are WHITESPACE-FAITHFUL ([[foreachPretoken]]):
    * whitespace bytes carry ids like any other byte, ids concatenate
    * across pretokens, `ids.length` equals [[tokenCount]] exactly
    * (spec-pinned on the whole sf table), and
    * `decode(encode(text)) == text` byte-for-byte.
    */
  def encodeIds(text: UTF8String, ma: Array[String], mb: Array[String],
                idMap: java.util.HashMap[String, Integer],
                unk: Int, gpt2Ws: Boolean = false): ArrayData = {
    val m = idMemo.get()
    if (!(m.ma eq ma) || !(m.mb eq mb)) {
      m.ma = ma; m.mb = mb; m.chars = 0L; m.ids.clear()
    }
    def idOf(sym: String): Int =
      if (sym.length == 2) hexByte(sym) // base symbols are exactly 2
      else {                            // hex chars; merged ones >= 4
        val v = idMap.get(sym)
        if (v == null) unk else v.intValue
      }
    // primitive accumulator: the output row count on this path grows
    // ~100x at bench scale, so per-token boxing (Integer + Object[]
    // array) would dominate the kernel's own work; grow a raw int
    // buffer and hand Spark a primitive-backed UnsafeArrayData
    var buf = new Array[Int](64)
    var n = 0
    def push(id: Int): Unit = {
      if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n << 1)
      buf(n) = id; n += 1
    }
    def pushAll(ids: Array[Int]): Unit = {
      if (n + ids.length > buf.length)
        buf = java.util.Arrays.copyOf(buf,
          math.max(buf.length << 1, n + ids.length))
      System.arraycopy(ids, 0, buf, n, ids.length); n += ids.length
    }
    // the memo is whitespace-MODE-SAFE: entries are keyed by the
    // pretoken STRING, and a given word segments identically whichever
    // mode produced its boundaries
    foreachPretoken(text.toString, gpt2Ws) { w =>
      if (singleByte(w)) push(w.charAt(0)) // one ASCII byte = its id
      else {
        val hit = m.ids.get(w)
        if (hit != null) pushAll(hit)
        else {
          val syms = segment(w, ma, mb)
          val ids = new Array[Int](syms.length)
          var i = 0
          while (i < syms.length) { ids(i) = idOf(syms(i)); i += 1 }
          val charge = w.length + 2L * ids.length + MemoEntryOverhead
          if (w.length <= MemoMaxWordLen && m.ids.size < MemoCap &&
              m.chars + charge <= MemoMaxChars) {
            m.ids.put(w, ids)
            m.chars += charge
          }
          pushAll(ids)
        }
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(buf, n))
  }

  /** Detokenize one id array under an id→hex-symbol table (index =
    * id; null slots = dead duplicate-merge ids and the unk sentinel):
    * concatenate the tokens' hex, parse to UTF-8 bytes — the
    * loader-side inverse of [[encodeIds]]. An out-of-range, dead, or
    * NULL-element id (a corrupted stream) returns NULL rather than
    * garbage.
    */
  def decodeIds(ids: ArrayData, toks: Array[String]): UTF8String = {
    val n = ids.numElements()
    var hexLen = 0
    var i = 0
    while (i < n) {
      // a null slot is a corrupted stream, same contract as a dead id
      if (ids.isNullAt(i)) return null
      val id = ids.getInt(i)
      if (id < 0 || id >= toks.length || toks(id) == null) return null
      hexLen += toks(id).length
      i += 1
    }
    val bs = new Array[Byte](hexLen >> 1)
    var o = 0
    i = 0
    while (i < n) {
      val t = toks(ids.getInt(i))
      var j = 0
      while (j < t.length) {
        bs(o) = ((Character.digit(t.charAt(j), 16) << 4) |
          Character.digit(t.charAt(j + 1), 16)).toByte
        o += 1
        j += 2
      }
      i += 1
    }
    UTF8String.fromBytes(bs)
  }

  /** Total BPE token count of a string's whitespace-faithful
    * PRETOKENS ([[foreachPretoken]]) under the merges (single-BYTE
    * pretokens — single ASCII chars, including a lone space — count 1
    * token each; a single non-ASCII char is several base bytes and
    * goes through the segmenter like any other pretoken).
    */
  def tokenCount(text: UTF8String, ma: Array[String],
                 mb: Array[String], gpt2Ws: Boolean = false): Long = {
    val m = memo.get()
    if (!(m.ma eq ma) || !(m.mb eq mb)) {
      m.ma = ma; m.mb = mb; m.chars = 0L; m.counts.clear()
    }
    var n = 0L
    // mode-safe memo: keyed by pretoken string (see encodeIds)
    foreachPretoken(text.toString, gpt2Ws) { w =>
      if (singleByte(w)) n += 1
      else {
        val hit = m.counts.get(w)
        if (hit != null) n += hit.longValue
        else {
          val c = segment(w, ma, mb).length.toLong
          if (w.length <= MemoMaxWordLen && m.counts.size < MemoCap &&
              m.chars + w.length + MemoEntryOverhead <= MemoMaxChars) {
            m.counts.put(w, java.lang.Long.valueOf(c))
            m.chars += w.length + MemoEntryOverhead
          }
          n += c
        }
      }
    }
    n
  }
}

private[graft] trait BpeStringInput
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects STRING, got $other")
    }
}

/** Adjacent BPE pair keys of a text under the merge-list constant. */
case class BpeAdjacentPairs(child: Expression, ma: Array[String],
                            mb: Array[String],
                            gpt2Ws: Boolean = false)
    extends BpeStringInput {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.adjacentPairs(input.asInstanceOf[UTF8String], ma, mb, gpt2Ws)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ra = ctx.addReferenceObj("bpeMa", ma, "java.lang.String[]")
    val rb = ctx.addReferenceObj("bpeMb", mb, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeKernel.adjacentPairs($c, $ra, $rb, $gpt2Ws)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeAdjacentPairs =
    copy(child = newChild)
}

/** Total BPE token count of a text under the merge-list constant. */
case class BpeTokenCount(child: Expression, ma: Array[String],
                         mb: Array[String],
                         gpt2Ws: Boolean = false) extends BpeStringInput {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.tokenCount(input.asInstanceOf[UTF8String], ma, mb, gpt2Ws)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ra = ctx.addReferenceObj("bpeMa", ma, "java.lang.String[]")
    val rb = ctx.addReferenceObj("bpeMb", mb, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeKernel.tokenCount($c, $ra, $rb, $gpt2Ws)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** Token-ID array of a text under the merge-list + vocab constants
  * ([[BpeKernel.encodeIds]]).
  */
case class BpeEncodeIds(child: Expression, ma: Array[String],
                        mb: Array[String],
                        idMap: java.util.HashMap[String, Integer],
                        unk: Int,
                        gpt2Ws: Boolean = false) extends BpeStringInput {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.encodeIds(input.asInstanceOf[UTF8String], ma, mb, idMap,
      unk, gpt2Ws)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ra = ctx.addReferenceObj("bpeMa", ma, "java.lang.String[]")
    val rb = ctx.addReferenceObj("bpeMb", mb, "java.lang.String[]")
    val rm = ctx.addReferenceObj("bpeIds", idMap,
      "java.util.HashMap<java.lang.String, java.lang.Integer>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeKernel.encodeIds($c, $ra, $rb, $rm, $unk, " +
        s"$gpt2Ws)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIds =
    copy(child = newChild)
}

/** Detokenize an `array<int>` id column under the id→hex-symbol table
  * constant ([[BpeKernel.decodeIds]]) — the loader-side inverse of
  * [[BpeEncodeIds]].
  */
case class BpeDecodeIds(child: Expression, toks: Array[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.IntegerType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects ARRAY<INT>, got $other")
    }
  override def dataType: DataType = StringType
  // a corrupted stream (out-of-range / dead id) decodes to NULL
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.decodeIds(input.asInstanceOf[ArrayData], toks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = ctx.addReferenceObj("bpeToks", toks, "java.lang.String[]")
    val childGen = child.genCode(ctx)
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        UTF8String ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.BpeKernel.decodeIds(
            ${childGen.value}, $rt);
          ${ev.isNull} = ${ev.value} == null;
        }
      """
    ev.copy(code = code)
  }
  override protected def withNewChildInternal(newChild: Expression): BpeDecodeIds =
    copy(child = newChild)
}

/** Column-API entry points for the BPE kernels. */
object bpe {
  def adjacentPairs(text: Column, merges: Seq[(String, String)],
                    gpt2Ws: Boolean = false): Column =
    ColumnBridge.column(BpeAdjacentPairs(ColumnBridge.expression(text),
      merges.map(_._1).toArray, merges.map(_._2).toArray, gpt2Ws))
  def tokenCount(text: Column, merges: Seq[(String, String)],
                 gpt2Ws: Boolean = false): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(text),
      merges.map(_._1).toArray, merges.map(_._2).toArray, gpt2Ws))

  /** Merge-output→id map (id = 256 + first merge index producing the
    * symbol — the byte-level base vocab owns 0..255) — the non-base
    * half of the stable vocab; shared by [[encodeIds]] and
    * [[graft.operators.Bpe.vocab]] so the encode kernel and the
    * persisted vocab artifact can never disagree.
    */
  def mergeIdMap(merges: Seq[(String, String)])
      : java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + b, Integer.valueOf(256 + i))
    }
    m
  }

  /** The reserved unknown-symbol id: one past the merge id block.
    * Unreachable by construction under the byte-level base vocab
    * (every symbol is either a base byte or a merge output) — kept
    * as a defensive sentinel so a corrupted artifact fails visibly.
    */
  def unkId(merges: Seq[(String, String)]): Int = 256 + merges.length

  /** Special-token ids live ABOVE the text vocab (base 256 + merges +
    * unk), the deployed-tokenizer convention: they can never collide
    * with a learned token, and [[decodeIds]] flags them as corrupt —
    * strip specials before detokenizing, like a production loader. */
  def eosId(merges: Seq[(String, String)]): Int = unkId(merges) + 1
  def bosId(merges: Seq[(String, String)]): Int = unkId(merges) + 2

  def encodeIds(text: Column, merges: Seq[(String, String)],
                gpt2Ws: Boolean = false): Column =
    ColumnBridge.column(BpeEncodeIds(ColumnBridge.expression(text),
      merges.map(_._1).toArray, merges.map(_._2).toArray,
      mergeIdMap(merges), unkId(merges), gpt2Ws))

  /** Remap an engine id stream through an
    * [[graft.operators.Bpe.externalIds]] table — plain builtin
    * `transform` + `element_at` over a plan-constant array (codegen'd,
    * no custom kernel), so [[encodeIds]] composed with this emits a
    * DEPLOYED tokenizer's id space. */
  def remapIds(ids: Column, table: Array[Int]): Column =
    org.apache.spark.sql.functions.transform(ids,
      x => org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.typedLit(table.toSeq), x + 1))

  /** The id-indexed hex-symbol table [[BpeDecodeIds]] decodes under —
    * slot = id, base 0..255 then merge outputs (first-wins via
    * [[mergeIdMap]], dead duplicate slots and the unk sentinel stay
    * null so a corrupted stream decodes to NULL, not garbage).
    */
  def decodeTokTable(merges: Seq[(String, String)]): Array[String] = {
    val m = mergeIdMap(merges)
    val toks = new Array[String](256 + merges.length)
    (0 until 256).foreach(b => toks(b) = f"$b%02X")
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      if (m.get(a + b).intValue == 256 + i) toks(256 + i) = a + b
    }
    toks
  }

  /** Detokenize an `array<int>` id column under the merges — the
    * loader-side inverse of [[encodeIds]] ([[BpeDecodeIds]], one
    * codegen kernel call). Pretokenization is whitespace-faithful, so
    * `decodeIds(encodeIds(text)) == text` EXACTLY (oracle- and
    * spec-pinned against the raw source).
    */
  def decodeIds(ids: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeDecodeIds(ColumnBridge.expression(ids),
      decodeTokTable(merges)))
}
