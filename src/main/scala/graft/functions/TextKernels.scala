package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word n-gram kernel.
  *
  * The lambda formulation — `transform(sequence(1, size-n+1),
  * i -> concat_ws(' ', slice(words, i, n)))` — is a HigherOrderFunction,
  * which Catalyst always interprets (no codegen): per gram it walks an
  * expression tree, allocates a sliced array, and re-joins it. That made
  * gram generation the dominant cost of the corpus-level queries
  * (~15 µs/gram; 3.8 s of q_boilerplate_ngrams' 3.4+ s at sf0.1).
  *
  * This kernel does one scan over the UTF-8 bytes: records word boundaries
  * (maximal runs of non-ASCII-whitespace — the same token set as
  * `split(trim(text), "\\s+")` for ASCII whitespace), then materializes each
  * gram as a single byte-copy. Optional in-kernel dedup (insertion-ordered)
  * replaces a separately-interpreted `array_distinct`.
  */
object TextKernels {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** All word `n`-grams of `s`, joined with single spaces; insertion-ordered
    * dedup when `distinct`. Returns an ArrayData of UTF8String. */
  def wordNgrams(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val bytes = s.getBytes
    // collect word [start, end) offsets
    var nWords = 0
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var i = 0
    while (i < bytes.length) {
      if (!isWs(bytes(i))) {
        val start = i
        while (i < bytes.length && !isWs(bytes(i))) i += 1
        if (nWords == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nWords * 2)
          ends = java.util.Arrays.copyOf(ends, nWords * 2)
        }
        starts(nWords) = start
        ends(nWords) = i
        nWords += 1
      } else i += 1
    }
    val nGrams = nWords - n + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nGrams)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var kept = 0
    var g = 0
    while (g < nGrams) {
      // gram = words g..g+n-1 joined by ' ': one allocation, one copy pass
      var len = n - 1
      var w = g
      while (w < g + n) { len += ends(w) - starts(w); w += 1 }
      val buf = new Array[Byte](len)
      var pos = 0
      w = g
      while (w < g + n) {
        val wl = ends(w) - starts(w)
        System.arraycopy(bytes, starts(w), buf, pos, wl)
        pos += wl
        if (w < g + n - 1) { buf(pos) = ' '; pos += 1 }
        w += 1
      }
      val gram = UTF8String.fromBytes(buf)
      if (seen == null || seen.add(gram)) { out(kept) = gram; kept += 1 }
      g += 1
    }
    new GenericArrayData(if (kept == nGrams) out else out.take(kept))
  }

  /** Per-document term frequencies in ONE pass, no shuffle: all tokens of a
    * document live in its row, so `explode(word_counts(text))` yields the
    * same (term, tf) rows as `explode(tokens) → groupBy(doc, term)` WITHOUT
    * the widest shuffle of the tf-idf pipeline (one row per token moved to
    * co-locate what was already co-located). Token set matches
    * `split(trim(text), "\\s+")` minus empties; insertion-ordered output. */
  def wordCounts(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val counts = new java.util.LinkedHashMap[UTF8String, java.lang.Long]()
    var i = 0
    while (i < bytes.length) {
      if (!isWs(bytes(i))) {
        val start = i
        while (i < bytes.length && !isWs(bytes(i))) i += 1
        val w = UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, start, i))
        val prev = counts.get(w)
        counts.put(w, if (prev == null) 1L else prev + 1L)
      } else i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue.longValue()))
      k += 1
    }
    new GenericArrayData(out)
  }
}

object QualityKernel {
  /** One pass over the UTF-8 bytes computing the quality-gate features:
    * word count, non-whitespace codepoints, symbol codepoints (anything
    * that is not a UNICODE letter/digit and not whitespace — the regex
    * `[^\p{L}\p{Nd}\s]`; counting every non-ASCII codepoint as a symbol
    * would reject any Russian/Greek/CJK document at a 10% symbol cap,
    * silently dropping all non-Latin corpora), and the number of DISTINCT
    * stopwords hit (case-insensitive
    * ASCII compare against `stops`). Returns [n_words, letters, symbols,
    * stop_distinct] — a struct-free long[4] kept cheap enough that a filter
    * predicate re-evaluating it per branch still runs at scan speed (the
    * regex/lambda formulation made `filter(keep)` recompute ~5 regex scans
    * and an interpreted lambda per row, 15 s at 2M docs; this is <1 s). */
  def stats(s: UTF8String, stops: Array[UTF8String]): ArrayData = {
    val bytes = s.getBytes
    var nWords = 0L
    var letters = 0L
    var symbols = 0L
    var stopMask = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r') {
        i += 1
      } else {
        val start = i
        while (i < bytes.length && {
          val c = bytes(i)
          !(c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r')
        }) {
          val c = bytes(i)
          // count codepoints (skip UTF-8 continuation bytes)
          if ((c & 0xc0) != 0x80) {
            letters += 1
            val alnum =
              if ((c & 0x80) == 0) // ASCII fast path — no table lookup
                (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
              else { // decode the full codepoint for the Unicode classes
                val n = if ((c & 0xe0) == 0xc0) 1 else if ((c & 0xf0) == 0xe0) 2 else 3
                var cp = c & (0x3f >> n)
                var k = 1
                while (k <= n && i + k < bytes.length) {
                  cp = (cp << 6) | (bytes(i + k) & 0x3f); k += 1
                }
                Character.isLetterOrDigit(cp)
              }
            if (!alnum) symbols += 1
          }
          i += 1
        }
        nWords += 1
        // case-insensitive ASCII compare of word [start,i) against each stopword
        var sw = 0
        while (sw < stops.length) {
          if ((stopMask & (1L << sw)) == 0L) {
            val st = stops(sw).getBytes
            if (st.length == i - start) {
              var j = 0
              var eq = true
              while (eq && j < st.length) {
                val a = bytes(start + j)
                val al = if (a >= 'A' && a <= 'Z') (a + 32).toByte else a
                if (al != st(j)) eq = false
                j += 1
              }
              if (eq) stopMask |= (1L << sw)
            }
          }
          sw += 1
        }
      }
    }
    new GenericArrayData(Array[Any](nWords, letters, symbols,
      java.lang.Long.bitCount(stopMask).toLong))
  }
}

/** Codegen'd quality-stat kernel: ARRAY<BIGINT> of
  * [n_words, non-ws codepoints, symbol codepoints, distinct stopword hits]. */
case class QualityStats(child: Expression, stops: Seq[String]) extends UnaryExpression {
  require(stops.length <= 64, "stopword bitmask holds at most 64 words")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quality_stats"
  @transient private lazy val stopArr: Array[UTF8String] =
    stops.map(w => UTF8String.fromString(w.toLowerCase)).toArray
  override def nullSafeEval(s: Any): Any =
    QualityKernel.stats(s.asInstanceOf[UTF8String], stopArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stops", stopArr, "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.QualityKernel.stats($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Codegen'd `word_ngrams(text, n[, distinct])` — see TextKernels. */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"word_ngrams: n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"
  override def nullSafeEval(s: Any): Any =
    TextKernels.wordNgrams(s.asInstanceOf[UTF8String], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.wordNgrams($c, $n, $distinct)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Codegen'd `word_counts(text)`: ARRAY<STRUCT<term STRING, tf BIGINT>> of
  * per-document term frequencies — see TextKernels.wordCounts. */
case class WordCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "word_counts"
  override def nullSafeEval(s: Any): Any =
    TextKernels.wordCounts(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.wordCounts($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextExprs {
  def word_ngrams(text: Column, n: Int, distinct: Boolean = false): Column =
    Shims.column(WordNgrams(Shims.expression(text), n, distinct))
  def quality_stats(text: Column, stops: Seq[String]): Column =
    Shims.column(QualityStats(Shims.expression(text), stops))
  def word_counts(text: Column): Column =
    Shims.column(WordCounts(Shims.expression(text)))
}
