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

  /** All k-CHARACTER grams of `s` (code-point windows, unicode-safe) —
    * element-for-element what the interpreted lambda
    * `transform(sequence(1, length(s) - (k-1)), i -> substring(s, i, k))`
    * produces, including the degenerate `length(s) < k` case (where the
    * sequence DESCENDS 1, 0, …, len-k+1 and substring's zero/negative
    * position semantics apply — delegated to `substringSQL`, the exact
    * routine the Substring expression calls, so the corner stays
    * byte-identical); insertion-ordered dedup when `distinct` (== a
    * wrapping `array_distinct`). The lambda formulation is a
    * HigherOrderFunction — interpreted per POSITION, which made char-gram
    * enumeration the dominant cost of the substring-identity span/Jaccard
    * operators; this kernel is one offsets walk plus zero-copy slices. */
  def charNgrams(s: UTF8String, k: Int, distinct: Boolean): ArrayData = {
    val bytes = s.getBytes
    // byte offset of each character start, plus the terminal offset
    var n = 0
    var i = 0
    while (i < bytes.length) { i += UTF8String.numBytesForFirstByte(bytes(i)); n += 1 }
    val nGrams = n - k + 1
    if (nGrams >= 1) {
      val offsets = new Array[Int](n + 1)
      i = 0
      var c = 0
      while (i < bytes.length) {
        offsets(c) = i
        i += UTF8String.numBytesForFirstByte(bytes(i))
        c += 1
      }
      offsets(n) = bytes.length
      val out = new Array[Any](nGrams)
      val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
      var kept = 0
      var g = 0
      while (g < nGrams) {
        val gram = UTF8String.fromBytes(bytes, offsets(g), offsets(g + k) - offsets(g))
        if (seen == null || seen.add(gram)) { out(kept) = gram; kept += 1 }
        g += 1
      }
      new GenericArrayData(if (kept == nGrams) out else out.take(kept))
    } else {
      // length(s) < k: sequence(1, n-k+1) descends 1 .. n-k+1
      val out = new Array[Any](1 - (nGrams - 1))
      val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
      var kept = 0
      var p = 1
      while (p >= nGrams) {
        val gram = s.substringSQL(p, k)
        if (seen == null || seen.add(gram)) { out(kept) = gram; kept += 1 }
        p -= 1
      }
      new GenericArrayData(out.take(kept))
    }
  }

  /** Count of the most frequent element of a string array — the value the
    * interpreted `aggregate(array_sort(arr), …)` run-length fold computes
    * (that HigherOrderFunction walked an expression tree per ELEMENT; this
    * is one hash-count pass). 0 on an empty array, like the fold's zero. */
  def maxFreq(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val prev = counts.get(s)
      val c = if (prev == null) 1 else prev + 1
      counts.put(s, c)
      if (c > best) best = c
      i += 1
    }
    best.toLong
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

object LangKernel {
  private val ZH = UTF8String.fromString("zh")
  private val UND = UTF8String.fromString("und")

  /** One-pass language-ID kernel: per-language marker-token hit counts
    * (whitespace tokens, ASCII-case-insensitive compare against the
    * lowercase marker words) plus a han-script presence check, replacing
    * the interpreted `split(lower(text)) → filter(isin…) per language →
    * regexp_extract_all` pipeline (one interpreted lambda pass per language
    * plus a full match materialization just to count). Semantics pinned to
    * the column formulation (PipelineSpec): tokens are maximal runs of
    * non-[ \t\n\x0B\f\r] (Java `\s`), markers are ASCII so only A-Z folding
    * can make a token equal one, ties keep the EARLIEST declared language,
    * zero hits → "und", any U+4E00..U+9FFF codepoint → "zh". */
  def langId(s: UTF8String, markers: Array[Array[UTF8String]],
      langs: Array[UTF8String]): UTF8String = {
    val bytes = s.getBytes
    val scores = new Array[Int](markers.length)
    var han = false
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
          // han check on the raw codepoints (3-byte UTF-8 leads 0xE4-0xE9
          // cover U+4000-U+9FFF; decode only those)
          if (!han && (c & 0xff) >= 0xe4 && (c & 0xff) <= 0xe9 && i + 2 < bytes.length) {
            val cp = ((c & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) | (bytes(i + 2) & 0x3f)
            if (cp >= 0x4e00 && cp <= 0x9fff) han = true
          }
          i += 1
        }
        // ASCII-case-insensitive compare of token [start,i) vs each marker
        val tlen = i - start
        var l = 0
        while (l < markers.length) {
          val ws = markers(l)
          var m = 0
          var hit = false
          while (!hit && m < ws.length) {
            val w = ws(m).getBytes
            if (w.length == tlen) {
              var j = 0
              var eq = true
              while (eq && j < tlen) {
                val a = bytes(start + j)
                val al = if (a >= 'A' && a <= 'Z') (a + 32).toByte else a
                if (al != w(j)) eq = false
                j += 1
              }
              hit = eq
            }
            m += 1
          }
          if (hit) scores(l) += 1
          l += 1
        }
      }
    }
    if (han) return ZH
    var best = -1
    var bestScore = 0
    var l = 0
    while (l < scores.length) {
      if (scores(l) > bestScore) { bestScore = scores(l); best = l }
      l += 1
    }
    if (best < 0) UND else langs(best)
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
    * stop_distinct, stop_hits] — a struct-free long[5] kept cheap enough
    * that a filter predicate re-evaluating it per branch still runs at scan
    * speed (the regex/lambda formulation made `filter(keep)` recompute ~5
    * regex scans and an interpreted lambda per row, 15 s at 2M docs; this
    * is <1 s). stop_hits (r19) counts stopword OCCURRENCES — the
    * qualityFeatures ratio's numerator, whose `filter(toks, isin…)` lambda
    * was the last interpreted per-token pass in the text-quality family. */
  def stats(s: UTF8String, stops: Array[UTF8String]): ArrayData = {
    val bytes = s.getBytes
    var nWords = 0L
    var letters = 0L
    var symbols = 0L
    var stopMask = 0L
    var stopHits = 0L
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
        // case-insensitive ASCII compare of word [start,i) against each
        // stopword; a token equals at most one stopword, so the occurrence
        // counter advances once per matching token
        var sw = 0
        var matched = false
        while (!matched && sw < stops.length) {
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
            if (eq) { stopMask |= (1L << sw); stopHits += 1; matched = true }
          }
          sw += 1
        }
      }
    }
    new GenericArrayData(Array[Any](nWords, letters, symbols,
      java.lang.Long.bitCount(stopMask).toLong, stopHits))
  }
}

/** Codegen'd quality-stat kernel: ARRAY<BIGINT> of [n_words, non-ws
  * codepoints, symbol codepoints, distinct stopword hits, stopword
  * occurrence hits]. */
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

/** Codegen'd `char_ngrams(text, k[, distinct])` — see TextKernels. */
case class CharNgrams(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {
  require(k >= 1, s"char_ngrams: k must be >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"
  override def nullSafeEval(s: Any): Any =
    TextKernels.charNgrams(s.asInstanceOf[UTF8String], k, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.charNgrams($c, $k, $distinct)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Codegen'd `max_freq(arr)`: count of the most frequent element. */
case class MaxFreq(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "max_freq"
  override def nullSafeEval(a: Any): Any =
    TextKernels.maxFreq(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.maxFreq($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Codegen'd `lang_id(text)` — see LangKernel. `langs`/`markers` are
  * parallel: markers(i) are the (lowercase ASCII) marker words of langs(i). */
case class LangId(child: Expression, langs: Seq[String], markers: Seq[Seq[String]])
    extends UnaryExpression {
  require(langs.length == markers.length, "lang_id: langs/markers must be parallel")
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  @transient private lazy val markerArr: Array[Array[UTF8String]] =
    markers.map(_.map(w => UTF8String.fromString(w.toLowerCase)).toArray).toArray
  @transient private lazy val langArr: Array[UTF8String] =
    langs.map(UTF8String.fromString).toArray
  override def nullSafeEval(s: Any): Any =
    LangKernel.langId(s.asInstanceOf[UTF8String], markerArr, langArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("markers", markerArr,
      "org.apache.spark.unsafe.types.UTF8String[][]")
    val l = ctx.addReferenceObj("langs", langArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.LangKernel.langId($c, $m, $l)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextExprs {
  def word_ngrams(text: Column, n: Int, distinct: Boolean = false): Column =
    Shims.column(WordNgrams(Shims.expression(text), n, distinct))
  def quality_stats(text: Column, stops: Seq[String]): Column =
    Shims.column(QualityStats(Shims.expression(text), stops))
  def word_counts(text: Column): Column =
    Shims.column(WordCounts(Shims.expression(text)))
  def char_ngrams(text: Column, k: Int, distinct: Boolean = false): Column =
    Shims.column(CharNgrams(Shims.expression(text), k, distinct))
  def max_freq(arr: Column): Column =
    Shims.column(MaxFreq(Shims.expression(arr)))
  def lang_id(text: Column, langs: Seq[String], markers: Seq[Seq[String]]): Column =
    Shims.column(LangId(Shims.expression(text), langs, markers))
}
