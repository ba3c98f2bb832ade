package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Doc-local span folding for the substring-dedup operators (r19, guide §8:
  * decide with small rows, move big rows once).
  *
  * The r18 spans plans shuffled EVERY gram occurrence of the corpus by gram
  * so that the per-position verdicts could be joined back and re-assembled
  * through two windows, an islands aggregate and a rebuild join — ~10 wide
  * operators per gate, and the cut gate's union evaluated the whole pipeline
  * twice. But every per-position verdict is a function of (a) the gram at
  * that position and (b) the per-gram corpus stats (cross-doc count, min-id
  * owner) — and a document's verdict set is fully determined by the SET of
  * its duplicated grams. So the only thing that must cross the cluster is
  * the per-doc DISTINCT gram stream (which the plan already shuffled once
  * for the stats aggregate); positions never leave their document. These
  * expressions finish the job doc-locally in one pass: re-derive the gram
  * at each position with the exact kernel the stats used
  * ([[RollingHashes.compute]] / [[RollingHashes.compute128]] / the literal
  * substring), test membership in the doc's duplicated-gram set, and fold
  * the hit positions directly into the operator's answer — no position
  * explode, no window, no islands aggregate, no rebuild join.
  *
  * Identity modes are inferred from the gram array's element type:
  *  - ARRAY<BIGINT>   — the 64-bit rolling-hash identity (coverage kernel
  *                      path), positions in BYTES;
  *  - ARRAY<BINARY>   — the two-family 128-bit identity (destructive cut
  *                      kernel path), positions in BYTES;
  *  - ARRAY<STRING>   — literal k-char substrings (oracle-parity path),
  *                      positions in CHARACTERS, unicode-safe.
  *
  * Byte-mode CUT reproduces the pre-r19 plan's semantics exactly, including
  * its documented single-byte-corpus contract: cut windows are byte-indexed
  * but the surviving text is re-sliced with CHARACTER offsets (the
  * `substring` the old rebuild used), so multi-byte inputs shift identically
  * to the old plan rather than differently-wrong.
  */
object SpanKernels {

  private val MODE_H64 = 0
  private val MODE_H128 = 1
  private val MODE_STR = 2

  private val binCmp = new java.util.Comparator[Array[Byte]] {
    override def compare(a: Array[Byte], b: Array[Byte]): Int =
      java.util.Arrays.compareUnsigned(a, b)
  }

  /** Byte offset of each character start, plus the terminal offset —
    * `offsets(c)` is where character `c` (0-based) begins. */
  private def charOffsets(bytes: Array[Byte]): Array[Int] = {
    var n = 0
    var i = 0
    while (i < bytes.length) { i += UTF8String.numBytesForFirstByte(bytes(i)); n += 1 }
    val offsets = new Array[Int](n + 1)
    i = 0
    var c = 0
    while (i < bytes.length) {
      offsets(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offsets(n) = bytes.length
    offsets
  }

  /** Ascending 1-based positions (gram units) whose window is in the gram
    * set. Shared by both folds; `null` text never reaches here (null-safe
    * expressions). */
  private def dupPositions(text: UTF8String, grams: ArrayData, k: Int,
      mode: Int): Array[Int] = {
    val bytes = text.getBytes
    mode match {
      case MODE_H64 =>
        val set = grams.toLongArray()
        java.util.Arrays.sort(set)
        val hs = RollingHashes.compute(bytes, k, 0L)
        val out = new Array[Int](hs.length)
        var n = 0
        var i = 0
        while (i < hs.length) {
          if (java.util.Arrays.binarySearch(set, hs(i)) >= 0) { out(n) = i + 1; n += 1 }
          i += 1
        }
        java.util.Arrays.copyOf(out, n)
      case MODE_H128 =>
        val m = grams.numElements()
        val set = new Array[Array[Byte]](m)
        var j = 0
        while (j < m) { set(j) = grams.getBinary(j); j += 1 }
        java.util.Arrays.sort(set, binCmp)
        val hs = RollingHashes.compute128(bytes, k)
        val out = new Array[Int](hs.length)
        var n = 0
        var i = 0
        while (i < hs.length) {
          if (java.util.Arrays.binarySearch(set.asInstanceOf[Array[AnyRef]],
              hs(i), binCmp.asInstanceOf[java.util.Comparator[AnyRef]]) >= 0) {
            out(n) = i + 1; n += 1
          }
          i += 1
        }
        java.util.Arrays.copyOf(out, n)
      case MODE_STR =>
        val m = grams.numElements()
        val set = new java.util.HashSet[UTF8String](math.max(16, m * 2))
        var j = 0
        while (j < m) { set.add(grams.getUTF8String(j)); j += 1 }
        val offsets = charOffsets(bytes)
        val nWin = offsets.length - 1 - k + 1 // numChars - k + 1
        val out = new Array[Int](math.max(nWin, 0))
        var n = 0
        var c = 0
        while (c < nWin) {
          val w = UTF8String.fromBytes(bytes, offsets(c), offsets(c + k) - offsets(c))
          if (set.contains(w)) { out(n) = c + 1; n += 1 }
          c += 1
        }
        java.util.Arrays.copyOf(out, n)
    }
  }

  /** Coverage fold: (n_dup_grams, dup_chars) — dup_chars is the exact union
    * length of the overlapping [p, p+k) windows (min(k, delta) per
    * consecutive position, k for the first). */
  def coverage(text: UTF8String, grams: ArrayData, k: Int, mode: Int): InternalRow = {
    val ps = dupPositions(text, grams, k, mode)
    var dupChars = 0L
    var prev = -1
    var i = 0
    while (i < ps.length) {
      dupChars += (if (prev < 0) k else math.min(k, ps(i) - prev))
      prev = ps(i)
      i += 1
    }
    new GenericInternalRow(Array[Any](ps.length.toLong, dupChars))
  }

  /** Cut fold: (removed_chars, clean_text). Islands merge positions whose
    * gap is <= k (the gaps-and-islands rule of the pre-r19 plan); the clean
    * text is the concatenation of the complement segments, sliced with
    * CHARACTER offsets at the (gram-unit) island boundaries — exactly what
    * the old rebuild's `substring(text, seg_start, seg_len)` did for both
    * identities. */
  def cut(text: UTF8String, grams: ArrayData, k: Int, mode: Int): InternalRow = {
    val ps = dupPositions(text, grams, k, mode)
    if (ps.length == 0)
      return new GenericInternalRow(Array[Any](0L, text))
    // islands over ascending positions: [starts(i), ends(i)) in gram units
    var nIsl = 0
    val starts = new Array[Int](ps.length)
    val ends = new Array[Int](ps.length)
    var i = 0
    while (i < ps.length) {
      if (nIsl == 0 || ps(i) - ps(i - 1) > k) {
        starts(nIsl) = ps(i); ends(nIsl) = ps(i) + k; nIsl += 1
      } else ends(nIsl - 1) = ps(i) + k
      i += 1
    }
    var removed = 0L
    i = 0
    while (i < nIsl) { removed += ends(i) - starts(i); i += 1 }
    // complement segments, sliced at CHARACTER offsets (old-plan parity)
    val bytes = text.getBytes
    val offsets = charOffsets(bytes)
    val nc = offsets.length - 1
    def byteAt(pos1: Long): Int = { // 1-based gram-unit index -> byte offset
      val c = math.min(math.max(pos1 - 1, 0L), nc.toLong).toInt
      offsets(c)
    }
    val sb = new java.io.ByteArrayOutputStream(bytes.length)
    var segStart = 1L
    i = 0
    while (i < nIsl) {
      val from = byteAt(segStart)
      val until = byteAt(starts(i))
      if (until > from) sb.write(bytes, from, until - from)
      segStart = ends(i)
      i += 1
    }
    val tailFrom = byteAt(segStart)
    if (bytes.length > tailFrom) sb.write(bytes, tailFrom, bytes.length - tailFrom)
    new GenericInternalRow(Array[Any](removed, UTF8String.fromBytes(sb.toByteArray)))
  }

  /** Dispatch target for codegen (one static call, stays in whole-stage
    * codegen like [[RollingHashes128]]). */
  def fold(text: UTF8String, grams: ArrayData, k: Int, mode: Int,
      doCut: Boolean): InternalRow =
    if (doCut) cut(text, grams, k, mode) else coverage(text, grams, k, mode)

  /** Column entry points. */
  def span_coverage(text: Column, grams: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.Shims
    Shims.column(SpanFold(Shims.expression(text), Shims.expression(grams), k, doCut = false))
  }

  def cut_spans(text: Column, grams: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.Shims
    Shims.column(SpanFold(Shims.expression(text), Shims.expression(grams), k, doCut = true))
  }
}

/** `span_fold(text, grams)` — see [[SpanKernels]]. Struct-typed so one pass
  * yields both fields; deterministic, so whole-stage codegen's
  * subexpression elimination evaluates it once however many fields the
  * projection reads. */
case class SpanFold(text: Expression, grams: Expression, k: Int, doCut: Boolean)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = grams

  override def dataType: DataType =
    if (doCut) StructType(Seq(
      StructField("removed_chars", LongType, nullable = false),
      StructField("clean_text", StringType, nullable = true)))
    else StructType(Seq(
      StructField("n_dup_grams", LongType, nullable = false),
      StructField("dup_chars", LongType, nullable = false)))

  override def prettyName: String = if (doCut) "cut_spans" else "span_coverage"

  private lazy val mode: Int = grams.dataType match {
    case ArrayType(LongType, _) => 0
    case ArrayType(BinaryType, _) => 1
    case ArrayType(StringType, _) => 2
    case other => throw new IllegalArgumentException(
      s"span_fold: unsupported gram array type $other")
  }

  override def nullSafeEval(t: Any, g: Any): Any =
    SpanKernels.fold(t.asInstanceOf[UTF8String], g.asInstanceOf[ArrayData],
      k, mode, doCut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, g) => {
      s"""
        |${ev.value} = graft.functions.SpanKernels.fold($t, $g, $k, $mode, $doCut);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(text = newLeft, grams = newRight)
}
