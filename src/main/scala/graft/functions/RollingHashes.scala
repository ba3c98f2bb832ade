package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_hashes(text, k, seed)` — all k-byte-gram polynomial hashes of a
  * string in O(n), as ARRAY<BIGINT>.
  *
  * This is the shingle primitive behind document fingerprinting and
  * MinHash-family dedup (reference surface: the LLM-pipeline operators the
  * engine adds beyond Flink SQL): materializing n-k+1 substring objects to
  * hash them is O(n·k) and allocation-heavy, while the rolling recurrence
  * (h·B + c, drop the leading c·B^(k-1) term) is O(n) with zero allocation
  * besides the output. Each window hash is finalized with murmur's fmix64
  * xor-mixed with `seed`, so independent hash families (MinHash permutations)
  * come from the same single pass.
  *
  * Implemented as a native Catalyst expression with `doGenCode` so it stays
  * inside whole-stage codegen (a Scala UDF here would box every row and break
  * the codegen stage in the dedup hot path).
  */
case class RollingHashes(str: Expression, k: Expression, seed: Expression,
    base: Long = RollingHashes.B)
    extends TernaryExpression {

  override def first: Expression = str
  override def second: Expression = k
  override def third: Expression = seed

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hashes"

  override def nullSafeEval(s: Any, kk: Any, sd: Any): Any = {
    val out = RollingHashes.compute(
      s.asInstanceOf[UTF8String].getBytes, kk.asInstanceOf[Int],
      sd.asInstanceOf[Long], base)
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, kk, sd) => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val res = ctx.freshName("res")
      val h = ctx.freshName("h")
      val bk = ctx.freshName("bk")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      s"""
        |byte[] $bytes = $s.getBytes();
        |int $n = $bytes.length - $kk + 1;
        |if ($n < 1) $n = 0;
        |long[] $res = new long[$n];
        |long $bk = 1L;
        |for (int $i = 1; $i < $kk; $i++) $bk *= ${base}L;
        |long $h = 0L;
        |for (int $i = 0; $i < $bytes.length; $i++) {
        |  if ($i >= $kk) $h -= $bk * (long)($bytes[$i - $kk] & 0xFF);
        |  $h = $h * ${base}L + (long)($bytes[$i] & 0xFF);
        |  if ($i >= $kk - 1) {
        |    long $m = $h ^ $sd;
        |    $m ^= $m >>> 33; $m *= 0xff51afd7ed558ccdL;
        |    $m ^= $m >>> 33; $m *= 0xc4ceb9fe1a85ec53L;
        |    $m ^= $m >>> 33;
        |    $res[$i - $kk + 1] = $m;
        |  }
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($res);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(str = newFirst, k = newSecond, seed = newThird)
}

/** `rolling_hashes128(text, k[, distinct])` — the 128-bit gram identity as
  * ARRAY<BINARY(16)>: both independent polynomial families (bases B and B2)
  * computed in ONE O(n) pass, each window emitted as the 16-byte
  * concatenation of the two fmix64-finalized hashes.
  *
  * Exists because the composable encodings are quadratic or allocation
  * bombs on the hot path: `arrays_zip` of two long arrays materializes a
  * struct PER GRAM and `array_distinct` over struct arrays falls off
  * Spark's hash-set fast path into pairwise O(n^2) comparisons (measured:
  * the pair-of-structs cut identity was SLOWER than shuffling 20-char
  * substrings). BINARY elements keep the shuffle key a flat 16 bytes
  * whatever `k` is — but `array_distinct` over ARRAY<BINARY> is ITSELF the
  * pairwise-quadratic path (BinaryType fails Spark's
  * `typeWithProperEquals`, so ArrayDistinct linear-scans prior elements per
  * gram: ~2M equality probes per 2 KB document, measured dominating the
  * kernel cut gate at 3.2 s vs 1.4 s for the substring identity in r19).
  * `distinct = true` therefore dedups IN the pass — open addressing on the
  * two pre-finalized longs, zero per-gram wrapper objects, first-occurrence
  * order (exactly `array_distinct`'s order; PipelineSpec pins equality). */
case class RollingHashes128(str: Expression, k: Expression,
    distinct: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = str
  override def right: Expression = k

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "rolling_hashes128"

  override def nullSafeEval(s: Any, kk: Any): Any = {
    val bytes = s.asInstanceOf[UTF8String].getBytes
    val out =
      if (distinct) RollingHashes.compute128Distinct(bytes, kk.asInstanceOf[Int])
      else RollingHashes.compute128(bytes, kk.asInstanceOf[Int])
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, kk) => {
      val bytes = ctx.freshName("bytes")
      val fn = if (distinct) "compute128Distinct" else "compute128"
      s"""
        |byte[] $bytes = $s.getBytes();
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        |  (Object[]) graft.functions.RollingHashes.$fn($bytes, $kk));
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(str = newLeft, k = newRight)
}

object RollingHashes {
  /** Polynomial base; odd and large enough to diffuse bytes before fmix64. */
  final val B: Long = 1000003L
  /** Second, independent polynomial base (FNV-1a's 64-bit prime). The
    * `seed` argument only post-mixes the SAME polynomial hash, so two seeds
    * share every collision; a destructive consumer (substring-dedup CUT)
    * needs a genuinely independent second family — a different multiplier
    * collides on a disjoint set, making the (B, B2) pair an effectively
    * 128-bit gram identity. */
  final val B2: Long = 0x100000001b3L

  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Interpreted twin of the generated code (must stay in lockstep). */
  def compute(bytes: Array[Byte], k: Int, seed: Long, base: Long = B): Array[Long] = {
    val n = math.max(bytes.length - k + 1, 0)
    val res = new Array[Long](n)
    var bk = 1L
    var i = 1
    while (i < k) { bk *= base; i += 1 }
    var h = 0L
    i = 0
    while (i < bytes.length) {
      if (i >= k) h -= bk * (bytes(i - k) & 0xff).toLong
      h = h * base + (bytes(i) & 0xff).toLong
      if (i >= k - 1) res(i - k + 1) = fmix64(h ^ seed)
      i += 1
    }
    res
  }

  /** Interpreted + codegen-shared body for the 128-bit identity: both
    * polynomial families in one pass, one 16-byte array per window. */
  def compute128(bytes: Array[Byte], k: Int): Array[Array[Byte]] = {
    val n = math.max(bytes.length - k + 1, 0)
    val res = new Array[Array[Byte]](n)
    var bk1 = 1L; var bk2 = 1L
    var i = 1
    while (i < k) { bk1 *= B; bk2 *= B2; i += 1 }
    var h1 = 0L; var h2 = 0L
    i = 0
    while (i < bytes.length) {
      val c = (bytes(i) & 0xff).toLong
      if (i >= k) {
        val d = (bytes(i - k) & 0xff).toLong
        h1 -= bk1 * d; h2 -= bk2 * d
      }
      h1 = h1 * B + c; h2 = h2 * B2 + c
      if (i >= k - 1) {
        val a = fmix64(h1); val b = fmix64(h2)
        val out = new Array[Byte](16)
        var j = 0
        while (j < 8) {
          out(j) = (a >>> (56 - 8 * j)).toByte
          out(8 + j) = (b >>> (56 - 8 * j)).toByte
          j += 1
        }
        res(i - k + 1) = out
      }
      i += 1
    }
    res
  }

  /** [[compute128]] with in-pass dedup on the (h1, h2) pair — open
    * addressing over the pre-finalized longs (no per-gram wrapper objects),
    * first-occurrence order. Byte output only materializes for KEPT grams. */
  def compute128Distinct(bytes: Array[Byte], k: Int): Array[Array[Byte]] = {
    val n = math.max(bytes.length - k + 1, 0)
    if (n == 0) return new Array[Array[Byte]](0)
    var cap = 8
    while (cap < n * 2) cap <<= 1
    val t1 = new Array[Long](cap)
    val t2 = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val mask = cap - 1
    val res = new Array[Array[Byte]](n)
    var kept = 0
    var bk1 = 1L; var bk2 = 1L
    var i = 1
    while (i < k) { bk1 *= B; bk2 *= B2; i += 1 }
    var h1 = 0L; var h2 = 0L
    i = 0
    while (i < bytes.length) {
      val c = (bytes(i) & 0xff).toLong
      if (i >= k) {
        val d = (bytes(i - k) & 0xff).toLong
        h1 -= bk1 * d; h2 -= bk2 * d
      }
      h1 = h1 * B + c; h2 = h2 * B2 + c
      if (i >= k - 1) {
        val a = fmix64(h1); val b = fmix64(h2)
        var idx = (fmix64(a ^ (b * 0x9e3779b97f4a7c15L)) & mask).toInt
        while (used(idx) && !(t1(idx) == a && t2(idx) == b)) idx = (idx + 1) & mask
        if (!used(idx)) {
          used(idx) = true; t1(idx) = a; t2(idx) = b
          val out = new Array[Byte](16)
          var j = 0
          while (j < 8) {
            out(j) = (a >>> (56 - 8 * j)).toByte
            out(8 + j) = (b >>> (56 - 8 * j)).toByte
            j += 1
          }
          res(kept) = out
          kept += 1
        }
      }
      i += 1
    }
    if (kept == n) res else java.util.Arrays.copyOf(res, kept)
  }

  /** Column-API entry point. */
  def rolling_hashes(str: Column, k: Int, seed: Long, base: Long = B): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.Shims
    Shims.column(RollingHashes(Shims.expression(str), Literal(k), Literal(seed), base))
  }

  /** Column-API entry point for the 128-bit identity. */
  def rolling_hashes128(str: Column, k: Int, distinct: Boolean = false): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.Shims
    Shims.column(RollingHashes128(Shims.expression(str), Literal(k), distinct))
  }
}
