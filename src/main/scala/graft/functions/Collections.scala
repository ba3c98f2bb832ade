package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Key canonicalization for the multiset element→count maps. Three element
  * classes break naive map keying (r16 ADVICE + the r17 edge sweep):
  *
  *  - floating NaN: Scala `==` on boxed doubles compares numerically, so
  *    NaN != NaN splits every NaN occurrence into its own key (and the
  *    emitted MapData carries duplicate NaN keys); -0.0 vs 0.0 is the
  *    mirror problem (numerically equal, different bits — whether they
  *    merge then depends on the map implementation);
  *  - BINARY: values are Array[Byte], whose equals/hashCode are IDENTITY
  *    in both Scala and Java maps — two equal payloads silently split;
  *  - containers (ARRAY/STRUCT): equality is representation-dependent
  *    (an UnsafeArrayData from a scan and a GenericArrayData from an
  *    `array(...)` constructor never compare equal), so counts split by
  *    which operator produced the value.
  *
  * The fix is one mechanism for all three: normalize floats the way
  * Spark's own NormalizeFloatingNumbers canonicalizes grouping keys
  * (every NaN → the canonical NaN, -0.0 → 0.0, recursively through
  * containers), then wrap the element in a single-column UnsafeRow — keyed
  * maps compare canonical BYTES, so equality is total and
  * representation-independent. Sound-equality scalars (integral types,
  * strings, decimals, date/time, booleans) skip the wrapper entirely —
  * the hot path is unchanged. */
private[functions] object MultisetKeys {

  /** Types whose values can't key a map directly (see above). */
  def needsCanonicalKey(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType | BinaryType => true
    case _: ArrayType | _: StructType => true
    case _ => false
  }

  private def hasFloat(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType => true
    case ArrayType(et, _) => hasFloat(et)
    case StructType(fs) => fs.exists(f => hasFloat(f.dataType))
    case _ => false
  }

  /** NaN → canonical NaN, -0.0 → 0.0, recursively; containers rebuild as
    * generic values (callers re-project to UnsafeRow, so the intermediate
    * representation never participates in equality). */
  def normalizeFloats(v: Any, dt: DataType): Any =
    if (v == null) null else dt match {
      case DoubleType =>
        val d = v.asInstanceOf[Double]
        if (d.isNaN) Double.NaN else if (d == 0.0d) 0.0d else d
      case FloatType =>
        val f = v.asInstanceOf[Float]
        if (f.isNaN) Float.NaN else if (f == 0.0f) 0.0f else f
      case ArrayType(et, _) if hasFloat(et) =>
        val a = v.asInstanceOf[ArrayData]
        val out = new Array[Any](a.numElements())
        var i = 0
        while (i < out.length) { out(i) = normalizeFloats(a.get(i, et), et); i += 1 }
        new GenericArrayData(out)
      case StructType(fs) if fs.exists(f => hasFloat(f.dataType)) =>
        val r = v.asInstanceOf[InternalRow]
        val out = new Array[Any](fs.length)
        var i = 0
        while (i < out.length) {
          out(i) = normalizeFloats(r.get(i, fs(i).dataType), fs(i).dataType)
          i += 1
        }
        new GenericInternalRow(out)
      case _ => v
    }
}

/** Flink COLLECT(x) → MULTISET backing kernel: one O(n) pass over the
  * collected array building element → count in first-seen order (reference
  * test/syntax-test.fsql:269). Replaces the O(distinct × n)
  * size(filter(...)) SQL-lambda rewrite — a high-cardinality group pays a
  * single hash pass here. Runs once per GROUP (on collect_list output), so
  * CodegenFallback costs nothing measurable; the per-row work stays in
  * codegen'd collect_list.
  */
case class MultisetFromArray(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"multiset_from_array expects ARRAY input, got ${other.sql}")
  }

  override def dataType: DataType =
    MapType(elemType, IntegerType, valueContainsNull = false)

  // canonical-byte keying for float/binary/container elements — see
  // [[MultisetKeys]]; sound-equality scalars key the map directly
  @transient private lazy val canonical = MultisetKeys.needsCanonicalKey(elemType)
  @transient private lazy val keyProj =
    UnsafeProjection.create(Array[DataType](elemType))

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val et = elemType
    val n = arr.numElements()
    val counts = new java.util.LinkedHashMap[Any, Integer](math.max(n, 8))
    var i = 0
    while (i < n) {
      val v = arr.get(i, et)
      val k =
        if (canonical) keyProj(InternalRow(MultisetKeys.normalizeFloats(v, et))).copy()
        else v
      val c = counts.get(k)
      counts.put(k, if (c == null) 1 else c + 1)
      i += 1
    }
    val keys = new Array[Any](counts.size)
    val vals = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) =
        if (canonical) e.getKey.asInstanceOf[UnsafeRow].get(0, et) else e.getKey
      vals(j) = e.getValue.intValue()
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def prettyName: String = "multiset_from_array"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Flink COLLECT(x) → MULTISET as a DIRECT one-pass aggregate: the buffer is
  * the element → count map itself, so memory is O(distinct values per
  * group), never O(rows). The pre-r16 rewrite
  * `multiset_from_array(collect_list(x))` buffered EVERY group element
  * before counting — at sf100 one GROUP BY o_orderstatus group holds ~50M
  * strings and the collect_list buffer OOM-killed the local JVM (found by
  * the r16 forced sweep; a bare count() had join-eliminated nothing here,
  * but never materialized the giant cells either). A multiset of a
  * low-cardinality column is exactly the case COLLECT exists for, and it
  * must not cost group-size memory.
  *
  * Map-side partial aggregation works as usual: partial buffers are
  * (element, count) maps, merge sums counts — the shuffle carries distinct
  * values per partition, not rows. Serialization mirrors Spark's own
  * Collect: length-prefixed UnsafeRow bytes per (element, count) entry.
  * First-seen ordering is per-partition (merge order is nondeterministic —
  * same as the collect_list path's effective behavior); map LOOKUPS, the
  * multiset access pattern, are order-independent. */
case class MultisetAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[scala.collection.mutable.LinkedHashMap[Any, Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def dataType: DataType =
    MapType(child.dataType, IntegerType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "multiset_agg"

  // MAP-typed elements refuse by name (collect_set's own restriction, for
  // the same reason: map equality/hashing is undefined — two equal maps
  // can differ in entry order, so counts would silently split). Arrays and
  // structs key on canonical UnsafeRow bytes (see [[MultisetKeys]]), so
  // equality is representation-independent across the update, merge and
  // deserialize paths.
  private def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case ArrayType(et, _) => containsMap(et)
    case StructType(fields) => fields.exists(f => containsMap(f.dataType))
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (containsMap(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "multiset_agg (COLLECT) does not support MAP-typed elements — map " +
          "equality is undefined for counting; collect distinct keys/values instead")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): scala.collection.mutable.LinkedHashMap[Any, Long] =
    scala.collection.mutable.LinkedHashMap.empty

  // Canonical-byte keying for float/binary/container elements (see
  // [[MultisetKeys]]): without it NaN occurrences split per-row (Scala ==
  // is numeric on boxed doubles), equal BINARY payloads split by identity,
  // and container counts split by producer representation (an update-path
  // GenericArrayData never equals a deserialize-path UnsafeArrayData).
  // Sound-equality scalars (ints, strings, decimals, …) keep the direct
  // copyValue fast path.
  @transient private lazy val canonical =
    MultisetKeys.needsCanonicalKey(child.dataType)
  @transient private lazy val keyProj =
    UnsafeProjection.create(Array[DataType](child.dataType))

  /** Map key for element value `v` (non-null). */
  private def toKey(v: Any): Any =
    if (canonical)
      keyProj(InternalRow(MultisetKeys.normalizeFloats(v, child.dataType))).copy()
    else InternalRow.copyValue(v)

  /** The element value back out of a map key. */
  private def fromKey(k: Any): Any =
    if (canonical) k.asInstanceOf[UnsafeRow].get(0, child.dataType) else k

  override def update(
      buf: scala.collection.mutable.LinkedHashMap[Any, Long],
      input: InternalRow): scala.collection.mutable.LinkedHashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy (inside toKey): unsafe-backed values (UTF8String over a reused
      // row buffer) mutate underneath a retained reference
      val k = toKey(v)
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
    }
    buf
  }

  override def merge(
      b1: scala.collection.mutable.LinkedHashMap[Any, Long],
      b2: scala.collection.mutable.LinkedHashMap[Any, Long]): scala.collection.mutable.LinkedHashMap[Any, Long] = {
    b2.foreach { case (k, c) => b1.update(k, b1.getOrElse(k, 0L) + c) }
    b1
  }

  override def eval(buf: scala.collection.mutable.LinkedHashMap[Any, Long]): Any = {
    val keys = new Array[Any](buf.size)
    val vals = new Array[Any](buf.size)
    var j = 0
    buf.foreach { case (k, c) =>
      // MULTISET per-element counts are 32-bit (Flink parity). The buffer
      // counts in Long; a bare toInt past 2^31 would WRAP silently — at
      // 100 TB one GROUP BY status element can exceed 2.1B rows, and this
      // engine's posture is named refusal, never silent corruption (r16
      // verdict finding).
      if (c > Int.MaxValue) throw new UnsupportedOperationException(
        s"multiset_agg (COLLECT) count overflow: one element occurs $c times " +
          "in a single group, beyond MULTISET's 32-bit per-element count " +
          "(Flink parity). Count elements at this scale with COUNT/GROUP BY " +
          "instead of COLLECT")
      keys(j) = fromKey(k); vals(j) = c.toInt; j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](child.dataType, LongType))

  override def serialize(buf: scala.collection.mutable.LinkedHashMap[Any, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    buf.foreach { case (k, c) =>
      val bytes = projection.apply(InternalRow(fromKey(k), c)).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.LinkedHashMap[Any, Long] = {
    val buf = scala.collection.mutable.LinkedHashMap.empty[Any, Long]
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val row = new UnsafeRow(2)
    while (in.available() > 0) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      row.pointTo(rowBytes, len)
      // toKey re-canonicalizes (idempotent — serialized values were already
      // normalized) so merge compares update-path and deserialize-path keys
      // over identical canonical bytes
      val k = toKey(row.get(0, child.dataType))
      buf.update(k, buf.getOrElse(k, 0L) + row.getLong(1))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MultisetAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MultisetAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): MultisetAgg =
    copy(child = c)
}
