package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

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

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val et = elemType
    val n = arr.numElements()
    val counts = new java.util.LinkedHashMap[Any, Integer](math.max(n, 8))
    var i = 0
    while (i < n) {
      val k = arr.get(i, et)
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
      keys(j) = e.getKey
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

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
  import org.apache.spark.sql.catalyst.expressions.UnsafeRow

  override def dataType: DataType =
    MapType(child.dataType, IntegerType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "multiset_agg"

  // MAP-typed elements refuse by name (collect_set's own restriction, for
  // the same reason: map equality/hashing is undefined — two equal maps
  // can differ in entry order, so counts would silently split). Arrays and
  // structs are fine: buffer keys and deserialized keys both flow through
  // copyValue/UnsafeRow.get, so equality stays representation-consistent.
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

  override def update(
      buf: scala.collection.mutable.LinkedHashMap[Any, Long],
      input: InternalRow): scala.collection.mutable.LinkedHashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy: unsafe-backed values (UTF8String over a reused row buffer)
      // mutate underneath a retained reference
      val k = InternalRow.copyValue(v)
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
    buf.foreach { case (k, c) => keys(j) = k; vals(j) = c.toInt; j += 1 }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](child.dataType, LongType))

  override def serialize(buf: scala.collection.mutable.LinkedHashMap[Any, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    buf.foreach { case (k, c) =>
      val bytes = projection.apply(InternalRow(k, c)).getBytes
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
      val k = InternalRow.copyValue(row.get(0, child.dataType))
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
