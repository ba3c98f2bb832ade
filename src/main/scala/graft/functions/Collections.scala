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
