package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** Group-key encoding shared by the stateful streaming operators
  * (MATCH_RECOGNIZE, event-time dedup): length-prefixed and null-tagged so
  * distinct multi-column keys -- or null vs the string "null" -- can never
  * collide in the string key space `groupByKey` hashes on. */
object StateKeys {
  def encoder(schema: StructType, keys: Seq[String]): Row => String = {
    val keyIdx = keys.map(schema.fieldIndex)
    r => keyIdx.map(i =>
      if (r.isNullAt(i)) "\u0000"
      else { val v = String.valueOf(r.get(i)); s"${v.length}:$v" }).mkString("\u0001")
  }
}
