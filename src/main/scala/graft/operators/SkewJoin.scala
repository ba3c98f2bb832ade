package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §7.5 rule: "skewed keys → salting
  * or AQE skew-join").
  *
  * AQE's skew-join handles skew detected at runtime from shuffle statistics;
  * salting is the planning-time tool when the hot keys are known or the join
  * must avoid a re-plan (e.g. inside a streaming foreachBatch). Mechanics:
  * the large side gets a deterministic salt in [0, n) derived from a
  * distributor column; the small side is exploded n× so every (key, salt)
  * bucket finds its match. The shuffle key becomes (key, salt) — a hot key's
  * rows spread over n reducers instead of one.
  *
  * Cost model: small side grows n× (bounded, it's the small side); large
  * side is unchanged; result is identical to the plain join for any n ≥ 1.
  */
object SkewJoin {

  /** Inner salted join of `big` (skewed) with `small` on bigKey == smallKey.
    * @param distributor a big-side column with high cardinality (row id,
    *                    payload hash) that spreads a hot key's rows. */
  def saltedInnerJoin(
      big: DataFrame, bigKey: String, distributor: String,
      small: DataFrame, smallKey: String,
      salts: Int = 8): DataFrame = {
    require(salts >= 1)
    // dataset-qualified references: identically-named key columns on the two
    // sides would otherwise resolve ambiguously
    val salted = big.withColumn("__salt", pmod(xxhash64(col(distributor)), lit(salts)).cast("int"))
    val exploded = small.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(exploded,
        salted("__salt") === exploded("__salt") && salted(bigKey) === exploded(smallKey))
      .drop(salted("__salt")).drop(exploded("__salt"))
  }
}
