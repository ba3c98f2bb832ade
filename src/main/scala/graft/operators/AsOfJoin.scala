package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / as-of join: for each left row, the latest right row whose
  * timestamp is <= the left timestamp, per key — Flink's
  * `JOIN t FOR SYSTEM_TIME AS OF l.ts` (reference test/syntax-test.fsql:159-162,
  * grammar syntaxes/flink.tmLanguage.json:359).
  *
  * Implementation is the scalable union-and-carry-forward pattern rather than a
  * join-then-reduce: tag both inputs, union, and run `last(value, ignoreNulls)`
  * over (key ORDER BY ts, side) — one shuffle on the key, one sort, zero
  * row-explosion. A join-based formulation (l JOIN r ON key AND r.ts <= l.ts,
  * then max) multiplies rows by the right-side history length and dies at
  * 100 TB; this stays linear and is exactly how a 1000-executor cluster wants
  * it partitioned.
  */
object AsOfJoin {

  /** Left as-of join.
    * @param rightValueCols right-side payload columns to carry onto left rows
    *                       (must not collide with left column names).
    */
  def leftAsOf(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      rightValueCols: Seq[String]): DataFrame = {

    val leftCols = left.columns.toSeq
    // side 0 = right (sorts before left at equal ts, so a right row at exactly
    // l.ts is visible — ASOF `>=` semantics, matching DuckDB's ASOF JOIN).
    // Callers must ensure right is unique per (key, ts): equal-ts right rows
    // would otherwise tie nondeterministically.
    val rCols: Seq[Column] =
      Seq(col(key), col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightValueCols.map(col)
    val lCols: Seq[Column] =
      Seq(col(key), col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftCols.filterNot(_ == key).map(col) ++
        rightValueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))
    val r = right.select(rCols: _*)
    val l = left.select(lCols: _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // carry the LATEST right row even when its payload is legitimately NULL:
    // wrap payloads in a struct that is non-null exactly for right rows, so
    // last(ignoreNulls) tracks row recency, not payload nullability
    val carried = rightValueCols.foldLeft(r.unionByName(l)) { (df, c) =>
      df.withColumn(c,
        last(when(col("__side") === 0, struct(col(c).as("v"))), ignoreNulls = true)
          .over(w).getField("v"))
    }
    carried.filter(col("__side") === 1).drop("__side", "__ts")
  }
}
