package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.MatchRecognize
import graft.operators.MatchRecognize._

/** MATCH_RECOGNIZE in the correctness gate. The corpus pattern (A+ B with
  * disjoint predicates, F:467-482) is equivalent to a gaps-and-islands SQL
  * query — each maximal run of low-value events followed by a high-value
  * event is one match — so DuckDB can oracle the CEP operator exactly.
  */
object CepQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_cep_low_runs" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      MatchRecognize.matchRecognize(
        ev, Seq("user_id"), "event_id",
        defines = Seq(
          "A" -> (col("value") < 100),
          "B" -> (col("value") >= 100)),
        pattern = parsePattern("A+ B"),
        measures = Seq(
          Measure("start_event", "first", "A", "event_id"),
          Measure("first_low", "first", "A", "value"),
          Measure("avg_low", "avg", "A", "value"),
          Measure("n_low", "count", "A", "*"),
          Measure("high_val", "last", "B", "value")))
        .withColumn("avg_low", round(col("avg_low"), 6))
        .orderBy(col("user_id"), col("start_event"))
    },
  )

  val oracle: Map[String, String] = Map(
    // islands: A-rows grouped by the count of B-rows before them; each island
    // with >= 1 A matches the next B row (A+ B, SKIP PAST LAST ROW never
    // overlaps because A and B predicates are disjoint)
    "q_cep_low_runs" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |         CASE WHEN value >= 100 THEN 1 ELSE 0 END AS is_b
        |  FROM events),
        |x AS (
        |  SELECT *, SUM(is_b) OVER (PARTITION BY user_id ORDER BY event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bgrp
        |  FROM e),
        |a AS (
        |  SELECT user_id, bgrp,
        |         MIN(event_id) AS start_event,
        |         MIN_BY(value, event_id) AS first_low,
        |         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_low,
        |         COUNT(*) AS n_low
        |  FROM x WHERE is_b = 0 GROUP BY user_id, bgrp),
        |b AS (
        |  SELECT user_id, bgrp, value AS high_val FROM x WHERE is_b = 1)
        |SELECT a.user_id, a.start_event, a.first_low, a.avg_low, a.n_low, b.high_val
        |FROM a JOIN b ON a.user_id = b.user_id AND b.bgrp = a.bgrp + 1
        |ORDER BY a.user_id, a.start_event""".stripMargin,
  )
}
