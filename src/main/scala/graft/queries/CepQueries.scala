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

    // PREV navigation through the SQL form: any anchor row, then a maximal
    // strictly-rising run (B.value > PREV(B.value)) — the gaps-and-islands
    // dual is exact, so DuckDB oracles the lag-based DEFINE path
    "q_cep_rising" -> { (s, dir) =>
      Tables.load(s, dir, "events").createOrReplaceTempView("cep_events")
      MatchRecognize.sql(s,
        """SELECT * FROM cep_events MATCH_RECOGNIZE (
          |  PARTITION BY user_id ORDER BY event_id
          |  MEASURES FIRST(A.event_id) AS start_event,
          |           FIRST(A.value) AS base_val,
          |           LAST(B.value) AS peak_val,
          |           COUNT(B.*) AS n_rise
          |  ONE ROW PER MATCH
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (A B+)
          |  DEFINE B AS B.value > PREV(B.value)
          |)""".stripMargin)
        .orderBy(col("user_id"), col("start_event"))
    },

    // alternation group (A|B)+ C: runs of low values split by sub-threshold
    // class, closed by a high event — same islands as q_cep_low_runs but the
    // matcher must route each row to the first matching alternative
    "q_cep_alternation" -> { (s, dir) =>
      Tables.load(s, dir, "events").createOrReplaceTempView("cep_events")
      MatchRecognize.sql(s,
        """SELECT * FROM cep_events MATCH_RECOGNIZE (
          |  PARTITION BY user_id ORDER BY event_id
          |  MEASURES COUNT(A.*) AS n_verylow,
          |           COUNT(B.*) AS n_low,
          |           LAST(C.value) AS high_val,
          |           MATCH_NUMBER() AS match_no
          |  ONE ROW PER MATCH
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN ((A|B)+ C)
          |  DEFINE A AS A.value < 50,
          |         B AS B.value >= 50 AND B.value < 100,
          |         C AS C.value >= 100
          |)""".stripMargin)
        .orderBy(col("user_id"), col("match_no"))
    },
    // FIRST/LAST navigation inside DEFINE (G:363-367): the rising-run pattern
    // re-expressed through match-state navigation — LAST(B.value, 1) is the
    // previous row mapped to B, and the run's first B falls back to the
    // anchor via FIRST(A.value). Semantically identical to q_cep_rising's
    // PREV formulation, so the same gaps-and-islands oracle is exact.
    "q_cep_define_nav" -> { (s, dir) =>
      Tables.load(s, dir, "events").createOrReplaceTempView("cep_events")
      MatchRecognize.sql(s,
        """SELECT * FROM cep_events MATCH_RECOGNIZE (
          |  PARTITION BY user_id ORDER BY event_id
          |  MEASURES FIRST(A.event_id) AS start_event,
          |           FIRST(A.value) AS base_val,
          |           LAST(B.value) AS peak_val,
          |           COUNT(B.*) AS n_rise
          |  ONE ROW PER MATCH
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (A B+)
          |  DEFINE B AS B.value > COALESCE(LAST(B.value, 1), FIRST(A.value))
          |)""".stripMargin)
        .orderBy(col("user_id"), col("start_event"))
    },

    // AFTER MATCH SKIP TO NEXT ROW: overlapping matches — every consecutive
    // low-low pair is its own match, and MATCH_NUMBER counts all of them
    // (PAST LAST ROW would only yield floor(run/2) disjoint pairs)
    "q_cep_skip_next" -> { (s, dir) =>
      Tables.load(s, dir, "events").createOrReplaceTempView("cep_events")
      MatchRecognize.sql(s,
        """SELECT * FROM cep_events MATCH_RECOGNIZE (
          |  PARTITION BY user_id ORDER BY event_id
          |  MEASURES FIRST(A.event_id) AS anchor_event,
          |           FIRST(A.value) AS a_val,
          |           LAST(B.value) AS b_val,
          |           MATCH_NUMBER() AS match_no
          |  ONE ROW PER MATCH
          |  AFTER MATCH SKIP TO NEXT ROW
          |  PATTERN (A B)
          |  DEFINE A AS A.value < 100,
          |         B AS B.value < 100
          |)""".stripMargin)
        .orderBy(col("user_id"), col("anchor_event"))
    },
  )

  val oracle: Map[String, String] = Map(
    "q_cep_skip_next" ->
      """WITH w AS (
        |  SELECT user_id, event_id, value,
        |         lead(value) OVER (PARTITION BY user_id ORDER BY event_id) AS nv
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id AS anchor_event, value AS a_val, nv AS b_val,
        |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS match_no
        |  FROM w WHERE value < 100 AND nv < 100)
        |SELECT user_id, anchor_event, a_val, b_val, match_no FROM m
        |ORDER BY user_id, anchor_event""".stripMargin,

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

    // rising runs: islands keyed by the running count of "break" rows (a row
    // not strictly above its predecessor starts a new island); every island
    // of size >= 2 is anchor + rising stretch — exactly A B+ with
    // B AS value > PREV(value) under SKIP PAST LAST ROW
    "q_cep_rising" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |         CASE WHEN value > lag(value) OVER (PARTITION BY user_id ORDER BY event_id)
        |              THEN 0 ELSE 1 END AS brk
        |  FROM events),
        |g AS (
        |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM e)
        |SELECT user_id,
        |       MIN(event_id) AS start_event,
        |       MIN_BY(value, event_id) AS base_val,
        |       MAX_BY(value, event_id) AS peak_val,
        |       COUNT(*) - 1 AS n_rise
        |FROM g GROUP BY user_id, grp HAVING COUNT(*) >= 2
        |ORDER BY user_id, start_event""".stripMargin,

    // identical result set to q_cep_rising (same islands, navigated via
    // FIRST/LAST instead of PREV)
    "q_cep_define_nav" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |         CASE WHEN value > lag(value) OVER (PARTITION BY user_id ORDER BY event_id)
        |              THEN 0 ELSE 1 END AS brk
        |  FROM events),
        |g AS (
        |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM e)
        |SELECT user_id,
        |       MIN(event_id) AS start_event,
        |       MIN_BY(value, event_id) AS base_val,
        |       MAX_BY(value, event_id) AS peak_val,
        |       COUNT(*) - 1 AS n_rise
        |FROM g GROUP BY user_id, grp HAVING COUNT(*) >= 2
        |ORDER BY user_id, start_event""".stripMargin,

    // (A|B)+ C islands with per-class counts; match_no = island ordinal per
    // user (our MATCH_NUMBER() numbering)
    "q_cep_alternation" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |         CASE WHEN value >= 100 THEN 1 ELSE 0 END AS is_c
        |  FROM events),
        |x AS (
        |  SELECT *, SUM(is_c) OVER (PARTITION BY user_id ORDER BY event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cgrp
        |  FROM e),
        |l AS (
        |  SELECT user_id, cgrp,
        |         CAST(SUM(CASE WHEN value < 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_verylow,
        |         CAST(SUM(CASE WHEN value >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_low
        |  FROM x WHERE is_c = 0 GROUP BY user_id, cgrp),
        |c AS (SELECT user_id, cgrp, value AS high_val FROM x WHERE is_c = 1)
        |SELECT l.user_id, l.n_verylow, l.n_low, c.high_val,
        |       ROW_NUMBER() OVER (PARTITION BY l.user_id ORDER BY l.cgrp) AS match_no
        |FROM l JOIN c ON l.user_id = c.user_id AND c.cgrp = l.cgrp + 1
        |ORDER BY l.user_id, match_no""".stripMargin,
  )
}
