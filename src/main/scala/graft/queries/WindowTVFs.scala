package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Windows

/** Flink window-TVF surface in batch mode (SURVEY.md §2.8, corpus F:196-239):
  * TUMBLE (flagship, in Relational), HOP, SESSION, CUMULATE. The same
  * operators run under Structured Streaming with watermarks — covered by
  * StreamingSpec; batch mode is what the DuckDB oracle can check (TVF window
  * semantics are identical on bounded input).
  */
object WindowTVFs {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private def dsum(e: String) =
    expr(s"cast(sum(cast(($e) as decimal(18,4))) as double)")

  val queries: Map[String, Q] = Map(
    // HOP(TABLE events, DESCRIPTOR(ts), slide 5m, size 15m) — F:211-218
    "q_hop_agg" -> { (s, dir) =>
      Windows.hopAggregate(t(s, dir, "events"), "ts", slideSec = 300, sizeSec = 900,
          keys = Seq("event_type"),
          aggs = Seq(Windows.CumAgg.count("cnt"), Windows.CumAgg.dsum("value", "sum_value")))
        .select("window_start", "window_end", "event_type", "cnt", "sum_value")
        .orderBy(col("window_start"), col("event_type"))
    },

    // SESSION(TABLE events PARTITION BY user_id, DESCRIPTOR(ts), gap 30m) — F:221-229
    "q_session_agg" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(Windows.sessionWindow("ts", "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("cnt"), dsum("value").as("sum_value"))
        .select(
          col("session_window.start").as("window_start"),
          col("session_window.end").as("window_end"),
          col("user_id"), col("cnt"), col("sum_value"))
        .orderBy(col("user_id"), col("window_start"))
    },

    // CUMULATE(TABLE events, DESCRIPTOR(ts), step 15m, size 1h) — F:232-239
    "q_cumulate_agg" -> { (s, dir) =>
      Windows.cumulativeAgg(t(s, dir, "events"), "ts", stepSec = 900, sizeSec = 3600,
          keys = Seq("event_type"),
          aggs = Seq(Windows.CumAgg.count("cnt"), Windows.CumAgg.dsum("value", "sum_value")))
        .select("window_start", "window_end", "event_type", "cnt", "sum_value")
        .orderBy(col("window_start"), col("window_end"), col("event_type"))
    },
  )

  val oracle: Map[String, String] = Map(
    // each event lands in size/slide = 3 hop windows: starts at
    // bucket(ts,5m) - {0,5,10} minutes
    "q_hop_agg" ->
      """WITH h AS (
        |  SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
        |           - (k * INTERVAL '5 minutes') AS window_start,
        |         event_type, value
        |  FROM events, (SELECT UNNEST([0,1,2]) AS k))
        |SELECT window_start, window_start + INTERVAL '15 minutes' AS window_end,
        |       event_type, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM h GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin,

    // session windows = gaps-and-islands per user with a 30-minute gap;
    // window_end = last event + gap (Spark session_window semantics)
    "q_session_agg" ->
      """WITH x AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |         CASE WHEN CAST(ts AS TIMESTAMP)
        |                   - LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts)
        |                   >= INTERVAL '30 minutes'
        |              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |y AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM x)
        |SELECT MIN(ts) AS window_start,
        |       MAX(ts) + INTERVAL '30 minutes' AS window_end,
        |       user_id, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM y GROUP BY user_id, sid ORDER BY user_id, window_start""".stripMargin,

    // cumulate: row at offset o from the hour start is in windows ending
    // (floor(o/900)+1)*900 .. 3600 seconds
    "q_cumulate_agg" ->
      """WITH c AS (
        |  SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
        |         event_type, value,
        |         UNNEST(generate_series(
        |           ((epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)))) // 1000000 // 900 + 1) * 900,
        |           3600, 900)) AS end_sec
        |  FROM events)
        |SELECT window_start,
        |       window_start + end_sec * INTERVAL '1 second' AS window_end,
        |       event_type, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM c GROUP BY 1, 2, 3 ORDER BY window_start, window_end, event_type""".stripMargin,
  )
}
