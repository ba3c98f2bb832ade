package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** OVER-window (analytic) surface (SURVEY.md §2.7, corpus F:242-253):
  * ranking, LAG/LEAD, running/frame aggregates, NTILE/PERCENT_RANK/CUME_DIST,
  * FIRST_VALUE/LAST_VALUE/NTH_VALUE with explicit frames.
  *
  * Every window ORDER BY ends in a unique key so frame contents are total-
  * ordered — without that, RANGE/ROWS frames are nondeterministic across
  * engines (and across Spark partitionings).
  */
object OverWindows {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val queries: Map[String, Q] = Map(
    // RANK / DENSE_RANK over int-valued quantity (real ties)
    "q_over_rank" -> { (s, dir) =>
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      t(s, dir, "lineitem").filter(col("l_orderkey") < 200)
        .select(
          col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          rank().over(w).cast("bigint").as("rnk"),
          dense_rank().over(w).cast("bigint").as("drnk"),
          row_number().over(w).cast("bigint").as("rn"))
        .orderBy(col("l_returnflag"), col("rn"))
    },

    // LAG / LEAD with defaults: per-user event deltas
    "q_over_lag_lead" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      t(s, dir, "events")
        .select(
          col("user_id"), col("event_id"), col("event_type"),
          lag(col("event_type"), 1, "none").over(w).as("prev_type"),
          lead(col("event_type"), 1, "none").over(w).as("next_type"),
          lag(col("value"), 2).over(w).as("prev2_value"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // running aggregates: ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    "q_over_running_sum" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders").filter(col("o_custkey") < 100)
        .select(
          col("o_custkey"), col("o_orderkey"),
          expr("cast(sum(cast(o_totalprice as decimal(18,4))) over " +
            "(partition by o_custkey order by o_orderkey " +
            "rows between unbounded preceding and current row) as double)").as("running_total"),
          count(lit(1)).over(w).as("running_n"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // moving window: ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
    "q_over_moving_avg" -> { (s, dir) =>
      t(s, dir, "events").filter(col("user_id") < 50)
        .select(
          col("user_id"), col("event_id"),
          expr("cast(sum(cast(value as decimal(18,4))) over " +
            "(partition by user_id order by ts, event_id " +
            "rows between 2 preceding and current row) as double)").as("mv_sum"),
          expr("count(*) over (partition by user_id order by ts, event_id " +
            "rows between 2 preceding and current row)").as("mv_n"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // NTILE / PERCENT_RANK / CUME_DIST
    "q_over_distribution" -> { (s, dir) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      t(s, dir, "customer")
        .select(
          col("c_mktsegment"), col("c_custkey"),
          ntile(4).over(w).cast("bigint").as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    },

    // FIRST_VALUE / LAST_VALUE / NTH_VALUE with the full-partition frame
    // (corpus F:251-252 writes the explicit frame for LAST_VALUE — same here)
    "q_over_first_last_nth" -> { (s, dir) =>
      val base = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey").asc)
      val full = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders").filter(col("o_custkey") < 100)
        .select(
          col("o_custkey"), col("o_orderkey"),
          first(col("o_orderstatus")).over(base).as("first_status"),
          last(col("o_orderstatus")).over(full).as("last_status"),
          nth_value(col("o_orderstatus"), 2).over(full).as("second_status"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // RANGE frame over numeric key: count of orders within ±500 of this price
    "q_over_range_frame" -> { (s, dir) =>
      t(s, dir, "orders").filter(col("o_custkey") < 50)
        .select(
          col("o_orderkey"), col("o_totalprice"),
          expr("count(*) over (order by o_totalprice " +
            "range between 500 preceding and 500 following)").as("n_near"))
        .orderBy(col("o_orderkey"))
    },

    // GROUPS frame (G:399 — no Spark counterpart): GROUPS BETWEEN n PRECEDING
    // AND m FOLLOWING over (part, ord) ≡ RANGE of the same bounds over the
    // dense_rank of ord — peer groups collapse to consecutive rank values, so
    // the range frame walks whole tie-groups exactly like a GROUPS frame
    "q_over_groups_frame" -> { (s, dir) =>
      val wRank = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      val wFrame = Window.partitionBy(col("l_returnflag")).orderBy(col("__grp"))
        .rangeBetween(-1, 1)
      t(s, dir, "lineitem").filter(col("l_orderkey") < 200)
        .withColumn("__grp", dense_rank().over(wRank))
        .select(
          col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          sum(col("l_quantity").cast("decimal(18,4)")).over(wFrame)
            .cast("double").as("grp_sum"))
        .orderBy(col("l_returnflag"), col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    },
  )

  val oracle: Map[String, String] = Map(
    "q_over_rank" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |       RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk, ROW_NUMBER() OVER w AS rn
        |FROM lineitem WHERE l_orderkey < 200
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity DESC, l_orderkey ASC, l_linenumber ASC)
        |ORDER BY l_returnflag, rn""".stripMargin,

    "q_over_lag_lead" ->
      """SELECT user_id, event_id, event_type,
        |       LAG(event_type, 1, 'none') OVER w AS prev_type,
        |       LEAD(event_type, 1, 'none') OVER w AS next_type,
        |       LAG(value, 2) OVER w AS prev2_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_over_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER
        |         (PARTITION BY o_custkey ORDER BY o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_over_moving_avg" ->
      """SELECT user_id, event_id,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mv_sum,
        |       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mv_n
        |FROM events WHERE user_id < 50
        |ORDER BY user_id, event_id""".stripMargin,

    "q_over_distribution" ->
      """SELECT c_mktsegment, c_custkey,
        |       NTILE(4) OVER w AS quartile,
        |       ROUND(PERCENT_RANK() OVER w, 6) AS pr,
        |       ROUND(CUME_DIST() OVER w, 6) AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,

    "q_over_first_last_nth" ->
      """SELECT o_custkey, o_orderkey,
        |       FIRST_VALUE(o_orderstatus) OVER w AS first_status,
        |       LAST_VALUE(o_orderstatus) OVER wf AS last_status,
        |       NTH_VALUE(o_orderstatus, 2) OVER wf AS second_status
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey),
        |       wf AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_over_range_frame" ->
      """SELECT o_orderkey, o_totalprice,
        |       COUNT(*) OVER (ORDER BY o_totalprice
        |         RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING) AS n_near
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_orderkey""".stripMargin,

    // DuckDB lacks GROUPS frames too — the oracle derives them from first
    // principles: per-peer-group sums, a ROWS window over the distinct
    // values, joined back to the rows (exact decimal math throughout)
    "q_over_groups_frame" ->
      """WITH g AS (
        |  SELECT l_returnflag, l_quantity,
        |         SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qsum
        |  FROM lineitem WHERE l_orderkey < 200 GROUP BY l_returnflag, l_quantity),
        |w AS (
        |  SELECT l_returnflag, l_quantity,
        |         CAST(SUM(qsum) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
        |           ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS grp_sum
        |  FROM g)
        |SELECT l.l_returnflag, l.l_orderkey, l.l_linenumber, l.l_quantity, w.grp_sum
        |FROM lineitem l JOIN w ON l.l_returnflag = w.l_returnflag AND l.l_quantity = w.l_quantity
        |WHERE l.l_orderkey < 200
        |ORDER BY l.l_returnflag, l.l_quantity, l.l_orderkey, l.l_linenumber""".stripMargin,
  )
}
