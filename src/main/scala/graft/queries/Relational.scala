package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Windows

/** Core relational + windowed-aggregation queries (SURVEY.md §2.4-2.8).
  *
  * Determinism contract with the DuckDB oracle (Verify.scala / driver t2):
  *  - every query ends in a total ORDER BY (driver may hash in row order);
  *  - double aggregates go through exact DECIMAL sums then a final cast to
  *    DOUBLE — bit-identical across engines (see `dsum`); per-row double
  *    arithmetic is IEEE-identical in Spark and DuckDB;
  *  - column names are aliased identically on both sides.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact decimal sum of a double expression, surfaced as DOUBLE.
    * CAST(double → DECIMAL(s≥1)) can never hit a rounding-mode tie (a tie
    * would need (2k+1)/(2*10^s) to be a dyadic rational — impossible), so
    * HALF_UP (Spark) vs HALF_EVEN agree; the decimal sum is exact; the final
    * cast to double is round-to-nearest in both engines. */
  private def dsum(e: String): org.apache.spark.sql.Column =
    expr(s"cast(sum(cast(($e) as decimal(18,4))) as double)")

  // ---- flagship: the reference's hello-world shape (snippets S:45-56) ----
  // SELECT window_start, window_end, event_type, COUNT(*) FROM
  //   TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '10' MINUTES)) GROUP BY ...
  def flagship(s: SparkSession, dir: String): DataFrame =
    Windows.tumble(t(s, dir, "events"), "ts", "10 minutes")
      .groupBy(col("window_start"), col("window_end"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum("value").as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  val queries: Map[String, Q] = Map(
    "q_tumble_agg" -> ((s, dir) => flagship(s, dir)),

    // TPC-H Q1 shape: wide aggregate over lineitem (SURVEY §2.6)
    "q_agg_pricing_summary" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum("l_quantity").as("sum_qty"),
          dsum("l_extendedprice").as("sum_base_price"),
          dsum("l_extendedprice * (1 - l_discount)").as("sum_disc_price"),
          // 8-decimal sum reaches 17 significant digits at sf0.1 — beyond
          // double precision, and decimal→double conversion differs across
          // engines at that width. Emit the exact decimal as text instead.
          expr("cast(cast(sum(cast(l_extendedprice * (1 - l_discount) * (1 + l_tax) as decimal(18,8))) as decimal(30,8)) as string)").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // inner join chain w/ broadcast dims (SURVEY §2.5)
    "q_join_orders_nation" -> { (s, dir) =>
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("revenue"))
        .orderBy(col("n_name"))
    },

    // OVER window: top-3 orders per customer (SURVEY §2.7)
    "q_window_topn" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy(col("o_custkey"), col("rn"))
    },

    // predicate surface: BETWEEN / IN / LIKE / boolean ops (SURVEY §2.4)
    "q_filter_predicates" -> { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderstatus").isin("O", "F")
          && col("o_totalprice").between(1000, 5000)
          && col("o_orderpriority").like("3%"))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy(col("o_orderkey"))
    },

    // JSON_VALUE over events.props (SURVEY §2.10 JSON)
    "q_json_extract" -> { (s, dir) =>
      t(s, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .filter(col("k") > 50)
        .orderBy(col("event_id"))
    },
  )

  val oracle: Map[String, String] = Map(
    "q_tumble_agg" ->
      """SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
        |       time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP)) + INTERVAL '10 minutes' AS window_end,
        |       event_type, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin,

    "q_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,8))) AS DECIMAL(30,8)) AS VARCHAR) AS sum_charge,
        |       COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_orders_nation" ->
      """SELECT n_name, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |            JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_filter_predicates" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus IN ('O','F') AND o_totalprice BETWEEN 1000 AND 5000
        |  AND o_orderpriority LIKE '3%'
        |ORDER BY o_orderkey""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        |ORDER BY event_id""".stripMargin,
  )
}
