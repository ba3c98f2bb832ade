package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.AsOfJoin

/** Join surface (SURVEY.md §2.5): outer/cross/semi/anti/theta joins, the
  * stream-style interval join, the temporal as-of join, and LATERAL UNNEST.
  *
  * Scale notes: dimension sides (nation, region, customer at these SFs) are
  * explicitly `broadcast()`; the interval join is an equi-join on user_id with
  * range predicates (sort-merge + post-filter — no cross product); the as-of
  * join is the linear union-and-carry-forward operator (see AsOfJoin.scala).
  */
object Joins {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val queries: Map[String, Q] = Map(
    // LEFT OUTER: customers with their order counts, keeping orderless customers
    "q_join_left_outer" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    },

    // FULL OUTER on disjoint-ish key ranges (suppliers vs customers by nation)
    "q_join_full_outer" -> { (s, dir) =>
      val sup = t(s, dir, "supplier").groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_suppliers"))
      val cust = t(s, dir, "customer").groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"))
      sup.join(cust, col("s_nationkey") === col("c_nationkey"), "full_outer")
        .select(
          coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"))
        .orderBy(col("nationkey"))
    },

    // RIGHT OUTER: the mirrored shape — orders on the left, every customer
    // kept from the right (native Spark right_outer; dialect passthrough)
    "q_join_right_outer" -> { (s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "right_outer")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          count(when(col("o_totalprice") > 3000, true)).as("n_large"))
        .orderBy(col("c_custkey"))
    },

    // CROSS JOIN (tiny dims only — region × nation)
    "q_join_cross" -> { (s, dir) =>
      t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // LEFT SEMI (EXISTS): customers that have at least one high-value order
    "q_join_semi" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 4000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // LEFT ANTI (NOT EXISTS): parts never ordered
    "q_join_anti" -> { (s, dir) =>
      t(s, dir, "part")
        .join(t(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_name"))
        .orderBy(col("p_partkey"))
    },

    // theta / non-equi: parts priced above their brand's average (self-derived bound)
    "q_join_theta" -> { (s, dir) =>
      val p = t(s, dir, "part")
      val brandAvg = p.groupBy(col("p_brand").as("b_brand"))
        .agg(expr("cast(sum(cast(p_retailprice as decimal(18,4))) as double) / count(*)").as("b_avg"))
      p.join(broadcast(brandAvg),
          col("p_brand") === col("b_brand") && col("p_retailprice") > col("b_avg"))
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
        .orderBy(col("p_partkey"))
    },

    // interval join (stream-stream with time bounds, SURVEY §2.5):
    // purchases within 30 minutes after a signup by the same user
    "q_join_interval" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val a = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("signup_ts"))
      val b = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("b_user_id"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      a.join(b,
          col("user_id") === col("b_user_id")
            && col("purchase_ts") > col("signup_ts")
            && col("purchase_ts") <= col("signup_ts") + expr("INTERVAL 30 MINUTES"))
        .select(col("user_id"), col("signup_id"), col("purchase_id"))
        .orderBy(col("user_id"), col("signup_id"), col("purchase_id"))
    },

    // temporal as-of join (FOR SYSTEM_TIME AS OF): latest signup at or before
    // each purchase, per user
    "q_join_asof" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      // right side unique per (user_id, ts): keep max event_id on ties
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts").as("signup_ts"))
        .agg(max(col("event_id")).as("signup_id"))
        .select(col("user_id"), col("signup_ts"), col("signup_id"))
      AsOfJoin.leftAsOf(purchases, signups, "user_id", "ts", "signup_ts", Seq("signup_id"))
        .select(col("user_id"), col("event_id").as("purchase_id"), col("signup_id"))
        .orderBy(col("user_id"), col("purchase_id"))
    },

    // SQL-form temporal join (F:159-162): same semantics as q_join_asof but
    // entering through the `FOR SYSTEM_TIME AS OF` clause router
    "q_flink_asof_sql" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
        .createOrReplaceTempView("asof_purchases")
      ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts").as("signup_ts"))
        .agg(max(col("event_id")).as("signup_id"))
        .createOrReplaceTempView("asof_signups")
      AsOfJoin.sql(s,
        """SELECT p.user_id, p.event_id AS purchase_id, s.signup_id
          |FROM asof_purchases AS p
          |LEFT JOIN asof_signups FOR SYSTEM_TIME AS OF p.ts AS s
          |ON p.user_id = s.user_id
          |ORDER BY p.user_id, purchase_id""".stripMargin)
        .getOrElse(sys.error("temporal SQL route did not match"))
    },

    // CROSS JOIN LATERAL UNNEST (F:164-167): explode document tokens
    "q_join_lateral_unnest" -> { (s, dir) =>
      t(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("token"))
    },
  )

  val oracle: Map[String, String] = Map(
    "q_join_left_outer" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "q_join_full_outer" ->
      """WITH s AS (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey),
        |     c AS (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey)
        |SELECT COALESCE(s_nationkey, c_nationkey) AS nationkey,
        |       COALESCE(n_suppliers, 0) AS n_suppliers,
        |       COALESCE(n_customers, 0) AS n_customers
        |FROM s FULL OUTER JOIN c ON s_nationkey = c_nationkey
        |ORDER BY nationkey""".stripMargin,

    "q_join_right_outer" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
        |       COUNT(CASE WHEN o_totalprice > 3000 THEN TRUE END) AS n_large
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "q_join_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name",

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 4000)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |ORDER BY p_partkey""".stripMargin,

    "q_join_theta" ->
      """WITH b AS (SELECT p_brand AS b_brand,
        |                  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS b_avg
        |           FROM part GROUP BY p_brand)
        |SELECT p_partkey, p_brand, p_retailprice
        |FROM part JOIN b ON p_brand = b_brand AND p_retailprice > b_avg
        |ORDER BY p_partkey""".stripMargin,

    "q_join_interval" ->
      """SELECT a.user_id, a.event_id AS signup_id, b.event_id AS purchase_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
        |WHERE a.event_type = 'signup' AND b.event_type = 'purchase'
        |ORDER BY a.user_id, signup_id, purchase_id""".stripMargin,

    "q_join_asof" ->
      """WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'purchase'),
        |     s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS signup_ts, MAX(event_id) AS signup_id
        |           FROM events WHERE event_type = 'signup' GROUP BY user_id, CAST(ts AS TIMESTAMP))
        |SELECT p.user_id, p.event_id AS purchase_id, s.signup_id
        |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.signup_ts
        |ORDER BY p.user_id, purchase_id""".stripMargin,

    "q_flink_asof_sql" ->
      """WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'purchase'),
        |     s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS signup_ts, MAX(event_id) AS signup_id
        |           FROM events WHERE event_type = 'signup' GROUP BY user_id, CAST(ts AS TIMESTAMP))
        |SELECT p.user_id, p.event_id AS purchase_id, s.signup_id
        |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.signup_ts
        |ORDER BY p.user_id, purchase_id""".stripMargin,

    "q_join_lateral_unnest" ->
      """SELECT token, COUNT(*) AS cnt
        |FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents WHERE doc_id < 100)
        |GROUP BY token ORDER BY token""".stripMargin,
  )
}
