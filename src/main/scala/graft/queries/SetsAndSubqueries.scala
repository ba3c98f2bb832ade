package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Set operations, subqueries, VALUES, CASE/sort/limit surface
  * (SURVEY.md §2.4: reference corpus F:296-344, F:107-131).
  *
  * Subquery forms run through `spark.sql` over registered temp views — the
  * engine's SQL surface is the product here; Catalyst rewrites IN/EXISTS to
  * left-semi/anti joins and decorrelates scalar subqueries, which is exactly
  * the plan we'd hand-write.
  */
object SetsAndSubqueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private def sql(s: SparkSession, dir: String, q: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q)
  }

  val queries: Map[String, Q] = Map(
    // UNION (distinct) of two projections
    "q_set_union" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
        .union(o.filter(col("o_totalprice") > 4000).select(col("o_custkey").as("custkey")))
        .distinct()
        .orderBy(col("custkey"))
    },

    // UNION ALL preserving duplicates, then counted for determinism
    "q_set_union_all" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
        .union(o.filter(col("o_totalprice") > 4000).select(col("o_custkey").as("custkey")))
        .groupBy(col("custkey")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("custkey"))
    },

    // INTERSECT
    "q_set_intersect" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
        .intersect(o.filter(col("o_totalprice") > 4000).select(col("o_custkey").as("custkey")))
        .orderBy(col("custkey"))
    },

    // EXCEPT
    "q_set_except" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      o.select(col("o_custkey").as("custkey"))
        .except(o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey")))
        .orderBy(col("custkey"))
    },

    // EXCEPT ALL (multiset difference)
    "q_set_except_all" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      o.select(col("o_custkey").as("custkey"))
        .exceptAll(o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey")))
        .groupBy(col("custkey")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("custkey"))
    },

    // IN (subquery): orders from customers in the BUILDING segment
    "q_subq_in" -> { (s, dir) => sql(s, dir,
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin)
    },

    // NOT EXISTS (correlated): customers with no orders at all
    "q_subq_not_exists" -> { (s, dir) => sql(s, dir,
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin)
    },

    // scalar subquery (uncorrelated) + correlated scalar subquery
    "q_subq_scalar" -> { (s, dir) => sql(s, dir,
      """SELECT n_nationkey, n_name,
        |       (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_customers,
        |       (SELECT COUNT(*) FROM supplier) AS total_suppliers
        |FROM nation ORDER BY n_nationkey""".stripMargin)
    },

    // VALUES inline relation joined to a real table
    // Pre-aggregate the fact side BEFORE the outer join (r16 plan fix): the
    // 3-row VALUES is the PRESERVED side of the LEFT JOIN, so the build
    // side would have to be orders — no broadcast possible — and the
    // fallback shuffle join has exactly 3 keys, landing a 50M-row sort on
    // 3 tasks at sf100 (measured 144 s). Map-side partial aggregation
    // reduces orders to ~3 rows before any join; same result by
    // construction (COUNT over the join's matches == the per-key counts,
    // COALESCE supplies the unmatched-code zero).
    "q_values_inline" -> { (s, dir) => sql(s, dir,
      """SELECT v.code, v.label, COALESCE(agg.n, 0) AS n
        |FROM VALUES ('O', 'open'), ('F', 'finished'), ('P', 'pending') AS v(code, label)
        |LEFT JOIN (SELECT o_orderstatus, COUNT(o_orderkey) AS n
        |           FROM orders GROUP BY o_orderstatus) agg
        |  ON agg.o_orderstatus = v.code
        |ORDER BY v.code""".stripMargin)
    },

    // CASE WHEN buckets + DISTINCT
    "q_case_when" -> { (s, dir) =>
      t(s, dir, "orders")
        .select(
          when(col("o_totalprice") < 1000, "small")
            .when(col("o_totalprice") < 10000, "medium")
            .otherwise("large").as("bucket"),
          col("o_orderstatus"))
        .groupBy(col("bucket"), col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("bucket"), col("o_orderstatus"))
    },

    // ORDER BY DESC NULLS handling + LIMIT/OFFSET
    "q_sort_limit_offset" -> { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(10).limit(50)
    },
  )

  val oracle: Map[String, String] = Map(
    "q_set_union" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_totalprice > 4000
        |ORDER BY custkey""".stripMargin,

    "q_set_union_all" ->
      """SELECT custkey, COUNT(*) AS cnt FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 4000)
        |GROUP BY custkey ORDER BY custkey""".stripMargin,

    "q_set_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 4000
        |ORDER BY custkey""".stripMargin,

    "q_set_except" ->
      """SELECT o_custkey AS custkey FROM orders
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY custkey""".stripMargin,

    "q_set_except_all" ->
      """SELECT custkey, COUNT(*) AS cnt FROM (
        |  SELECT o_custkey AS custkey FROM orders
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |GROUP BY custkey ORDER BY custkey""".stripMargin,

    "q_subq_in" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,

    "q_subq_not_exists" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_subq_scalar" ->
      """SELECT n_nationkey, n_name,
        |       (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_customers,
        |       (SELECT COUNT(*) FROM supplier) AS total_suppliers
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q_values_inline" ->
      """SELECT v.code, v.label, COUNT(o_orderkey) AS n
        |FROM (VALUES ('O', 'open'), ('F', 'finished'), ('P', 'pending')) v(code, label)
        |LEFT JOIN orders ON o_orderstatus = v.code
        |GROUP BY v.code, v.label ORDER BY v.code""".stripMargin,

    "q_case_when" ->
      """SELECT CASE WHEN o_totalprice < 1000 THEN 'small'
        |            WHEN o_totalprice < 10000 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |       o_orderstatus, COUNT(*) AS cnt
        |FROM orders GROUP BY 1, 2 ORDER BY bucket, o_orderstatus""".stripMargin,

    "q_sort_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50 OFFSET 10""".stripMargin,
  )
}
