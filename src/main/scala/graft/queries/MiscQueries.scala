package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Remaining §2.4/§2.5 surface: NATURAL JOIN / USING, ILIKE, and the literal
  * forms the grammar declares (hex, scientific, binary X'...', quoted-quote
  * strings, INTERVAL literals — F:562-620).
  */
object MiscQueries {
  type Q = (SparkSession, String) => DataFrame

  private def sql(s: SparkSession, dir: String, q: String): DataFrame = {
    Tables.registerAll(s, dir)
    // through the dialect layer: hex literals etc. are Flink-isms
    graft.engine.FlinkDialect.sql(s, q)
  }

  val queries: Map[String, Q] = Map(
    // NATURAL JOIN + USING (G:247,251)
    "q_join_using" -> { (s, dir) => sql(s, dir,
      """SELECT n_name, r_name FROM
        |  (SELECT n_name, n_regionkey AS rk FROM nation) n
        |JOIN (SELECT r_name, r_regionkey AS rk FROM region) r USING (rk)
        |ORDER BY n_name""".stripMargin)
    },

    "q_join_natural" -> { (s, dir) => sql(s, dir,
      """SELECT n_name, r_name FROM
        |  (SELECT n_name, n_regionkey AS rk FROM nation) n
        |NATURAL JOIN (SELECT r_name, r_regionkey AS rk FROM region) r
        |ORDER BY n_name""".stripMargin)
    },

    // ILIKE (G:279; native in Spark 3.3+ and DuckDB)
    "q_filter_ilike" -> { (s, dir) => sql(s, dir,
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority ILIKE '%urgent%'
        |ORDER BY o_orderkey""".stripMargin)
    },

    // ANSI special argument syntaxes (F:354, F:361; G:431): TRIM(BOTH/
    // LEADING/TRAILING ... FROM), SUBSTRING(FROM FOR), POSITION(IN)
    "q_ansi_syntax" -> { (s, dir) => sql(s, dir,
      """SELECT doc_id,
        |  TRIM(BOTH 's' FROM source) AS t_both,
        |  TRIM(LEADING 's' FROM source) AS t_lead,
        |  TRIM(TRAILING '0123456789' FROM source) AS t_trail,
        |  SUBSTRING(text FROM 3 FOR 8) AS sub_ff,
        |  CAST(POSITION('c' IN source) AS INT) AS pos_c
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin)
    },

    // literal forms (F:566-591): hex, scientific, string escapes, intervals
    "q_literals" -> { (s, dir) => sql(s, dir,
      """SELECT event_id,
        |  CAST(event_id & 0xFF AS BIGINT) AS hex_masked,
        |  CAST(1.5E2 AS DOUBLE) AS sci,
        |  'it''s quoted' AS quoted,
        |  ts + INTERVAL '1' HOUR AS plus_1h,
        |  ts + INTERVAL '1-2' YEAR TO MONTH AS plus_ym,
        |  ts + INTERVAL '1 02:03:04' DAY TO SECOND AS plus_dts,
        |  CAST(X'4142' AS STRING) AS bin_lit
        |FROM events WHERE event_id < 100 ORDER BY event_id""".stripMargin)
    },

    // protobuf format: REAL wire bytes round-tripped through the hand-rolled
    // codec (encode per partition → decode through the kafka-value column
    // path). The oracle recomputes the pre-encode projection, so a decode
    // that drops/mangles/defaults any field hash-mismatches.
    "q_format_protobuf" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      import org.apache.spark.sql.Row
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("snippet", StringType),
        StructField("k_mod", IntegerType), StructField("flag", BooleanType)))
      // coalesce before substring: proto3 cannot represent NULL string —
      // encode omits the field and decode restores '' — so a NULL text
      // would silently become '' on the Spark side while the oracle keeps
      // NULL; pinning '' on BOTH sides keeps the gate honest if a corpus
      // with NULL text ever lands
      val src = Tables.load(s, dir, "documents").select(
        col("doc_id"), substring(coalesce(col("text"), lit("")), 1, 40).as("snippet"),
        (col("doc_id") % 1000).cast("int").as("k_mod"),
        (col("doc_id") % 2 === 0).as("flag"))
      val binSchema = StructType(Seq(StructField("value", BinaryType)))
      val payloads = src.mapPartitions(rows =>
        rows.map(r => Row(graft.sources.ProtobufWire.encodeMessage(r, schema))))(
        org.apache.spark.sql.Encoders.row(binSchema))
      payloads
        .select(graft.sources.ProtobufWire.fromProtoValue(col("value"), schema).as("d"))
        .select("d.*").orderBy("doc_id")
    },
  )

  val oracle: Map[String, String] = Map(
    "q_join_using" ->
      """SELECT n_name, r_name FROM
        |  (SELECT n_name, n_regionkey AS rk FROM nation) n
        |JOIN (SELECT r_name, r_regionkey AS rk FROM region) r USING (rk)
        |ORDER BY n_name""".stripMargin,

    "q_join_natural" ->
      """SELECT n_name, r_name FROM
        |  (SELECT n_name, n_regionkey AS rk FROM nation) n
        |NATURAL JOIN (SELECT r_name, r_regionkey AS rk FROM region) r
        |ORDER BY n_name""".stripMargin,

    "q_filter_ilike" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority ILIKE '%urgent%'
        |ORDER BY o_orderkey""".stripMargin,

    "q_ansi_syntax" ->
      """SELECT doc_id,
        |  TRIM(BOTH 's' FROM source) AS t_both,
        |  TRIM(LEADING 's' FROM source) AS t_lead,
        |  TRIM(TRAILING '0123456789' FROM source) AS t_trail,
        |  SUBSTRING(text FROM 3 FOR 8) AS sub_ff,
        |  CAST(POSITION('c' IN source) AS INT) AS pos_c
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    "q_literals" ->
      """SELECT event_id,
        |  CAST(event_id & 255 AS BIGINT) AS hex_masked,
        |  CAST(1.5E2 AS DOUBLE) AS sci,
        |  'it''s quoted' AS quoted,
        |  CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR AS plus_1h,
        |  CAST(ts AS TIMESTAMP) + INTERVAL 14 MONTH AS plus_ym,
        |  CAST(ts AS TIMESTAMP) + INTERVAL '1 day 2 hours 3 minutes 4 seconds' AS plus_dts,
        |  'AB' AS bin_lit
        |FROM events WHERE event_id < 100 ORDER BY event_id""".stripMargin,

    "q_format_protobuf" ->
      """SELECT doc_id, substring(coalesce(text, ''), 1, 40) AS snippet,
        |       CAST(doc_id % 1000 AS INT) AS k_mod,
        |       doc_id % 2 = 0 AS flag
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
