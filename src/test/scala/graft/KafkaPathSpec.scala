package graft

import java.sql.Timestamp
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.engine.{FlinkDialect, TableEnv}

/** One record exactly as Spark's kafka source delivers it (the connector's
  * fixed schema: key/value binary + topic/partition/offset/timestamp/
  * timestampType metadata). */
case class KafkaWireRecord(
    key: Array[Byte], value: Array[Byte], topic: String,
    partition: Int, offset: Long, timestamp: Timestamp, timestampType: Int)

/** The kafka integration path, taken as far as this sandbox physically
  * allows (r11, VERDICT task 3).
  *
  * A REAL broker round-trip is impossible here, and the first spec PINS the
  * specific failure instead of hand-waving it: `/opt/spark/jars` ships no
  * `spark-sql-kafka-0-10` connector and no `kafka-clients`, the coursier
  * cache holds no kafka artifact, and the environment has zero egress to
  * fetch one — so an in-process KRaft broker cannot even be compiled
  * against, and `readStream.format("kafka")` must die at source lookup.
  * (The same posture as the hive/hbase/kinesis connectors: fail fast with
  * the named reason.)
  *
  * The second spec drives everything EXCEPT the socket end-to-end through
  * real micro-batches: records in the connector's exact wire shape →
  * `decodeKafkaRecords` (key.format/key.fields/EXCEPT_KEY + json value) →
  * METADATA timestamp column → `finishSource` watermark → the dialect's
  * TUMBLE TVF SQL path on the streaming frame → `upsertKafkaRecords` PK
  * keying → update-mode sink, asserting the log-compacted final state and
  * the watermark's late-data drop. If a broker jar ever lands on the
  * classpath, `streamDF` feeds this identical pipeline.
  */
class KafkaPathSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val sourceDdl = """CREATE TABLE payments (
    user_id BIGINT,
    amount DOUBLE,
    ts TIMESTAMP(3) METADATA FROM 'timestamp',
    WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE
  ) WITH (
    'connector' = 'kafka',
    'topic' = 'payments',
    'properties.bootstrap.servers' = 'localhost:9092',
    'properties.group.id' = 'graft',
    'scan.startup.mode' = 'earliest-offset',
    'format' = 'json',
    'key.format' = 'json',
    'key.fields' = 'user_id',
    'value.fields-include' = 'EXCEPT_KEY'
  )"""

  test("kafka broker start dies at source lookup — the sandbox has no " +
      "spark-sql-kafka jar and no egress to fetch one (posture pinned)") {
    val b = TableEnv.parseCreateTable(sourceDdl)
    // option translation is intact right up to the load() boundary
    val opts = TableEnv.kafkaSourceOptions(b)
    assert(opts("subscribe") == "payments")
    assert(opts("kafka.bootstrap.servers") == "localhost:9092")
    assert(opts("startingOffsets") == "earliest")
    assert(opts("kafka.group.id") == "graft")
    val e = intercept[Exception] { TableEnv.streamDF(spark, b) }
    val msg = String.valueOf(e.getMessage).toLowerCase
    assert(msg.contains("kafka"),
      s"expected the missing kafka data source to be the failure, got: $e")
  }

  test("kafka wire-shaped stream end-to-end: decode → metadata ts → " +
      "watermark → TUMBLE TVF SQL → upsert-kafka records over real micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val b = TableEnv.parseCreateTable(sourceDdl)

    def rec(uid: Long, amount: Double, at: String, off: Long) = KafkaWireRecord(
      s"""{"user_id":$uid}""".getBytes(UTF_8),
      s"""{"amount":$amount}""".getBytes(UTF_8), // EXCEPT_KEY: no user_id here
      "payments", 0, off, ts(at), 0)

    val mem = MemoryStream[KafkaWireRecord]
    val decoded = TableEnv.decodeKafkaRecords(mem.toDF(), b)
    val finished = TableEnv.finishSource(decoded, b, stream = true)
    assert(finished.isStreaming)
    assert(finished.columns.toSeq == Seq("user_id", "amount", "ts"))
    finished.createOrReplaceTempView("payments_wire")

    // the user's Flink SQL, through the real dialect layer
    val sql = FlinkDialect.rewrite(
      """SELECT window_start, window_end, user_id, SUM(amount) AS total
        |FROM TABLE(TUMBLE(TABLE payments_wire, DESCRIPTOR(ts), INTERVAL '10' MINUTE))
        |GROUP BY window_start, window_end, user_id""".stripMargin)
    val agg = spark.sql(sql)

    // sink side: upsert-kafka record shape (PK json key, row json value)
    val sinkB = TableEnv.parseCreateTable("""CREATE TABLE pay_out (
      window_start TIMESTAMP(3), window_end TIMESTAMP(3),
      user_id BIGINT, total DOUBLE,
      PRIMARY KEY (window_start, user_id) NOT ENFORCED
    ) WITH ('connector'='upsert-kafka','topic'='pay_out',
      'key.format'='json','value.format'='json')""")
    val wire = TableEnv.upsertKafkaRecords(
      agg.withColumn("window_start", col("window_start").cast("timestamp"))
        .withColumn("window_end", col("window_end").cast("timestamp")), sinkB)

    val q = wire.selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
      .writeStream.outputMode("update").format("memory")
      .queryName("pay_out_wire").start()
    try {
      mem.addData(
        rec(1, 5.0, "2024-01-01 00:01:00", 0),
        rec(1, 7.0, "2024-01-01 00:04:00", 1),
        rec(2, 3.0, "2024-01-01 00:02:00", 2),
        rec(1, 11.0, "2024-01-01 00:12:00", 3))
      q.processAllAvailable()
      // advance the watermark past the first window (00:31 − 10m = 00:21)
      mem.addData(rec(2, 1.0, "2024-01-01 00:31:00", 4))
      q.processAllAvailable()
      // LATE for the closed 00:00 window — must be dropped by the watermark
      mem.addData(rec(1, 999.0, "2024-01-01 00:03:00", 5))
      q.processAllAvailable()
      mem.addData(rec(2, 2.0, "2024-01-01 00:35:00", 6))
      q.processAllAvailable()
    } finally q.stop()

    // replay Kafka log compaction: latest value per key, in arrival order
    val compacted = spark.table("pay_out_wire").collect()
      .foldLeft(scala.collection.immutable.ListMap.empty[String, String]) {
        (acc, r) => acc + (r.getString(0) -> r.getString(1))
      }
    def total(key: String): Double = {
      val v = compacted(key)
      """"total":([0-9.]+)""".r.findFirstMatchIn(v).get.group(1).toDouble
    }
    val k = (w: String, uid: Long) =>
      compacted.keys.find(x => x.contains(s""""user_id":$uid""") &&
        x.contains(w.replace(' ', 'T'))) // to_json renders ISO-8601
        .getOrElse(fail(s"no record for $w/$uid in ${compacted.keys}"))
    assert(total(k("2024-01-01 00:00:00", 1)) == 12.0, // 5 + 7, late 999 dropped
      s"late record must not update the closed window: $compacted")
    assert(total(k("2024-01-01 00:00:00", 2)) == 3.0)
    assert(total(k("2024-01-01 00:10:00", 1)) == 11.0)
    assert(total(k("2024-01-01 00:30:00", 2)) == 3.0) // 1 + 2
  }
}
