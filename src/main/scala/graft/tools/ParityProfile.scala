package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Phase timer for the stream-parity gates: where do the seconds go —
  * slice collect, stream START, per-micro-batch, or the diff?
  * Runs the tumble shape through the REAL gate helpers
  * ([[graft.queries.StreamParityQueries.withParityConf]] / `drain`) so the
  * profile measures the same configuration the gates run — no inline copy
  * to drift when the gate conf changes.
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ParityProfile"` */
object ParityProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.registerAll(spark, sfDir)
    spark.sql("SELECT count(*) FROM nation").collect()

    def phase[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 2).foreach { pass =>
      println(s"== pass $pass (tumble shape, gate conf) ==")
      graft.queries.StreamParityQueries.withParityConf(spark) {
        val in = phase("slice build") {
          graft.Tables.load(spark, sfDir, "events")
            .filter(col("event_id") < 2000)
            .select(col("user_id"),
              timestamp_seconds(col("event_id") + 3600).as("ets"), col("value"))
        }
        val rows = phase("slice collect")(in.orderBy(col("ets")).collect().toSeq)
        val mem = MemoryStream[Row](
          org.apache.spark.sql.Encoders.row(in.schema), spark.sqlContext)
        // decimal sum like the gate: a double sum drifts with aggregation
        // order and reports phantom diffs on healthy runs
        def agg(df: DataFrame): DataFrame = df
          .groupBy(window(col("ets"), "1 minute").as("__w"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(20,6)")).as("sv"))
        val out = agg(mem.toDF().withWatermark("ets", "0 seconds"))
        var lastQ: org.apache.spark.sql.streaming.StreamingQuery = null
        val streamedAll = graft.queries.StreamParityQueries.drain(
            spark, out, "pp_out") { q =>
          lastQ = q
          val n = rows.length
          Seq(rows.slice(0, n / 3), rows.slice(n / 3, 2 * n / 3), rows.drop(2 * n / 3))
            .zipWithIndex.foreach { case (w, i) =>
              phase(s"wave $i (${w.length} rows)") {
                mem.addData(w: _*); q.processAllAvailable()
              }
            }
          Seq(100000L, 200000L).zipWithIndex.foreach { case (sec, i) =>
            phase(s"pusher $i") {
              mem.addData(Row(-1L,
                java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)), 1.0))
              q.processAllAvailable()
            }
          }
        }
        Option(lastQ).foreach(_.recentProgress.foreach { p =>
          println(s"  [progress] batch=${p.batchId} durationMs=${p.durationMs}")
        })
        // the same pusher-window filter the gate applies — without it the
        // diff ALWAYS reports the pusher's own closed window as divergence
        val streamed = streamedAll.filter(col("__w.start") < timestamp_seconds(lit(50000)))
        val batch = agg(in)
        phase("diff") {
          val cols = batch.columns.toSeq.sorted.map(col)
          val b = batch.select(cols: _*)
          val st = streamed.select(cols: _*)
          println("  diff=" + b.exceptAll(st).union(st.exceptAll(b)).count())
        }
      }
    }
    spark.stop()
  }
}
