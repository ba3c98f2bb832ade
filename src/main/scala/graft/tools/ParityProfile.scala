package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Phase timer for the stream-parity gates: where do the seconds go —
  * slice collect, stream START, per-micro-batch, or the diff?
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
      println(s"== pass $pass (tumble shape, 4 shuffle partitions) ==")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val in = phase("slice build") {
        graft.Tables.load(spark, sfDir, "events")
          .filter(col("event_id") < 2000)
          .select(col("user_id"),
            timestamp_seconds(col("event_id") + 3600).as("ets"), col("value"))
      }
      val rows = phase("slice collect")(in.orderBy(col("ets")).collect().toSeq)
      val mem = MemoryStream[Row](
        org.apache.spark.sql.Encoders.row(in.schema), spark.sqlContext)
      def agg(df: DataFrame): DataFrame = df
        .groupBy(window(col("ets"), "1 minute").as("__w"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      val out = agg(mem.toDF().withWatermark("ets", "0 seconds"))
      val q = phase("stream start") {
        // same tmpfs-or-tmpdir rule as StreamParityQueries.drain — the
        // gate this tool profiles
        val base = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
          else System.getProperty("java.io.tmpdir")
        val ckpt = new java.io.File(s"$base/graft_pp_ckpt")
        org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
        out.writeStream.format("memory").queryName("pp_out")
          .option("checkpointLocation", ckpt.getAbsolutePath)
          .outputMode("append").start()
      }
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
      q.recentProgress.foreach { p =>
        println(s"  [progress] batch=${p.batchId} durationMs=${p.durationMs}")
      }
      phase("stop")(q.stop())
      val streamed = spark.table("pp_out")
      val batch = agg(in)
      phase("diff") {
        val cols = batch.columns.toSeq.sorted.map(col)
        val b = batch.select(cols: _*)
        val st = streamed.select(cols: _*)
        println("  diff=" + b.exceptAll(st).union(st.exceptAll(b)).count())
      }
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    spark.stop()
  }
}
