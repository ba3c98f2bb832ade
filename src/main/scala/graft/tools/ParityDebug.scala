package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch runner: print the actual diff rows behind a q_stream_parity_*
  * summary. `sbt "runMain graft.tools.ParityDebug cep"` */
object ParityDebug {
  def main(args: Array[String]): Unit = {
    val op = args.headOption.getOrElse("cep")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    if (op == "mini") { mini(spark); spark.stop(); return }
    val (b, st) = graft.queries.StreamParityQueries.debugPair(op)(spark, dir)
    val cols = b.columns.toSeq.sorted.map(col)
    val bb = b.select(cols: _*)
    val ss = st.select(cols: _*)
    println("=== batch minus stream ===")
    bb.exceptAll(ss).show(20, false)
    println("=== stream minus batch ===")
    ss.exceptAll(bb).show(20, false)
    println(s"batch=${bb.count()} stream=${ss.count()}")
    spark.stop()
  }

  /** minimal repro: A row at epoch 0, B later — does the stream emit it? */
  private def mini(spark: SparkSession): Unit = {
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.MatchRecognize
    import graft.operators.MatchRecognize._
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ets", TimestampType),
      StructField("value", DoubleType)))
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val mem = MemoryStream[R](org.apache.spark.sql.Encoders.row(schema), spark.sqlContext)
    val out = MatchRecognize.matchRecognizeStream(
      mem.toDF(), Seq("user_id"), "ets",
      Seq("A" -> (col("value") < 100), "B" -> (col("value") >= 100)),
      parsePattern("A+ B"),
      Seq(Measure("start_ts", "first", "A", "ets"),
        Measure("high_val", "last", "B", "value")),
      watermarkDelay = Some("0 seconds"))
    val q = out.writeStream.format("memory").queryName("mini_out")
      .outputMode("append").start()
    def step(label: String)(f: => Unit): Unit = {
      f; q.processAllAvailable()
      val wm = Option(q.lastProgress).map(_.eventTime.get("watermark")).orNull
      println(s"[mini] $label: wm=$wm out=${spark.table("mini_out").count()}" +
        s" batchId=${Option(q.lastProgress).map(_.batchId).orNull}")
    }
    step("wave1")(mem.addData(R(8L, ts(1), 50.0), R(8L, ts(5), 150.0)))
    step("push1")(mem.addData(R(9L, ts(100000), 1.0)))
    step("push2")(mem.addData(R(9L, ts(200000), 2.0)))
    q.stop()
    spark.table("mini_out").show(10, false)
  }
}
