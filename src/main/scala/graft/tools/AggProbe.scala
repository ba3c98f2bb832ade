package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Best-of-2 re-timing + plan dump for a bounded-output sweep variant that
  * read anomalously (q_flink_session__agg 170 s at sf10 vs q_session_agg__agg
  * 3.8 s on the same 9.5M-row output). */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf10f")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.registerAll(spark, sfDir)
    graft.functions.FlinkFunctions.registerAll(spark)
    for (name <- args.headOption.map(Seq(_)).getOrElse(
        Seq("q_flink_session", "q_session_agg"))) {
      val fn = graft.SparkEntry.queries(name)
      def bounded = {
        val df = fn(spark, sfDir)
        df.agg(count(lit(1)).as("n"),
          expr(df.columns.map(c => s"cast(`$c` as string)")
            .mkString("bit_xor(xxhash64(", ", ", "))")).as("h"))
      }
      // plan first
      println(s"== $name bounded plan ==")
      println(bounded.queryExecution.executedPlan.toString.take(1800))
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        bounded.collect()
        println(f"[$name run $i] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
