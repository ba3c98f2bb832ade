package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.{FlinkDialect, Gateway, TableEnv}

/** Probe: streaming TUMBLE TVF SQL over a datagen BINDING through the
  * gateway — does the materialized view's watermark survive the rewrite? */
object CkptEvoProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("ckpt-evo-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    TableEnv.clear()
    val gw = new Gateway(spark)
    val h = gw.openSession("probe")
    def run(s: String) = gw.fetchResults(gw.executeStatement(h, s), 0)
    println(run("CREATE TABLE cr_src (k INT, ts TIMESTAMP(3), v DOUBLE, " +
      "WATERMARK FOR ts AS ts - INTERVAL '5' SECOND) WITH " +
      "('connector'='datagen','rows-per-second'='500')").rows.take(1))
    val sess = gw.session(h).spark
    val view = sess.table("cr_src")
    println(s"view streaming=${view.isStreaming}")
    println("view plan: " + view.queryExecution.analyzed.toString.take(600))
    val sql = "SELECT window_start, SUM(v) AS sv FROM TABLE(TUMBLE(TABLE " +
      "cr_src, DESCRIPTOR(ts), INTERVAL '10' SECOND)) GROUP BY window_start"
    println("rewritten: " + FlinkDialect.rewrite(sql))
    val df = sess.sql(FlinkDialect.rewrite(sql))
    println("agg plan: " + df.queryExecution.analyzed.toString.take(1200))
    spark.stop()
  }
}
