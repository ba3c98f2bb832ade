package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: route each CLI-arg statement through a fresh gateway session
  * and print the first page (columns + up to 3 rows). */
object GatewayProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.TableEnv.clear()
    val gw = new graft.engine.Gateway(spark)
    val h = gw.openSession("probe")
    args.foreach { sql =>
      val t0 = System.nanoTime()
      val p = gw.fetchResults(gw.executeStatement(h, sql), 0)
      println(f"[probe ${(System.nanoTime() - t0) / 1e9}%.2fs] cols=${p.columns} " +
        s"rows=${p.rows.take(3)}")
    }
    spark.stop()
  }
}
