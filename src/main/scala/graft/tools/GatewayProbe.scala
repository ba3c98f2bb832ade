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
    args.foreach {
      case churn if churn.startsWith("--churn=") =>
        // operation-registry churn: N tiny statements through one session,
        // reporting driver heap before/after (post-GC) — a leaky op registry
        // or ring buffer shows up as monotonic growth
        val n = churn.stripPrefix("--churn=").toInt
        def heapMb = {
          System.gc(); Thread.sleep(200)
          val r = Runtime.getRuntime; (r.totalMemory - r.freeMemory) / 1048576
        }
        val before = heapMb
        val t0 = System.nanoTime()
        (1 to n).foreach { i =>
          val p = gw.fetchResults(gw.executeStatement(h, s"SELECT $i AS x"), 0)
          require(p.rows.head.head.toString == i.toString)
        }
        println(f"[probe churn] $n statements in ${(System.nanoTime() - t0) / 1e9}%.1fs, " +
          s"heap ${before}MB -> ${heapMb}MB")
      case sql =>
        val t0 = System.nanoTime()
        val p = gw.fetchResults(gw.executeStatement(h, sql), 0)
        println(f"[probe ${(System.nanoTime() - t0) / 1e9}%.2fs] cols=${p.columns} " +
          s"rows=${p.rows.take(3)}")
    }
    spark.stop()
  }
}
