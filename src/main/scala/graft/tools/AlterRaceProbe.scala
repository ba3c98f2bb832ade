package graft.tools

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.apache.spark.sql.SparkSession
import graft.engine.Gateway

/** r14: do concurrent ALTER TABLE ADDs on one binding lose updates?
  * alterSchema reads the binding, computes the new column list, and puts —
  * a plain read-compute-put. 8 racing ADDs of distinct columns should end
  * with all 8 columns present. */
object AlterRaceProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gw = new Gateway(spark)
    val h0 = gw.openSession("race0")
    def run(h: String, s: String) = gw.fetchResults(gw.executeStatement(h, s), 0)
    (1 to 5).foreach { round =>
      run(h0, s"DROP TABLE IF EXISTS race_t")
      val dir = java.nio.file.Files.createTempDirectory(s"probe-race$round").toString
      run(h0, s"CREATE TABLE race_t (id BIGINT) WITH ('connector'='filesystem','path'='$dir','format'='parquet')")
      val n = 8
      val pool = Executors.newFixedThreadPool(n)
      val start = new CountDownLatch(1)
      (0 until n).foreach { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val h = gw.openSession(s"race_$i")
            start.await()
            val p = gw.fetchResults(gw.executeStatement(h, s"ALTER TABLE race_t ADD col_$i BIGINT"), 0)
            if (p.columns == Seq("error")) println(s"  [round $round] worker $i error: ${p.rows.head.head}")
            gw.closeSession(h)
          }
        })
      }
      start.countDown()
      pool.shutdown(); pool.awaitTermination(60, TimeUnit.SECONDS)
      val cols = run(h0, "SELECT * FROM race_t").columns
      println(s"[round $round] columns after 8 racing ADDs: ${cols.size} -> $cols")
    }
    spark.stop()
  }
}
