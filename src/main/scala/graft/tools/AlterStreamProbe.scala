package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.Gateway

/** Dev probe (r14): second streaming INSERT start after ALTER evolution. */
object AlterStreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("alter-stream-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val gw = new Gateway(spark)
    val h = gw.openSession("probe")
    def run(s: String) = {
      val p = try gw.fetchResults(gw.executeStatement(h, s), 0)
      catch { case e: Exception => gw.Page(Seq("error"), Seq(Seq(s"THROW ${e.getMessage}")), None, eos = true) }
      println(s"== $s\n   -> ${p.columns} ${p.rows.take(3)}")
      p
    }
    val dir = java.nio.file.Files.createTempDirectory("probe-as").toString
    run("CREATE TABLE as_src (id BIGINT, v DOUBLE) WITH ('connector'='datagen','rows-per-second'='200')")
    run(s"CREATE TABLE as_snk (id BIGINT, v DOUBLE) WITH ('connector'='filesystem','path'='$dir/snk','format'='parquet','checkpoint'='$dir/ckpt')")
    val m1 = run("INSERT INTO as_snk SELECT id, v FROM as_src").rows.head.head.toString
    val job1 = "Job (\\S+) started".r.findFirstMatchIn(m1).get.group(1)
    Thread.sleep(5000)
    run("SELECT count(*) AS n FROM as_snk")
    run("ALTER TABLE as_snk ADD tag STRING")
    run("ALTER TABLE as_src ADD w DOUBLE")
    Thread.sleep(3000)
    run("SHOW JOBS")
    run(s"STOP JOB '$job1'")
    val m2 = run("INSERT INTO as_snk SELECT id, w, 'g2' FROM as_src").rows.head.head.toString
    println(s"-- job2 start msg: $m2")
    Thread.sleep(8000)
    run("SHOW JOBS")
    run("SELECT count(*) AS n FROM as_snk WHERE tag = 'g2'")
    run("SELECT count(*) AS n FROM as_snk")
    graft.engine.Jobs.stopAll()
    spark.stop()
  }
}
