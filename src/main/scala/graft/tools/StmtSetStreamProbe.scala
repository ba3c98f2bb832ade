package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.Gateway

/** r14: BEGIN STATEMENT SET with STREAMING inserts — do both jobs start,
  * and does a set compiled after ALTER see the evolved schema? */
object StmtSetStreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gw = new Gateway(spark)
    val h = gw.openSession("probe")
    def run(s: String) = {
      val p = try gw.fetchResults(gw.executeStatement(h, s), 0)
      catch { case e: Exception => gw.Page(Seq("error"), Seq(Seq(s"THROW ${e.getMessage}")), None, eos = true) }
      println(s"== ${s.linesIterator.next().take(88)}\n   -> ${p.columns.take(6)} ${p.rows.take(3).map(_.take(6))}")
      p
    }
    val d = java.nio.file.Files.createTempDirectory("probe-ss").toString
    run("CREATE TABLE ss_src (id BIGINT, v DOUBLE) WITH ('connector'='datagen','rows-per-second'='200')")
    run(s"CREATE TABLE ss_a (id BIGINT, v DOUBLE) WITH ('connector'='filesystem','path'='$d/a','format'='parquet','checkpoint'='$d/ca')")
    run(s"CREATE TABLE ss_b (id BIGINT, v DOUBLE) WITH ('connector'='filesystem','path'='$d/b','format'='parquet','checkpoint'='$d/cb')")
    run("BEGIN STATEMENT SET; INSERT INTO ss_a SELECT id, v FROM ss_src; INSERT INTO ss_b SELECT id, v FROM ss_src; END")
    Thread.sleep(6000)
    run("SHOW JOBS")
    run("SELECT count(*) AS n FROM ss_a")
    run("SELECT count(*) AS n FROM ss_b")
    // evolve b, stop all, re-run a set compiled after the ALTER
    run("ALTER TABLE ss_b ADD tag STRING")
    run("SHOW JOBS")
    graft.engine.Jobs.stopAll()
    run("BEGIN STATEMENT SET; INSERT INTO ss_b SELECT id, v, 'g2' FROM ss_src; END")
    Thread.sleep(6000)
    run("SELECT count(*) AS n FROM ss_b WHERE tag = 'g2'")
    graft.engine.Jobs.stopAll()
    spark.stop()
  }
}
