package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.Gateway

/** r14: ALTER evolution over a CDC-format binding — old changelog lines
  * lack the new field (json NULL-fill expected); DROP of a column present
  * in the changelog should just project it away. */
object AlterCdcProbe {
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
      println(s"== ${s.linesIterator.next().take(90)}\n   -> ${p.columns.take(8)} ${p.rows.take(4).map(_.take(8))}")
      p
    }
    val dir = java.nio.file.Files.createTempDirectory("probe-cdc-alter")
    java.nio.file.Files.write(dir.resolve("cdc.json"), Seq(
      """{"before": null, "after": {"id": 1, "name": "ada"}, "op": "c", "ts_ms": 1000}""",
      """{"before": null, "after": {"id": 2, "name": "bob"}, "op": "c", "ts_ms": 1001}""")
      .mkString("\n").getBytes("UTF-8"))
    run(s"CREATE TABLE dbz (id BIGINT, name STRING, PRIMARY KEY (id) NOT ENFORCED) WITH ('connector'='filesystem','path'='$dir','format'='debezium-json')")
    run("SELECT * FROM dbz ORDER BY id")
    run("ALTER TABLE dbz ADD score DOUBLE")
    println("-- old changelog lines lack 'score': expect NULL-fill")
    run("SELECT * FROM dbz ORDER BY id")
    // a new changelog generation carries the field
    java.nio.file.Files.write(dir.resolve("cdc2.json"),
      ("""{"before": null, "after": {"id": 3, "name": "eve", "score": 9.5}, "op": "c", "ts_ms": 1002}""" + "\n").getBytes("UTF-8"))
    run("SELECT * FROM dbz ORDER BY id")
    run("ALTER TABLE dbz DROP name")
    println("-- changelog still carries 'name': expect it projected away")
    run("SELECT * FROM dbz ORDER BY id")
    run("ALTER TABLE dbz MODIFY score STRING")
    println("-- retype on a json-backed cdc binding (text re-parse: allowed?)")
    run("SELECT * FROM dbz ORDER BY id")
    spark.stop()
  }
}
