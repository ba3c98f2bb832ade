package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.Gateway

/** r14: composition probe — views/STATEMENT SET/LIKE over evolving tables.
  * Flink semantics to check against:
  *  - a view's schema is captured at CREATE VIEW time for `SELECT *`
  *    (expanded at definition), so later ALTERs don't change the view;
  *  - CREATE TABLE ... LIKE copies the CURRENT schema;
  *  - a STATEMENT SET's INSERTs compile at EXECUTE time. */
object AlterViewProbe {
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
      println(s"== ${s.linesIterator.next().take(90)}\n   -> ${p.columns.take(8)} ${p.rows.take(3).map(_.take(8))}")
      p
    }
    val dir = java.nio.file.Files.createTempDirectory("probe-av").toString
    run(s"CREATE TABLE base (a INT, b STRING) WITH ('connector'='filesystem','path'='$dir','format'='parquet')")
    run("INSERT INTO base VALUES (1, 'x')")
    run("CREATE VIEW vstar AS SELECT * FROM base")
    run("CREATE VIEW vcols AS SELECT a, b FROM base")
    run("ALTER TABLE base ADD c DOUBLE")
    run("INSERT INTO base VALUES (2, 'y', 9.5)")
    println("-- after ALTER ADD c:")
    run("SELECT * FROM vstar ORDER BY a")  // Flink: still (a, b)
    run("SELECT * FROM vcols ORDER BY a")
    run("DESCRIBE vstar")
    // view over a column that then gets DROPPED
    run("ALTER TABLE base DROP b")
    println("-- after ALTER DROP b (vcols references b):")
    run("SELECT * FROM vcols ORDER BY a") // must be a NAMED error or refused at ALTER
    run("SELECT * FROM vstar ORDER BY a")
    // CREATE TABLE LIKE copies the CURRENT (evolved) schema
    val dir2 = java.nio.file.Files.createTempDirectory("probe-av2").toString
    run(s"CREATE TABLE liked WITH ('connector'='filesystem','path'='$dir2') LIKE base")
    run("DESCRIBE liked")
    // STATEMENT SET compiled after ALTER sees the evolved schema
    run("ALTER TABLE base ADD d BIGINT")
    run("BEGIN STATEMENT SET; INSERT INTO base SELECT 5, 1.5, 50; INSERT INTO base SELECT 6, 2.5, 60; END")
    run("SELECT * FROM base ORDER BY a")
    spark.stop()
  }
}
