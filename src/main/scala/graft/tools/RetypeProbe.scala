package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.Gateway

/** Dev probe (r14): which ALTER TABLE MODIFY retypes survive a read over
  * parquet/orc/json/csv files already holding data of the old type. */
object RetypeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("retype-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gw = new Gateway(spark)
    val h = gw.openSession("probe")
    def page(s: String) =
      try gw.fetchResults(gw.executeStatement(h, s), 0)
      catch { case e: Exception =>
        gw.Page(Seq("error"), Seq(Seq(s"FETCH-THROW ${e.getMessage.linesIterator.next()}")), None, eos = true) }
    var n = 0
    def probe(format: String, fromType: String, lit: String, toType: String): Unit = {
      n += 1
      val dir = java.nio.file.Files.createTempDirectory(s"probe-rt$n").toString
      val t = s"rt$n"
      page(s"CREATE TABLE $t (a $fromType, k INT) WITH ('connector'='filesystem','path'='$dir','format'='$format')")
      val ins = page(s"INSERT INTO $t VALUES ($lit, 1)")
      val alt = page(s"ALTER TABLE $t MODIFY a $toType")
      val sel = page(s"SELECT * FROM $t")
      val verdict =
        if (ins.columns == Seq("error")) s"INSERT-ERR ${ins.rows.head.head.toString.take(80)}"
        else if (alt.columns == Seq("error")) s"ALTER-ERR ${alt.rows.head.head.toString.take(80)}"
        else if (sel.columns == Seq("error")) s"READ-ERR ${sel.rows.head.head.toString.take(90)}"
        else s"OK ${sel.rows.take(1)}"
      println(f"[$format%-7s] $fromType%-12s -> $toType%-12s : $verdict")
    }
    for (f <- Seq("parquet", "orc", "json", "csv", "avro")) {
      probe(f, "TINYINT", "CAST(1 AS TINYINT)", "INT")
      probe(f, "TINYINT", "CAST(1 AS TINYINT)", "BIGINT")
      probe(f, "TINYINT", "CAST(1 AS TINYINT)", "DOUBLE")
      probe(f, "SMALLINT", "CAST(1 AS SMALLINT)", "DOUBLE")
      probe(f, "INT", "1", "BIGINT")
      probe(f, "INT", "1", "DOUBLE")
      probe(f, "BIGINT", "1", "DOUBLE")
      probe(f, "FLOAT", "CAST(1.5 AS FLOAT)", "DOUBLE")
      probe(f, "DOUBLE", "1.5", "FLOAT")
      probe(f, "DOUBLE", "1.5", "INT")
      probe(f, "DOUBLE", "1.5", "DECIMAL(10,2)")
      probe(f, "INT", "1", "STRING")
      probe(f, "STRING", "'x'", "INT")
      probe(f, "INT", "1", "BOOLEAN")
      probe(f, "BOOLEAN", "true", "STRING")
      probe(f, "BOOLEAN", "true", "INT")
      probe(f, "TIMESTAMP(3)", "TIMESTAMP '2024-01-02 03:04:05'", "DATE")
      probe(f, "DATE", "DATE '2024-01-02'", "TIMESTAMP(3)")
      probe(f, "DECIMAL(10,2)", "CAST(1.25 AS DECIMAL(10,2))", "DECIMAL(20,2)")
      probe(f, "DECIMAL(10,2)", "CAST(1.25 AS DECIMAL(10,2))", "DECIMAL(12,4)")
      probe(f, "DECIMAL(10,2)", "CAST(1.25 AS DECIMAL(10,2))", "DOUBLE")
    }
    spark.stop()
  }
}
