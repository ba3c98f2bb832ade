package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.Gateway

/** r14: csv files are POSITIONAL — does position-changing schema evolution
  * (ADD FIRST, DROP mid-list, MODIFY reposition) silently misread old
  * files? json binds by name (safe); avro container reads by field name. */
object CsvEvolveProbe {
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
      println(s"== ${s.take(80)}\n   -> ${p.columns.take(8)} ${p.rows.take(4).map(_.take(8))}")
      p
    }
    def mk(t: String, fmt: String): Unit = {
      val dir = java.nio.file.Files.createTempDirectory(s"probe-ce-$t").toString
      run(s"CREATE TABLE $t (a INT, b STRING, c DOUBLE) WITH ('connector'='filesystem','path'='$dir','format'='$fmt')")
      run(s"INSERT INTO $t VALUES (1, 'x', 1.5)")
    }
    mk("ce1", "csv"); run("ALTER TABLE ce1 ADD z BIGINT FIRST")
    println("-- csv ADD FIRST over old 3-col rows:")
    run("SELECT * FROM ce1")
    mk("ce2", "csv"); run("ALTER TABLE ce2 DROP b")
    println("-- csv DROP mid-list over old 3-col rows:")
    run("SELECT * FROM ce2")
    mk("ce3", "csv"); run("ALTER TABLE ce3 MODIFY c DOUBLE FIRST")
    println("-- csv MODIFY reposition over old rows:")
    run("SELECT * FROM ce3")
    mk("ce4", "csv"); run("ALTER TABLE ce4 ADD z BIGINT")
    println("-- csv ADD at END (should be safe):")
    run("SELECT * FROM ce4")
    mk("ce5", "json"); run("ALTER TABLE ce5 ADD z BIGINT FIRST")
    println("-- json ADD FIRST (by-name: safe):")
    run("SELECT * FROM ce5")
    mk("ce6", "avro"); run("ALTER TABLE ce6 DROP b")
    println("-- avro DROP mid-list (by-name reader: safe):")
    run("SELECT * FROM ce6")
    mk("ce7", "orc"); run("ALTER TABLE ce7 DROP b")
    println("-- orc DROP mid-list:")
    run("SELECT * FROM ce7")
    mk("ce8", "parquet"); run("ALTER TABLE ce8 MODIFY c DOUBLE FIRST")
    println("-- parquet MODIFY reposition:")
    run("SELECT * FROM ce8")
    spark.stop()
  }
}
