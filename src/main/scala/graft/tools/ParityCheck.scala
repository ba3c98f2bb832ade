package graft.tools
import org.apache.spark.sql.SparkSession
object ParityCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.registerAll(spark, sfDir)
    graft.queries.StreamParityQueries.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      fn(spark, sfDir).collect().foreach(r => println(s"[check] $n -> $r"))
    }
    spark.stop()
  }
}
