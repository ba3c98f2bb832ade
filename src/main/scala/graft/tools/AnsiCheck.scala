package graft.tools
import org.apache.spark.sql.SparkSession
object AnsiCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("[ansi] enabled=" + spark.conf.get("spark.sql.ansi.enabled"))
    try {
      val r = spark.sql("SELECT 10000000000 * 1103515245").collect()
      println("[ansi] overflow result: " + r.head.get(0))
    } catch { case e: Exception => println("[ansi] overflow threw: " + e.getMessage.take(100)) }
    try {
      val r = spark.sql("SELECT element_at(array(1,2,3), 5)").collect()
      println("[ansi] element_at OOB: " + r.head.get(0))
    } catch { case e: Exception => println("[ansi] element_at threw: " + e.getMessage.take(100)) }
    spark.stop()
  }
}
