package graft.tools

import org.apache.spark.sql.SparkSession

/** r14: why does q_subq_in run 18.6x at 10x data (sf10f->sf100f)?
  * Prints the executed plan skeleton + timings at both decades, and an A/B
  * isolating the global ORDER BY from the semi join. */
object SubqInProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.FlinkFunctions.registerAll(spark)
    for (dir <- Seq("target/sf10f", "target/sf100f")) {
      graft.Tables.registerAll(spark, dir)
      val q = """SELECT o_orderkey, o_custkey FROM orders
                |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
                |ORDER BY o_orderkey""".stripMargin
      val noSort = q.replace("ORDER BY o_orderkey", "")
      def time(sql: String): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = spark.sql(sql).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (tFull, n1) = time(q)
      val (tNoSort, _) = time(noSort)
      val plan = spark.sql(q).queryExecution.executedPlan.toString
      val joins = plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange") || l.contains("Sort")).take(12)
      println(s"== $dir  full=${f"$tFull%.2f"}s  noSort=${f"$tNoSort%.2f"}s  rows=$n1")
      joins.foreach(l => println("   " + l.trim.take(120)))
    }
    spark.stop()
  }
}
