package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timer for a subset of SparkEntry gates — full Bench runs all ~126
  * queries; iterating on one operator's cost needs just its gates.
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.TimeQueries q_stream_parity"`
  * times every query whose name contains any of the given substrings, with
  * the same session config + warmup + best-of-2 policy as graft.Bench.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.registerAll(spark, sfDir)
    graft.functions.FlinkFunctions.registerAll(spark)
    spark.sql("SELECT count(*) FROM nation").collect()
    val wanted = if (args.isEmpty) Seq("") else args.toSeq
    val selected = graft.SparkEntry.queries.filter { case (n, _) =>
      wanted.exists(n.contains) }
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val (a, b) = (once(), once())
      println(f"[time] $name%-32s best=${math.min(a, b)}%.3f s  (runs: $a%.3f / $b%.3f)")
    }
    spark.stop()
  }
}
