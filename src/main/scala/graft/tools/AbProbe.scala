package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Clean-host A/B for the two round-9 bench regressions (VERDICT r9 #1):
  * old vs new CUMULATE and IVF-assignment shapes in ONE JVM, best-of-3,
  * at the bench SF and session config. Results land in PLANS.md. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.AbProbe"
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def best3(name: String)(f: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"[ab] $name%-40s best=${runs.map(_._1).min}%.3f s  " +
        f"(runs: ${runs.map(t => f"${t._1}%.3f").mkString(" / ")})  result=${runs.head._2}")
    }

    import graft.operators.Windows
    val events = graft.Tables.load(spark, sfDir, "events")
    events.count() // warm the scan
    val aggs = Seq(Windows.CumAgg.count("cnt"), Windows.CumAgg.dsum("value", "sum_value"))
    best3("cumulate two-phase (r9 gate shape)") {
      Windows.cumulativeAgg(events, "ts", 900, 3600, Seq("event_type"), aggs).count()
    }
    best3("cumulate row-expansion (r7 gate shape)") {
      Windows.cumulate(events, "ts", 900, 3600)
        .groupBy(col("window_start"), col("window_end"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          expr("cast(sum(cast(value as decimal(18,4))) as double)").as("sum_value"))
        .count()
    }

    val e = graft.Tables.load(spark, sfDir, "embeddings")
    e.count()
    val centroids = Similarity.kmeansCentroids(e, "vec_id", "embedding", 16)
    best3("ivf assign argmax-kernel (r10)") {
      Similarity.ivfAssign(e, "vec_id", "embedding", centroids)
        .groupBy("centroid_id").count().count()
    }
    best3("ivf assign struct-greatest (r9)") {
      Similarity.ivfAssignGreatest(e, "vec_id", "embedding", centroids)
        .groupBy("centroid_id").count().count()
    }
    best3("q_sim_topk_ivf gate end-to-end") {
      graft.SparkEntry.queries("q_sim_topk_ivf")(spark, sfDir).count()
    }
    spark.stop()
  }
}
