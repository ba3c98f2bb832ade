package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Clean-host A/B for driver-bench outliers: suspect shapes in ONE JVM,
  * best-of-3, at the bench SF and session config. Results land in
  * PLANS.md. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.AbProbe"
  * With AB_GATES=q_a,q_b set, times those SparkEntry gates end-to-end
  * instead of the round-10 shape comparisons (round-11 attribution mode).
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.wholeStage", sys.env.getOrElse("AB_WSCG", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nRuns = sys.env.getOrElse("AB_RUNS", "3").toInt
    def best3(name: String)(f: => Long): Unit = {
      val runs = (1 to nRuns).map { _ =>
        val t0 = System.nanoTime()
        val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"[ab] $name%-40s best=${runs.map(_._1).min}%.3f s  " +
        f"(runs: ${runs.map(t => f"${t._1}%.3f").mkString(" / ")})  result=${runs.head._2}")
    }

    sys.env.get("AB_GATES").foreach { names =>
      // warm the scans the gates read so run 1 isn't an IO measurement
      Seq("documents", "events").foreach(t => graft.Tables.load(spark, sfDir, t).count())
      if (sys.env.contains("AB_WARM_MINHASH")) {
        val docs = graft.Tables.load(spark, sfDir, "documents")
        best3("warm: minhash signature only") {
          docs.select(graft.pipeline.Dedup.minhashSignature(col("text")).as("sig"))
            .agg(count(lit(1))).collect().head.getLong(0)
        }
        best3("warm: lsh candidate pairs") {
          graft.pipeline.Dedup.lshCandidatePairs(docs, "doc_id", "text").count()
        }
        best3("warm: jaccard verify only") {
          val j = graft.pipeline.Dedup.ngramJaccard(col("a"), col("b"), 9)
          docs.limit(300).select(col("text").as("a"), col("text").as("b"))
            .select(j.as("j")).agg(count(lit(1))).collect().head.getLong(0)
        }
      }
      names.split(",").map(_.trim).filter(_.nonEmpty).foreach { q =>
        best3(q) { graft.SparkEntry.queries(q)(spark, sfDir).count() }
      }
      spark.stop()
      return
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
