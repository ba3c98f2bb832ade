package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost-curve probe for the candidate-generator family (r13, VERDICT item
  * 1): times the three steepest gates' operator pipelines at a given SF dir
  * AND measures the candidate/output cardinality of each in the same run —
  * so "growth tracks the candidate graph" is a measured statement, not an
  * estimate. Results land in PLANS.md.
  *
  * Probes:
  *  - minhash:  LSH banded candidate pairs (count) and Jaccard-verified
  *              near-dup pairs (count) over `documents` — the gate's
  *              candidate generator without the planted-copy fixture.
  *  - phash:    perceptual-hash banded near-dup pairs over the rendered
  *              text payloads (count).
  *  - interval: signup→purchase 30-minute interval join over `events`
  *              (output rows).
  *
  * Run: sbt "runMain graft.tools.CurveProbe <sfDir> [minhash,phash,interval] [runs]"
  */
object CurveProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val probes = args.lift(1).filter(_.nonEmpty)
      .map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set("minhash", "phash", "interval"))
    val nRuns = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(name: String)(f: => Long): Unit = {
      val runs = (1 to nRuns).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[curve] $sfDir $name%-28s best=${runs.map(_._1).min}%9.2f s  " +
        f"rows=${runs.head._2}%,d  (runs: ${runs.map(t => f"${t._1}%.2f").mkString(" / ")})")
    }

    if (probes("minhash") || probes("phash")) {
      val docs = graft.Tables.load(spark, sfDir, "documents")
      docs.count() // warm the scan so run 1 isn't an IO measurement
      if (probes("minhash")) {
        timed("minhash: LSH candidates") {
          graft.pipeline.Dedup.lshCandidatePairs(docs, "doc_id", "text").count()
        }
        timed("minhash: verified pairs") {
          graft.pipeline.Dedup.nearDuplicatePairs(docs, "doc_id", "text",
            threshold = 0.8).count()
        }
      }
      if (probes("phash")) {
        timed("phash: near-dup pairs") {
          val withBin = graft.pipeline.Multimodal.withBinaryPayload(docs, "text")
          graft.pipeline.Multimodal.phashNearDupPairs(
            withBin, "doc_id", "payload", maxHamming = 8).count()
        }
      }
    }
    if (probes("interval")) {
      val ev = graft.Tables.load(spark, sfDir, "events")
      ev.count()
      timed("interval: join output") {
        val a = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("event_id").as("signup_id"),
            col("ts").as("signup_ts"))
        val b = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("b_user_id"),
            col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
        a.join(b,
            col("user_id") === col("b_user_id")
              && col("purchase_ts") > col("signup_ts")
              && col("purchase_ts") <= col("signup_ts") + expr("INTERVAL 30 MINUTES"))
          .count()
      }
    }
    spark.stop()
  }
}
