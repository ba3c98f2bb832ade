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

    if (probes("minhash") || probes("phash") || probes("phash_hist")
        || probes("phash_gen")) {
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
      if (probes("phash_hist")) {
        // candidate-graph census WITHOUT generating the pairs: the banded
        // bucket histogram and the implied candidate count under the skew
        // cap (all-pairs n(n-1)/2 at or under the cap, star n-1 above it).
        // At decades where the pair set itself would out-shuffle the
        // sandbox disk, this is the measured cardinality the curve table
        // records — the same blocking key the operator shuffles on.
        timed("phash: bucket census") {
          val withBin = graft.pipeline.Multimodal.withBinaryPayload(docs, "text")
          val h = withBin.select(col("doc_id").as("id"),
            graft.pipeline.Multimodal.perceptualHash(col("payload")).as("ph"))
          val banded = h.select(col("id"), posexplode(
            array((0 until 4).map(b => shiftrightunsigned(col("ph"), b * 16)
              .bitwiseAND(lit(0xffffL))): _*)).as(Seq("band", "bucket")))
          val hist = banded.groupBy("band", "bucket").count()
            .agg(
              count(lit(1)).as("buckets"),
              max(col("count")).as("max_bucket"),
              sum(when(col("count") > 10000, 1L).otherwise(0L)).as("capped"),
              sum(when(col("count") <= 10000,
                  col("count") * (col("count") - 1) / 2)
                .otherwise(col("count") - 1)).cast("long").as("cand_under_cap"),
              sum(col("count") * (col("count") - 1) / 2).cast("long").as("cand_cap_free"))
            .head()
          println(s"[curve]   buckets=${hist.getLong(0)} max=${hist.getLong(1)} " +
            s"capped=${hist.getLong(2)} cand_under_cap=${hist.getLong(3)} " +
            s"cand_cap_free=${hist.getLong(4)}")
          hist.getLong(3)
        }
      }
      if (probes("phash_gen")) {
        // times the candidate GENERATION + hamming verify with the final
        // distinct left off — the count aggregates map-side, so this stage
        // is measurable even at decades where the distinct pair set itself
        // would out-shuffle a single node's disk (on a real cluster that
        // last exchange is spread over the fleet; here it is the bound).
        // Mirrors Dedup.bandedPairs pre-distinct (all-pairs at or under the
        // cap, star edges above it) + the gate's hamming<=8 filter; counts
        // carry band multiplicity (a pair surviving in k bands counts k
        // times, k<=4), so it upper-bounds the distinct output.
        timed("phash: survivors pre-distinct") {
          import org.apache.spark.sql.expressions.Window
          val withBin = graft.pipeline.Multimodal.withBinaryPayload(docs, "text")
          val h = withBin.select(col("doc_id").as("id"),
            graft.pipeline.Multimodal.perceptualHash(col("payload")).as("ph"))
          val banded = h.select(col("id"), col("ph"), posexplode(
            array((0 until 4).map(b => shiftrightunsigned(col("ph"), b * 16)
              .bitwiseAND(lit(0xffffL))): _*)).as(Seq("band", "bucket")))
          val w = Window.partitionBy(col("band"), col("bucket"))
          val wOrd = w.orderBy(col("id"))
          val ann = banded
            .withColumn("bucket_n", count(lit(1)).over(w))
            .withColumn("rep_id", min(col("id")).over(w))
            .withColumn("rep_ph", first(col("ph")).over(wOrd))
          val small = ann.filter(col("bucket_n") <= 10000)
          val allPairs = small.as("a").join(small.as("b"),
              col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
                && col("a.id") < col("b.id"))
            .select(col("a.ph").as("ph_a"), col("b.ph").as("ph_b"))
          val star = ann.filter(col("bucket_n") > 10000)
            .filter(col("rep_id") < col("id"))
            .select(col("rep_ph").as("ph_a"), col("ph").as("ph_b"))
          allPairs.union(star)
            .filter(bit_count(col("ph_a").bitwiseXOR(col("ph_b"))) <= 8)
            .count()
        }
      }
    }
    if (probes("semantic")) {
      // SemDeDup family at scale: centroids sized O(√N) per the operator's
      // own rule, so expected cluster size stays constant and candidates
      // stay linear — the measured numbers check exactly that.
      val emb = graft.Tables.load(spark, sfDir, "embeddings")
      val n = emb.count()
      val k = math.max(16, math.sqrt(n.toDouble).toInt)
      timed(s"semantic: candidates k=$k") {
        graft.pipeline.Dedup.semanticCandidatePairs(
          emb, "vec_id", "embedding", nCentroids = k, maxCluster = 256).count()
      }
      timed("semantic: verified pairs") {
        graft.pipeline.Dedup.semanticNearDupPairs(
          emb, "vec_id", "embedding", threshold = 0.95,
          nCentroids = k, maxCluster = 256).count()
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
