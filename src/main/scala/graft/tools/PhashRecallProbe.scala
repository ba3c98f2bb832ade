package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured recall anchor for the pHash banding trade (r17 verdict #2).
  *
  * AUTO banding changed sf10's banding from 4x16 to 2x32 (500k rows >
  * 2^16), so the r16/r17 sf10 pair counts measure DIFFERENT bandings and
  * the recall claim rested on the pigeonhole containment pin alone. This
  * probe computes EXACT ground truth — all-pairs hamming <= maxH on a
  * bounded corpus sample (the full sf10 all-pairs is 1.25e11 comparisons;
  * a 40k sample is 8e8, exact and tractable) — then reports, for each
  * banding, per-radius recall of [[graft.pipeline.Multimodal.phashNearDupPairs]]
  * against that truth. Deterministic corpus + deterministic phash =>
  * exact, reproducible numbers.
  *
  * Usage: tools/runclass.sh graft.tools.PhashRecallProbe <dir> [sampleRows] [maxH]
  */
object PhashRecallProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PhashRecallProbe <sfDir> [sampleRows] [maxH]")
    val dir = args(0)
    val sample = args.lift(1).map(_.toInt).getOrElse(40000)
    val maxH = args.lift(2).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") < sample)
    val withBin = graft.pipeline.Multimodal.withBinaryPayload(docs, "text")
    val hashed = withBin.select(col("doc_id"),
      graft.pipeline.Multimodal.perceptualHash(col("payload")).as("ph")).cache()
    val n = hashed.count()
    // exact truth: all-pairs hamming via broadcast nested-loop cross join
    // (the one place a cross join is the HONEST tool: it IS the ground
    // truth the banded operator approximates)
    val a = hashed.select(col("doc_id").as("id_a"), col("ph").as("ph_a"))
    val b = hashed.select(col("doc_id").as("id_b"), col("ph").as("ph_b"))
    val truth = a.crossJoin(broadcast(b)).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("int").as("h"))
      .filter(col("h") <= maxH)
      .cache()
    val truthByH = truth.groupBy("h").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    println(s"[phash-recall] dir=$dir sample=$n maxH=$maxH truth_pairs=" +
      truthByH.values.sum + " byH=" +
      (0 to maxH).map(h => s"$h:${truthByH.getOrElse(h, 0L)}").mkString(","))
    Seq(4, 2, 1).foreach { bands =>
      val t0 = System.nanoTime()
      val got = graft.pipeline.Multimodal.phashNearDupPairs(
        withBin, "doc_id", "payload", maxHamming = maxH, bands = bands)
      val hit = truth.join(got.select(col("id_a"), col("id_b"), lit(1).as("__hit")),
          Seq("id_a", "id_b"), "left_outer")
        .groupBy("h").agg(count(lit(1)).as("n"), sum(coalesce(col("__hit"), lit(0))).as("r"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val sec = (System.nanoTime() - t0) / 1e9
      val tot = hit.map(_._2).sum
      val rec = hit.map(_._3).sum
      println(f"[phash-recall] bands=$bands total recall ${rec.toDouble / tot}%.4f " +
        f"($rec of $tot) in $sec%.1f s")
      hit.foreach { case (h, nh, rh) =>
        println(f"[phash-recall]   bands=$bands h=$h%2d n=$nh%8d recalled=$rh%8d recall=${rh.toDouble / nh}%.4f")
      }
    }
    spark.stop()
  }
}
