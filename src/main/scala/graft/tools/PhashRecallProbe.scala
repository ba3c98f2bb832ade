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

    // ---- 128-bit hash: per-radius recall against ITS exact truth (r19) --
    // Same exact-truth construction in the 128-bit space, radius 2*maxH
    // (the operator's default margin). The corpus-scale banding 4x32 keeps
    // containment to radius 3 where the 64-bit corpus banding (2x32) only
    // reaches radius 1 — this section anchors the probabilistic tail too.
    val maxH128 = 2 * maxH
    val hashed128 = withBin.select(col("doc_id"),
        graft.pipeline.Multimodal.perceptualHash128(col("payload")).as("ph"))
      .select(col("doc_id"),
        element_at(col("ph"), 1).as("w0"), element_at(col("ph"), 2).as("w1"))
      .cache()
    hashed128.count()
    val a128 = hashed128.select(col("doc_id").as("id_a"),
      col("w0").as("a0"), col("w1").as("a1"))
    val b128 = hashed128.select(col("doc_id").as("id_b"),
      col("w0").as("b0"), col("w1").as("b1"))
    val truth128 = a128.crossJoin(broadcast(b128)).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (bit_count(col("a0").bitwiseXOR(col("b0"))) +
          bit_count(col("a1").bitwiseXOR(col("b1")))).cast("int").as("h"))
      .filter(col("h") <= maxH128)
      .cache()
    val truth128ByH = truth128.groupBy("h").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    println(s"[phash128-recall] dir=$dir sample=$n maxH=$maxH128 truth_pairs=" +
      truth128ByH.values.sum + " byH=" +
      (0 to maxH128).map(h => s"$h:${truth128ByH.getOrElse(h, 0L)}").mkString(","))
    Seq(8, 4, 2).foreach { bands =>
      val t0 = System.nanoTime()
      val got = graft.pipeline.Multimodal.phash128NearDupPairs(
        withBin, "doc_id", "payload", maxHamming = maxH128, bands = bands)
      val hit = truth128.join(got.select(col("id_a"), col("id_b"), lit(1).as("__hit")),
          Seq("id_a", "id_b"), "left_outer")
        .groupBy("h").agg(count(lit(1)).as("n"), sum(coalesce(col("__hit"), lit(0))).as("r"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val sec = (System.nanoTime() - t0) / 1e9
      val tot = hit.map(_._2).sum
      val rec = hit.map(_._3).sum
      println(f"[phash128-recall] bands=$bands total recall ${rec.toDouble / tot}%.4f " +
        f"($rec of $tot) in $sec%.1f s")
      hit.foreach { case (h, nh, rh) =>
        println(f"[phash128-recall]   bands=$bands h=$h%2d n=$nh%8d recalled=$rh%8d recall=${rh.toDouble / nh}%.4f")
      }
    }

    // ---- planted-near-dup end-to-end: 64-bit 2x32 vs 128-bit 4x32 (r19) --
    // Hash-space truth conflates genuine near-dups with structural
    // collisions (unrelated docs of the same byte statistics sit at 64-bit
    // hamming 4-8 on this corpus). This section measures the contract that
    // matters: plant seeded byte-value edits, ask each operator at its
    // corpus-scale banding and default radius whether the original pairs
    // with its perturbed copy.
    import spark.implicits._
    val baseDocs = docs.select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= 100).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    Seq(4, 8, 16).foreach { edits =>
      val rng = new java.util.Random(20260817L + edits)
      val planted = baseDocs.map { case (id, text) =>
        val c = text.getBytes("UTF-8")
        (0 until edits).foreach(_ =>
          c(rng.nextInt(c.length)) = (32 + rng.nextInt(95)).toByte)
        (id + 10000000L, new String(c, "UTF-8"))
      }
      val all = graft.pipeline.Multimodal.withBinaryPayload(
        (baseDocs ++ planted).toSeq.toDF("doc_id", "text"), "text")
      val wanted = baseDocs.map { case (id, _) => (id, id + 10000000L) }.toSet
      def recallOf(pairs: org.apache.spark.sql.DataFrame): Double = {
        val got = pairs.select(col("id_a"), col("id_b"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        wanted.count(got.contains).toDouble / wanted.size
      }
      val r64 = recallOf(graft.pipeline.Multimodal.phashNearDupPairs(
        all, "doc_id", "payload", maxHamming = maxH, bands = 2))
      val r128 = recallOf(graft.pipeline.Multimodal.phash128NearDupPairs(
        all, "doc_id", "payload", maxHamming = maxH128, bands = 4))
      println(f"[phash-planted] edits=$edits%2d n=${wanted.size} " +
        f"recall 64-bit 2x32=$r64%.4f 128-bit 4x32=$r128%.4f")
    }
    spark.stop()
  }
}
