package graft.tools

import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Dev probe: prints per-query and average recall@10 of the IVF and LSH
  * ANN paths vs brute force on an sf dir's embeddings — used to pick the
  * thresholds asserted by the `q_sim_recall` gate (they must hold at every
  * SF the driver sweeps). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val e = graft.Tables.load(spark, dir, "embeddings")
      val q = e.filter(col("vec_id") < 20)
      def ids(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = ids(Similarity.bruteForceTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 10))
      val ivf = ids(Similarity.ivfTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 10,
        nCentroids = 16, nProbe = 4))
      val lsh = ids(Similarity.lshTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 10,
        nBits = sys.env.getOrElse("PROBE_NBITS", "8").toInt))
      def recalls(ann: Set[(Long, Long)]): Seq[Double] =
        brute.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, b) =>
          b.count(ann.contains).toDouble / b.size
        }
      val ri = recalls(ivf); val rl = recalls(lsh)
      println(f"[probe] $dir ivf min=${ri.min}%.2f avg=${ri.sum / ri.size}%.2f " +
        f"lsh min=${rl.min}%.2f avg=${rl.sum / rl.size}%.2f")
    }
    spark.stop()
  }
}
