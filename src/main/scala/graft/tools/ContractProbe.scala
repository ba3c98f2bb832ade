package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.{CorpusFilters, Dedup}

/** Measures the margins behind the r11 oracle-contract booleans so the
  * gated thresholds are recorded numbers, not guesses:
  *   - HLL relative error vs exact COUNT(DISTINCT) per l_returnflag
  *     (gate: q_agg_approx_distinct, bound 0.10)
  *   - planted near-copy LSH connectivity recall
  *     (gate: q_dedup_minhash_lsh, floor 0.8)
  * Run: sbt "runMain graft.tools.ContractProbe sf0.001 sf0.01 sf0.1"
  */
object ContractProbe {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    for (sf <- args) {
      val dir = s"/root/testdata/$sf"
      val hll = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("a"),
          countDistinct(col("l_partkey")).as("e"))
        .select(max(abs(col("a") - col("e")).cast("double") / col("e")))
        .head().getDouble(0)
      val docs = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
      val base = docs.filter(col("doc_id") < 50 && length(col("text")) >= 100)
      val corpus = docs
        .union(base.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        .union(base.select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" qq")).as("text")))
      val clusters = CorpusFilters.duplicateGroups(
        Dedup.lshCandidatePairs(corpus, "doc_id", "text"))
      def clusterOf(off: Long, as: String) =
        base.select(col("doc_id").as("orig_id"), (col("doc_id") + off).as("doc_id"))
          .join(clusters, Seq("doc_id"), "left_outer")
          .select(col("orig_id"), col("cluster_id").as(as))
      val rec = clusterOf(0L, "c0").join(clusterOf(2000000L, "c2"), "orig_id")
        .select(avg((col("c0").isNotNull && col("c0") === col("c2"))
          .cast("double")))
        .head().getDouble(0)
      // semantic-dedup near-copy connectivity recall (gate:
      // q_dedup_semantic, floor 0.8)
      val e = Tables.load(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val ebase = e.filter(col("vec_id") < 50)
      val ecorpus = e
        .union(ebase.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
        .union(ebase.select((col("vec_id") + 2000000L).as("vec_id"),
          expr("transform(embedding, (x, i) -> cast(x + " +
            "(pmod(hash(vec_id, i), 7) - 3) * cast(0.001 as float) as float))")
            .as("embedding")))
      val eclusters = CorpusFilters.duplicateGroups(
        Dedup.semanticCandidatePairs(ecorpus, "vec_id", "embedding",
          nCentroids = 16, maxCluster = 256))
        .withColumnRenamed("doc_id", "vec_id")
      def eClusterOf(off: Long, as: String) =
        ebase.select(col("vec_id").as("orig_id"), (col("vec_id") + off).as("vec_id"))
          .join(eclusters, Seq("vec_id"), "left_outer")
          .select(col("orig_id"), col("cluster_id").as(as))
      val erec = eClusterOf(0L, "c0").join(eClusterOf(2000000L, "c2"), "orig_id")
        .select(avg((col("c0").isNotNull && col("c0") === col("c2"))
          .cast("double")))
        .head().getDouble(0)
      println(f"PROBE $sf hll_max_rel_err=$hll%.4f near_copy_recall=$rec%.3f " +
        f"semantic_near_recall=$erec%.3f")
    }
    s.stop()
  }
}
