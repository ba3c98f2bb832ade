package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index for embedding similarity search.
  *
  * [[Similarity.ivfTopK]] trains centroids and assigns the corpus on every
  * call — right for ad-hoc queries, wrong for the 100 TB serving shape where
  * the corpus is indexed ONCE and probed by many query batches. This module
  * splits the lifecycle:
  *
  *  - [[build]]: train centroids (bounded sample, driver Lloyd's) + one
  *    linear assignment pass over the corpus — the only full scan.
  *  - [[save]]: centroids as plain parquet; assignments PARTITIONED BY
  *    centroid_id. Each IVF bucket is its own parquet directory, so a probe
  *    of nProbe buckets is a partition-pruned scan reading nProbe/C of the
  *    index — the scan cost the in-memory path can only approximate with a
  *    shuffle.
  *  - [[load]] + [[probe]]: query batches hit only their probed partitions;
  *    the probe set (queries × centroids) stays a broadcast.
  *
  * The probe itself ([[Similarity.probeAssigned]]) is shared with
  * `ivfTopK`, so persisted and in-memory paths return identical rows for
  * the same centroids/assignment (spec-pinned, plus an oracle-paired parity
  * gate `q_sim_index_parity`).
  */
object IvfIndex {

  /** Train + assign. Returns (centroids, assigned); `assigned` carries
    * (vec_id, v, centroid_id). */
  def build(vectors: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int = 16, kmeansIters: Int = 3, trainLimit: Int = 4096)
      : (DataFrame, DataFrame) = {
    val centroids = Similarity.kmeansCentroids(
      vectors, idCol, vecCol, nCentroids, kmeansIters, trainLimit)
    (centroids, Similarity.ivfAssign(vectors, idCol, vecCol, centroids))
  }

  /** Write the index under `dir`: `centroids/` plain, `assigned/`
    * partitioned by centroid_id (one directory per IVF bucket). */
  def save(dir: String, centroids: DataFrame, assigned: DataFrame): Unit = {
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    assigned.write.mode("overwrite")
      .partitionBy("centroid_id").parquet(s"$dir/assigned")
  }

  def load(spark: SparkSession, dir: String): (DataFrame, DataFrame) = (
    spark.read.parquet(s"$dir/centroids"),
    spark.read.parquet(s"$dir/assigned"))

  /** ANN top-k against a loaded (or freshly built) index. The broadcast
    * probe-set join on the partition column lets dynamic partition pruning
    * skip every unprobed bucket directory. */
  def probe(centroids: DataFrame, assigned: DataFrame,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, nProbe: Int = 4): DataFrame =
    Similarity.probeAssigned(centroids, assigned,
      queries, queryIdCol, queryVecCol, k, nProbe)
}
