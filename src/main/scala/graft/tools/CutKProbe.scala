package graft.tools

import org.apache.spark.sql.SparkSession

/** r16 (VERDICT item 7): the substring-dedup cut operator's kernel-vs-
  * substring cost curve at REALISTIC window sizes. Lee et al. 2022 dedup at
  * ~50-token spans; the r15 measurement compared the identities at k=20
  * only (kernel ~5x cheaper at sf10). Larger k shrinks the gram count per
  * doc (fewer windows) but grows each substring gram LINEARLY in k — the
  * substring identity shuffles k bytes per occurrence while the 128-bit
  * kernel stays at 16 bytes whatever k is, so the gap should WIDEN with k.
  *
  * Usage: SPARK_GRAFT_SF_DIR=target/sf10f runMain graft.tools.CutKProbe
  * Forces full evaluation with the SweepScale reduction (count+bit_xor of
  * xxhash64 over every column); prints one line per (k, identity). */
object CutKProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf10f")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.load(spark, sfDir, "documents")
    def once(k: Int, kernel: Boolean): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val df = graft.pipeline.Dedup.cutDuplicatedSpans(
        docs, "doc_id", "text", k = k, useKernel = kernel)
      val row = df.agg(count(lit(1)).as("n"),
        expr(df.columns.map(c => s"cast(`$c` as string)")
          .mkString("bit_xor(xxhash64(", ", ", "))")).as("h"),
        sum(col("removed_chars")).as("rm"))
        .collect()(0)
      ((System.nanoTime() - t0) / 1e9, row.getLong(0), row.getLong(2))
    }
    // warm: one tiny run per path compiles the kernels
    once(200, kernel = true); once(200, kernel = false)
    Seq(20, 50, 100).foreach { k =>
      Seq(true, false).foreach { kernel =>
        // best-of-2: one-off host stalls must not write the table
        val passes = Seq(once(k, kernel), once(k, kernel))
        val (sec, n, rm) = passes.minBy(_._1)
        val id = if (kernel) "kernel128" else "substring"
        println(f"[cutk] k=$k%-4d $id%-10s $sec%8.2f s  rows=$n%10d removed_chars=$rm%14d" +
          f"  (passes ${passes.map(p => f"${p._1}%.2f").mkString("/")})")
      }
    }
    spark.stop()
  }
}
