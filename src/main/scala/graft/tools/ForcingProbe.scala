package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the sweep's forcing reduction on q_corpus_repetition
  * (r17 verdict #7): its ~12x decade ratio survived the 16 GB heap
  * re-probe, so the residual suspect is the FORCING — the
  * bit_xor(xxhash64(cast(every col as string))) fold casts one bigint and
  * four doubles to strings per row (Java double formatting is slow), and
  * that cost scales with output rows, not corpus bytes.
  *
  * Variants (all force complete evaluation of every column — no join
  * elimination, no column pruning):
  *   cast    — the status-quo fold (cast-to-string then xxhash64);
  *   native  — xxhash64 over the columns DIRECTLY (same shape, no casts;
  *             xxhash64 hashes native binary representations);
  *   arith   — count + per-column numeric folds (sum/bit_xor) — the
  *             cheapest sink that still consumes every column.
  *
  * Usage: tools/runclass.sh graft.tools.ForcingProbe <dir> [<dir> ...]
  */
object ForcingProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ForcingProbe <sfDir> [<sfDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def gate(dir: String): DataFrame =
      graft.pipeline.CorpusFilters.repetitionStats(
        graft.Tables.load(spark, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    def timeIt(label: String, dir: String)(mk: DataFrame => DataFrame): Unit =
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        val r = mk(gate(dir)).collect()(0)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[forcing] $dir%-18s $label%-8s pass$pass $sec%8.2f s  n=${r.getLong(0)}")
      }
    args.foreach { dir =>
      // warm page cache via one untimed pass
      gate(dir).agg(count(lit(1))).collect()
      timeIt("cast", dir)(df => df.agg(count(lit(1)).as("n"),
        expr(df.columns.map(c => s"cast(`$c` as string)")
          .mkString("bit_xor(xxhash64(", ", ", "))")).as("h")))
      timeIt("native", dir)(df => df.agg(count(lit(1)).as("n"),
        expr(df.columns.mkString("bit_xor(xxhash64(", ", ", "))")).as("h")))
      timeIt("arith", dir)(df => df.agg(count(lit(1)).as("n"),
        expr("bit_xor(xxhash64(doc_id))").as("h1"),
        sum(col("n_words")).as("s1"),
        sum(col("dup_line_frac") + col("dup_word_frac") +
          col("top_2gram_frac") + col("dup_5gram_frac")).as("s2")))
    }
    spark.stop()
  }
}
