package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dumps `.explain("formatted")` for representative queries — the plan-audit
  * artifact behind PLANS.md. Run:
  *   sbt "runMain graft.tools.PlanAudit /root/testdata/sf0.01"
  */
object PlanAudit {
  val audited: Seq[String] = Seq(
    "q_agg_pricing_summary",  // scan + partial/final hash agg
    "q_join_orders_nation",   // broadcast joins
    "q_join_interval",        // sort-merge + range predicates
    "q_join_asof",            // single shuffle + window carry-forward
    "q_tumble_agg",           // window projection + hash agg
    "q_dedup_minhash_lsh",    // kernel expr + band shuffle + self-join
    "q_sim_topk_brute",       // broadcast queries + windowed top-k
    "q_cep_low_runs",         // secondary sort + mapPartitions NFA
    "q_fn_regex",             // pushdown + codegen'd functions
    "q_boilerplate_ngrams",   // r3: kernel explode + map-side-combined agg
    "q_decontaminate",        // r3: broadcast semi join on eval grams
    "q_corpus_quality_gate",  // r3: one-pass quality_stats kernel projection
    "q_tfidf_top_terms",      // r3: two aggs + broadcast N + top-k window
    "q_sim_topk_lsh",         // r3: signature buckets + multi-probe broadcast
    "q_mix_sources",          // r3: scan-speed deterministic sample
    "q_flink_window_join",    // r5: two windowed aggs joined, shared keys
    "q_text_pii",             // r5: codegen regex projection
    "q_chunk_docs",           // r5: narrow generate+slice explode
    "q_lm_unigram",           // r5: word_counts kernel, per-(doc,term) joins
    "q_dedup_spans",          // r5b: kernel shingles + gram shuffle + window union
    "q_strip_boilerplate",    // r5b: line shuffle + anti join + ordered rebuild
    "q_multimodal_phash_pairs", // r5b: phash kernel + band blocking + hamming
    "q_global_shuffle",       // r5b: range-partitioned total sort on seeded key
    "q_corpus_quantiles",     // r5b: one window sort per group
    "q_subq_quantified",      // r6: scalar-aggregate subqueries, reuse expected
    "q_dedup_incremental",    // r6: bloom prefilter + broadcast-only joins
    "q_cep_define_nav",       // r6: dynamic DEFINE, still one exchange
    "q_dedup_incremental_bucketed", // r7: bucketed digest scan, one Exchange
    "q_sim_recall",           // r7: brute NLJ + IVF + LSH + semi-join recall
    "q_join_right_outer",     // r7: shuffled right-outer + agg, reused exchange
    "q_cumulate_agg",         // r9: two-phase cumulate — Generate above Aggregate
    "q_flink_cumulate",       // r9: same via the CumulateTwoPhase optimizer rule
    "q_hop_agg",              // r9: pane-based hop — explode on pane partials
    "q_sim_index_parity",     // r9: persisted IVF probe (DPP on centroid_id)
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    audited.foreach { name =>
      println(s"\n########## $name ##########")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
