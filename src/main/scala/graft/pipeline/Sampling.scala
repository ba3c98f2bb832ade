package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-mixing and sequence-packing operators for training-data
  * pipelines: deterministic per-source downsampling (data mixing weights)
  * and token-budget packing (concat-then-chunk, the standard pretraining
  * packing shape).
  *
  * Both are driven by per-row arithmetic or per-partition window sums — no
  * corpus-wide state, no RNG (resampling must be reproducible across reruns
  * and engines, so the sampling hash is a pure function of the id).
  */
object Sampling {

  /** Deterministic uniform hash of an id into [0, 1000): a linear
    * congruential mix, chosen over xxhash64 because it is exactly
    * expressible in plain SQL on any engine (the correctness oracle included)
    * while still decorrelating adjacent ids. Production pipelines can swap
    * in the registered xxhash64 kernel — the operator shape is identical. */
  def hashBucket(id: Column): Column =
    pmod(id.cast("long") * 1103515245L + 12345L, lit(2147483648L)) % 1000

  /** Source-mixing filter: keep each row with its source's sampling rate
    * (in thousandths, e.g. "src0" -> 1000 keeps all, "src1" -> 250 keeps
    * 25%). Deterministic: the same row is always kept or always dropped.
    * Unlisted sources fall back to `defaultRate`. Pure projection+filter —
    * runs at scan speed, prunes to (id, source). */
  def mixSources(
      df: DataFrame, idCol: String, sourceCol: String,
      ratesPerMille: Map[String, Int], defaultRate: Int = 1000): DataFrame = {
    val rate = ratesPerMille.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(sourceCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < rate)
  }

  /** Token-budget packing (concat-then-chunk): within each source, documents
    * are laid end-to-end in id order and cut into chunks of `budgetTokens`;
    * a document's chunk is where its first token lands. One window sum per
    * partition key — the same shape pretraining tokenizers use to pack
    * sequences, kept deterministic by the (source, id) ordering. */
  def packSequences(
      df: DataFrame, idCol: String, sourceCol: String, textCol: String,
      budgetTokens: Long = 2048L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the canonical corpus tokenization, shared with CorpusFilters
    val tokens = size(CorpusFilters.splitWords(col(textCol))).cast("bigint")
    val w = Window.partitionBy(col(sourceCol)).orderBy(col(idCol))
    df.select(col(idCol), col(sourceCol), tokens.as("n_tokens"))
      .withColumn("token_start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("chunk_id", floor(col("token_start") / budgetTokens))
      .select(col(idCol), col(sourceCol), col("n_tokens"),
        col("token_start"), col("chunk_id"))
  }
}
