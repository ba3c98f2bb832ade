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
    * in the registered xxhash64 kernel — the operator shape is identical.
    *
    * The id is reduced to 31 bits BEFORE the multiply: ANSI mode (Spark 4's
    * default) makes Long overflow a runtime error, and id·1103515245
    * overflows past |id| ≈ 8.4e9 — squarely inside the id range of a 100 TB
    * corpus. After reduction the worst case is (2^31+2^31)·1103515245 ≈
    * 4.7e18 < 2^63. Values are unchanged for ids < 2^31.
    *
    * `salt` decorrelates CHAINED sampling stages: two stages sharing the
    * unsalted hash select nested subsets (the second stage keeps 100% or
    * rate2/rate1 of the first — never an independent rate2 sample). Each
    * distinct operation in a pipeline should pass its own salt. */
  def hashBucket(id: Column, salt: Long = 0L): Column = {
    val saltMix = java.lang.Math.floorMod(salt * 2654435761L, 2147483648L)
    pmod((pmod(id.cast("long"), lit(2147483648L)) + lit(saltMix)) * 1103515245L
      + 12345L, lit(2147483648L)) % 1000
  }

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
    // ROWS, not the default RANGE frame: RANGE sums ALL peer rows of the
    // current order value, so duplicate ids within a source would produce
    // overlapping token_start values instead of end-to-end packing
    val w = Window.partitionBy(col(sourceCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(sourceCol), tokens.as("n_tokens"))
      .withColumn("token_start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("chunk_id", floor(col("token_start") / budgetTokens))
      .select(col(idCol), col(sourceCol), col("n_tokens"),
        col("token_start"), col("chunk_id"))
  }

  /** Per-document chunking with overlap (the long-context sibling of
    * [[packSequences]]): each document is cut into windows of `maxTokens`
    * whitespace tokens advancing by `maxTokens - overlap`, so consecutive
    * chunks share `overlap` tokens of context. Pure per-row generate+slice —
    * a narrow explode, no shuffle, no state; empty docs yield no chunks. */
  def chunkDocs(
      df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens); got overlap=$overlap max=$maxTokens")
    val step = maxTokens - overlap
    val toks = CorpusFilters.splitWords(col(textCol))
    val nChunks = greatest(lit(1),
      ceil((size(col("__toks")) - lit(overlap)).cast("double") / step).cast("int"))
    val start = col("chunk_id") * step + 1 // slice is 1-based
    df.select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id").cast("bigint").as("chunk_id"),
        concat_ws(" ", slice(col("__toks"), start, lit(maxTokens))).as("chunk_text"),
        size(slice(col("__toks"), start, lit(maxTokens)))
          .cast("bigint").as("chunk_tokens"))
  }

  /** Deterministic global training-order shuffle: every row gets a
    * `shuffle_key` from a seeded LCG mix of its id, and the corpus is
    * totally ordered by (shuffle_key, id). At cluster scale the ORDER BY is
    * a range-partitioned sort (sampled boundaries, no single-reducer
    * bottleneck, no materialized global rank) and the epoch order is
    * reproducible on any engine from (seed, id) alone — no RNG state, no
    * driver coordination. A new seed is a new permutation of the same data. */
  def shuffleOrder(df: DataFrame, idCol: String, seed: Long): DataFrame = {
    // LCG → XOR with a seed-derived mask → LCG. The XOR is what makes seeds
    // matter: any purely affine use of the seed (k = id·a + b + s, more
    // affine rounds, even a seed-perturbed multiplier) shifts keys by a
    // constant or by less than the typical key gap and leaves the ORDER
    // unchanged. XOR-ing a full-width mask between two multiplies scrambles
    // the relative order per seed. All three steps are plain-SQL-portable
    // (xor + modular arithmetic, no engine hash function).
    val mask = java.lang.Math.floorMod(seed * 2654435761L, 2147483648L)
    // same 31-bit pre-reduction as hashBucket — ANSI overflow safety at
    // production id ranges, value-identical below 2^31
    val k1 = pmod(pmod(col(idCol).cast("long"), lit(2147483648L)) * 1103515245L
      + 12345L, lit(2147483648L))
    // withColumn, not select: the point is ordering the TRAINING DATA, so
    // every corpus column rides along — no re-join needed downstream
    df.withColumn("shuffle_key",
        pmod(k1.bitwiseXOR(lit(mask)) * 69069L + 1L, lit(2147483648L)))
      .orderBy(col("shuffle_key"), col(idCol))
  }

  /** Source balancing: deterministically downsample each source to at most
    * ~`capTokens` whitespace tokens, so no single source dominates the mix.
    * The per-source rate is derived from the ACTUAL token totals —
    * rate‰ = min(1000, ⌊1000·cap/total⌋), pure integer division — then
    * applied with the same engine-portable id hash as [[mixSources]]. Two
    * aggregates over (source) — a tiny broadcast side — plus a scan-speed
    * filter; the kept token count is approximate (hash sampling), which is
    * the standard trade for a single-pass, coordination-free cap. */
  def capSourceTokens(
      df: DataFrame, idCol: String, sourceCol: String, textCol: String,
      capTokens: Long): DataFrame = {
    val tokens = size(CorpusFilters.splitWords(col(textCol))).cast("bigint")
    // greatest(total, 1): an all-empty-text source has total_tokens = 0 and
    // integer `div` would yield NULL, which least() skips — silently keeping
    // everything; clamping to 1 keeps the zero-token source fully (it costs
    // no budget) through arithmetic instead of a NULL leak
    val rates = df.select(col(sourceCol), tokens.as("n_tokens"))
      .groupBy(sourceCol).agg(sum(col("n_tokens")).as("total_tokens"))
      .withColumn("rate_mille", least(lit(1000L),
        expr(s"CAST(${1000L * capTokens} AS BIGINT) div greatest(total_tokens, 1L)")))
      .select(col(sourceCol), col("rate_mille"))
    // null-safe join key: a NULL source still groups (its rate row exists)
    // but `=` would never match it — NULL-source docs must be capped like
    // any other source, not silently dropped (mixSources keeps them too).
    // salt=1: this stage must sample INDEPENDENTLY of mixSources (salt 0) —
    // unsalted, a mix→cap chain keeps min(rate) instead of rate1·rate2/1000
    val r = rates.withColumnRenamed(sourceCol, "__cap_src")
    df.join(broadcast(r), col(sourceCol) <=> col("__cap_src"))
      .filter(hashBucket(col(idCol), salt = 1L) < col("rate_mille"))
      .select(col(idCol), col(sourceCol), col("rate_mille"))
  }

  /** Exact nearest-rank quantiles of `valCol` within each `byCol` group
    * (corpus length/token distributions per source). Nearest-rank
    * (value at row ⌈p·n⌉ of the sorted group, p in thousandths) rather than
    * interpolation: the result is an actual data value, identical on every
    * engine — no float interpolation drift. One shuffle (the per-group
    * window sort). At 100 TB the same report usually runs on
    * `percentile_approx`; this is the exact-answer variant with ties broken
    * by id so reruns are stable. */
  def rankQuantiles(
      df: DataFrame, byCol: String, valCol: String, idCol: String,
      pctsMille: Seq[Int] = Seq(250, 500, 750, 900)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(byCol).orderBy(col("value"), col(idCol))
    val wn = Window.partitionBy(byCol)
    df.select(col(byCol), col(valCol).cast("long").as("value"), col(idCol))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("pct_mille", explode(array(pctsMille.map(lit): _*)))
      // integer ceil: ⌈p·n/1000⌉ = (p·n + 999) div 1000 — exact on any engine
      // (the double division is exact here: p·n+999 < 2^31 ≪ 2^53)
      .filter(col("rn") ===
        ((col("pct_mille").cast("long") * col("n") + 999L) / 1000L).cast("long"))
      .select(col(byCol), col("pct_mille"), col("value"))
  }
}
