package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.RollingHashes.rolling_hashes

/** Deduplication operators for large-scale text corpora: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard verification.
  *
  * 100 TB design rules baked in:
  *  - no cross joins: candidate generation is always a shuffle on a bounded
  *    blocking key (hash group, LSH band bucket, simhash value);
  *  - signatures are fixed-width (32 longs) regardless of document length;
  *  - shingle hashing is the O(n) `rolling_hashes` codegen expression — the
  *    corpus is scanned once per document, not once per (document × seed);
  *  - oversized LSH buckets (degenerate near-identical content) are capped so
  *    one hot key can't quadratically blow up a band join — the cap is a
  *    tunable and capped pairs are still caught by other bands.
  */
object Dedup {

  /** Exact dedup on normalized text: one row per duplicate group with the
    * keeper (min id) and group size. Single hash-shuffle on the digest. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(normalize(col(textCol))).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("group_size"))

  /** Flink-style normalization used before hashing: lower-case + collapse
    * whitespace. */
  def normalize(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** MinHash signature: ARRAY<BIGINT> of `numHashes` minima over char
    * `shingleLen`-gram rolling hashes. One text scan in a native kernel
    * expression (HashKernels.minhash) — fixed-width output, codegen'd. */
  def minhashSignature(textCol: Column, numHashes: Int = 32, shingleLen: Int = 9): Column =
    graft.functions.HashExprs.minhash_sig(normalize(textCol), shingleLen, numHashes)

  /** LSH candidate pairs from MinHash signatures: band the signature, bucket
    * by (band index, band hash), emit intra-bucket pairs. `maxBucket` caps
    * degenerate buckets (skew guard). Returns (id_a, id_b) with id_a < id_b. */
  def lshCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8, shingleLen: Int = 9,
      maxBucket: Int = 64): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val sigs = df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), numHashes, shingleLen).as("sig"))
    val banded = sigs.select(col("id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rows + 1, lit(rows)), b))).as(Seq("band", "bucket")))
    val capped = banded
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")
    capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard between two text columns (verification step after
    * LSH, or standalone for bounded candidate sets). */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    def grams(c: Column) = array_distinct(rolling_hashes(normalize(c), n, 0L))
    val ga = grams(a); val gb = grams(b)
    // |A∩B| / (|A| + |B| - |A∩B|) with the intersection computed once
    val inter = size(array_intersect(ga, gb))
    inter.cast("double") / (size(ga) + size(gb) - inter)
  }

  /** Near-duplicate pairs: LSH candidates verified by exact shingle Jaccard.
    * The verify join re-reads only candidate ids — linear in candidates. */
  def nearDuplicatePairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8,
      shingleLen: Int = 9): DataFrame = {
    val cands = lshCandidatePairs(df, idCol, textCol, numHashes, bands, shingleLen)
    val texts = df.select(col(idCol).as("id"), col(textCol).as("text"))
    cands
      .join(texts.withColumnRenamed("id", "id_a").withColumnRenamed("text", "text_a"), "id_a")
      .join(texts.withColumnRenamed("id", "id_b").withColumnRenamed("text", "text_b"), "id_b")
      .withColumn("jaccard", ngramJaccard(col("text_a"), col("text_b"), shingleLen))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of token
    * hashes, one pass in a native kernel expression (HashKernels.simhash).
    * Fixed-width output; exact-duplicate clusters = equal simhash; near-dup =
    * small hamming distance (join on rotated bands if needed). */
  def simhash(textCol: Column): Column =
    graft.functions.HashExprs.simhash64(normalize(textCol))

  /** Exact duplicated-substring coverage (the signal behind suffix-array
    * substring dedup à la "Deduplicating Training Data Makes Language Models
    * Better", Lee et al. 2022, done shuffle-native instead of with a global
    * suffix array): for every position, the k-char window starting there is
    * "duplicated" when the identical window occurs in ≥ `minDocs` distinct
    * documents; per document we report how many characters lie under at
    * least one duplicated window.
    *
    * Shape (all linear, no all-pairs): one pass per doc emits (gram, pos)
    * via the O(n) rolling-hash kernel; one shuffle groups by gram to find
    * cross-document grams; a semi join (same key — the exchange is reused)
    * keeps duplicated positions; covered chars then come from a per-doc
    * window sum — consecutive sorted positions p_{i-1}, p_i add
    * min(k, p_i − p_{i-1}) chars (k for the first), which equals the exact
    * union length of the overlapping [p, p+k) intervals without building
    * islands. Per-doc state is bounded by document length.
    *
    * `useKernel=false` switches gram identity from the 64-bit rolling hash
    * to the literal substring — the oracle-parity path (a hash collision
    * could in principle merge two distinct grams); PipelineSpec pins both
    * paths equal on the corpus.
    */
  def duplicatedSpanCoverage(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 20, minDocs: Int = 2, useKernel: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams =
      if (useKernel)
        df.select(col(idCol).as("doc_id"),
          posexplode(rolling_hashes(col(textCol), k, 0L)).as(Seq("pos0", "gram")))
      else
        df.filter(length(col(textCol)) >= k)
          .select(col(idCol).as("doc_id"),
            posexplode(transform(sequence(lit(1), length(col(textCol)) - (k - 1)),
              i => call_function("substring", col(textCol), i, lit(k)))).as(Seq("pos0", "gram")))
    val pos = grams.select(col("doc_id"), (col("pos0") + 1).as("pos"), col("gram"))
    // distinct doc-count per gram WITHOUT countDistinct's Expand: dedupe the
    // grams inside each document map-side (narrow, per-doc array) so a plain
    // count() over the shuffle counts documents — within-doc repeats never
    // reach the exchange
    val docGrams =
      if (useKernel)
        df.select(col(idCol).as("doc_id"),
          explode(array_distinct(rolling_hashes(col(textCol), k, 0L))).as("gram"))
      else
        df.filter(length(col(textCol)) >= k)
          .select(col(idCol).as("doc_id"),
            explode(array_distinct(transform(sequence(lit(1), length(col(textCol)) - (k - 1)),
              i => call_function("substring", col(textCol), i, lit(k))))).as("gram"))
    val dupGrams = docGrams.groupBy("gram")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("gram")
    val dupPos = pos.join(dupGrams, Seq("gram"), "left_semi")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val perDoc = dupPos
      .withColumn("delta", col("pos") - lag(col("pos"), 1).over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_grams"),
        sum(when(col("delta").isNull, k).otherwise(least(col("delta"), lit(k)))).as("dup_chars"))
    df.select(col(idCol).as("doc_id"), length(col(textCol)).cast("long").as("n_chars"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("dup_chars"), lit(0L)).cast("long").as("dup_chars"),
        round(coalesce(col("dup_chars"), lit(0L)).cast("double") /
          greatest(col("n_chars"), lit(1L)), 6).as("dup_frac"),
        coalesce(col("n_dup_grams"), lit(0L)).cast("long").as("n_dup_grams"))
  }
}
