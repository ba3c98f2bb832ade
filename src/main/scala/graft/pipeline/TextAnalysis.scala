package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.RollingHashes.rolling_hashes

/** Text-analysis operators for training-data pipelines: token counting
  * (whitespace + BPE-ish regex), quality scoring, language identification
  * (marker-word heuristic), and document fingerprinting (rolling hash +
  * content digest).
  *
  * Everything is a per-row projection over codegen'd string/array functions —
  * no shuffle, no state; at 100 TB these run at scan speed and column-prune
  * down to (id, text).
  */
object TextAnalysis {

  /** Whitespace token count (0 for empty/blank text). Uses the canonical
    * [[CorpusFilters.splitWords]] split-then-drop-empties tokenization:
    * `trim` strips only SPACES, so a text starting with a tab or newline
    * would otherwise carry a phantom empty token ("\tfoo bar" → 3). */
  def tokenCount(text: Column): Column =
    size(CorpusFilters.splitWords(text)).cast("bigint")

  /** BPE-ish subword count: runs of letters, digit runs, and single
    * punctuation each count as one token (the usual pre-tokenizer shape). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\p{L}]+|[\\p{Nd}]+|[^\\p{L}\\p{Nd}\\s]"), lit(0))).cast("bigint")

  /** Quality features + a composite score in [0, 1]:
    * penalizes very short docs, high punctuation ratio, low stopword ratio,
    * and degenerate mean word length. Deterministic double arithmetic. */
  def qualityFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("double")
    // splitWords, not split(trim(..)): trim strips only spaces, and a
    // leading tab/newline would inflate n_tokens (and skew every ratio
    // whose denominator it feeds) by a phantom empty token
    // one quality_stats kernel pass (r19): the regex class
    // `[^\p{L}\p{Nd}\s]` IS the kernel's symbol counter, and the stopword
    // numerator is its occurrence stat — the regexp_extract_all
    // materialization and the interpreted per-token filter(isin…) lambda
    // re-scanned each document ~3x (PipelineSpec pins kernel == twin)
    val stats = graft.functions.TextExprs.quality_stats(t, StopWords)
    val nToks = element_at(stats, 1).cast("double")
    val punct = element_at(stats, 3).cast("double")
    val stop = element_at(stats, 5).cast("double")
    df.select(
      col(idCol),
      nChars.cast("bigint").as("n_chars"),
      nToks.cast("bigint").as("n_tokens"),
      round(nChars / greatest(nToks, lit(1.0)), 6).as("mean_word_len"),
      round(punct / greatest(nChars, lit(1.0)), 6).as("punct_ratio"),
      round(stop / greatest(nToks, lit(1.0)), 6).as("stopword_ratio"))
      .withColumn("quality_score",
        round(least(lit(1.0), col("n_tokens") / 20.0) * 0.4
          + least(lit(1.0), col("stopword_ratio") * 4.0) * 0.3
          + (lit(1.0) - least(lit(1.0), col("punct_ratio") * 5.0)) * 0.3, 6))
  }

  /** PII regexes — kept to the Java∩RE2 common subset (no lookaround, no
    * backreferences) so the DuckDB oracle evaluates the identical patterns.
    * Replacement order matters (an email's domain would otherwise be eaten
    * by the IP pattern): email → ip → phone, applied the same on both sides. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d[\\d -]{6,14}\\d"

  /** PII detection + redaction: counts per category from the original text,
    * plus the text with each match replaced by a typed placeholder. Pure
    * per-row projection over codegen'd RegExp expressions — scan speed,
    * no shuffle, prunes to (id, text) at 100 TB. */
  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    // counts follow the redaction cascade (IPs counted on the email-redacted
    // text, phones on the email+IP-redacted text): a dotted email domain
    // would otherwise count as both an email AND an IP while the sequential
    // redaction only emits one placeholder — counts must equal placeholders
    val noEmail = regexp_replace(t, EmailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Re, "<IP>")
    df.select(
      col(idCol),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("bigint").as("n_emails"),
      size(regexp_extract_all(noEmail, lit(Ipv4Re), lit(0))).cast("bigint").as("n_ips"),
      size(regexp_extract_all(noIp, lit(PhoneRe), lit(0))).cast("bigint").as("n_phones"),
      regexp_replace(noIp, PhoneRe, "<PHONE>").as("redacted"))
  }

  /** URL regex (scheme + non-space remainder) and its domain capture —
    * Java∩RE2 subset, shared with the DuckDB oracle. */
  val UrlRe = "https?://[^\\s]+"
  val DomainRe = "https?://([^/\\s]+)"

  /** URL extraction + domain blocklist screening: URL count, sorted distinct
    * domains (comma-joined, deterministic), and whether any domain ends with
    * a blocklisted suffix. Per-row projection — scan speed; the blocklist is
    * a literal (broadcast into codegen), the right shape for the usual
    * few-thousand-entry domain lists. */
  def urlStats(df: DataFrame, idCol: String, textCol: String,
      blockedSuffixes: Seq[String]): DataFrame = {
    val urls = regexp_extract_all(col(textCol), lit(UrlRe), lit(0))
    // strip an explicit :port before the suffix check — "evil.com:8080"
    // does not endsWith "evil.com", so a port (even ":80") would bypass
    // the blocklist entirely
    val domains = array_sort(array_distinct(
      transform(urls, u =>
        regexp_replace(regexp_extract(u, DomainRe, 1), ":[0-9]+$", ""))))
    val blocked = blockedSuffixes.foldLeft(lit(false)) { (acc, sfx) =>
      acc || exists(domains, d => d.endsWith(sfx))
    }
    df.select(
      col(idCol),
      size(urls).cast("bigint").as("n_urls"),
      array_join(domains, ",").as("domains"),
      blocked.as("has_blocked"))
  }

  /** Deterministic train/val/test assignment from a content hash: buckets by
    * the first two hex chars of md5 (256 buckets) compared lexicographically,
    * so any engine with md5 reproduces the split bit-for-bit — no RNG, no
    * seed coordination across a 1000-executor cluster, stable under reruns
    * and repartitioning. ~2/256 val, ~2/256 test, rest train. */
  def splitAssign(df: DataFrame, textCol: String): DataFrame = {
    val bucket = substring(md5(col(textCol).cast("string")), 1, 2)
    df.withColumn("split",
      when(bucket >= "fe", "test")
        .when(bucket >= "fc", "val")
        .otherwise("train"))
  }

  /** Marker words per language for the n-gram/stopword language-ID heuristic.
    * Tiny on purpose: broadcast as literals into codegen. */
  val StopWords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")

  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "that", "with", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "para"),
  )

  /** Language-ID: argmax of marker-word hits (ties broken by declaration
    * order), 'und' (undetermined) when nothing matches — plus a han-script
    * check for zh. Pure projection; scoring is exact integer counts.
    * One-pass codegen kernel (r19): the column formulation below —
    * `split(lower(text))` + one interpreted `filter(isin…)` lambda pass per
    * language + `regexp_extract_all` materializing every han match just to
    * test presence — re-scanned each document ~6 times; PipelineSpec pins
    * kernel == column formulation. */
  def languageId(text: Column): Column =
    graft.functions.TextExprs.lang_id(text,
      LangMarkers.map(_._1), LangMarkers.map(_._2))

  /** The pre-r19 column formulation, kept as the kernel's parity baseline
    * (spec-only; see [[languageId]]). */
  private[graft] def languageIdColumns(text: Column): Column = {
    val toks = split(lower(text), "\\s+")
    val hits = LangMarkers.map { case (lang, words) =>
      lang -> size(filter(toks, w => w.isin(words: _*)))
    }
    val hanChars = size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    val best = hits.foldLeft[(Column, Column)]((lit("und"), lit(0))) {
      case ((bl, bs), (lang, score)) =>
        (when(score > bs, lit(lang)).otherwise(bl), greatest(score, bs))
    }
    when(hanChars > 0, lit("zh")).otherwise(best._1)
  }

  /** 64-bit content fingerprint: minimum k-gram rolling hash of the
    * normalized text (the MinHash-1 fingerprint) — robust to reordering of
    * large blocks, O(n) via rolling_hashes. For edit-locality-sensitive
    * winnowing (min per sliding window of hashes), use
    * `Dedup.minhashSignature` with banding instead. */
  def fingerprint64(text: Column, k: Int = 16): Column =
    array_min(rolling_hashes(Dedup.normalize(text), k, 0L))

  /** Content digest fingerprint (md5 of normalized text) — the exact-dedup key. */
  def digest(text: Column): Column = md5(Dedup.normalize(text))
}
