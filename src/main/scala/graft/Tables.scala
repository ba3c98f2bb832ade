package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All timestamps are surfaced as TIMESTAMP_NTZ (wall-clock, no zone) to match
  * Flink's `TIMESTAMP(p)` semantics (reference grammar
  * syntaxes/flink.tmLanguage.json:175) and DuckDB's naive TIMESTAMP, so results
  * hash-compare across engines. Depending on the generator version,
  * `events.ts` arrives either as parquet TIMESTAMP(NANOS) — which Spark reads
  * as a long under legacy nanosAsLong, so we truncate to microseconds exactly
  * as DuckDB does for TIMESTAMP_NS → TIMESTAMP — or natively as TIMESTAMP(µs).
  * The loader detects which and normalizes both to TIMESTAMP_NTZ.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      val tsNorm = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) read as epoch-nanos long
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
        case _ => col("ts").cast("timestamp_ntz")
      }
      raw.withColumn("ts", tsNorm)
    case other =>
      spark.read.parquet(s"$sfDir/$other.parquet")
  }

  private val registered =
    scala.collection.concurrent.TrieMap.empty[Int, String]

  /** Register every test table as a temp view. Memoized per session (keyed on
    * the currently-registered dir, so switching dirs re-registers):
    * re-registration re-reads 10 parquet footers (~seconds) and was the
    * dominant cost of every SQL-surface query before this guard. */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    val key = System.identityHashCode(spark)
    if (!registered.get(key).contains(sfDir)) {
      names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
      // driver-built sessions reach the engine only through here: make sure
      // they get the optimizer extension too (idempotent)
      graft.plans.CumulateTwoPhase.install(spark)
      registered.put(key, sfDir)
    }
  }
}
