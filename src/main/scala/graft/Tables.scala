package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All timestamps are surfaced as TIMESTAMP_NTZ (wall-clock, no zone) to match
  * Flink's `TIMESTAMP(p)` semantics (reference grammar
  * syntaxes/flink.tmLanguage.json:175) and DuckDB's naive TIMESTAMP, so results
  * hash-compare across engines. `events.ts` is written as parquet
  * TIMESTAMP(NANOS) which Spark's reader rejects; we read it as a long
  * (legacy nanosAsLong) and truncate to microseconds — exactly what DuckDB
  * does when casting TIMESTAMP_NS → TIMESTAMP.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    case other =>
      spark.read.parquet(s"$sfDir/$other.parquet")
  }

  /** Register every test table as a temp view (idempotent). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
