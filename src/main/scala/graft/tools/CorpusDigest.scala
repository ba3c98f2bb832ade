package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Content digest of a test-data directory (r17, round-18 candidate #5):
  * per table, `rows` + an order-free 64-bit value digest
  * (bit_xor(xxhash64(every column as string)) — the same reduction the
  * bench/sweep forcing uses), written to `<dir>/digest.json`.
  *
  * Why: ScaleUp corpora are regenerated across rounds and assumed
  * identical (deterministic seeds), but r16 and r17 measured a 0.7%
  * verified-pair delta on "the same" sf100f — with no digest there was no
  * way to tell corpus drift from harness drift. A digest turns corpus
  * identity into a checkable equality: two dirs with equal digest.json
  * carry byte-equal VALUES per table (up to row order, which no gate
  * depends on — every operator here is declarative).
  *
  * Usage: runMain graft.tools.CorpusDigest <dir> [<dir> ...]
  * Compare: diff <a>/digest.json <b>/digest.json
  */
object CorpusDigest {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CorpusDigest <dir> [<dir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      val tables = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
        .map(_.getName.stripSuffix(".parquet")).sorted
      val entries = tables.map { t =>
        val df = graft.Tables.load(spark, dir, t)
        val row = df.agg(count(lit(1)).as("n"),
          expr(df.columns.map(c => s"cast(`$c` as string)")
            .mkString("bit_xor(xxhash64(", ", ", "))")).as("h"))
          .collect()(0)
        val h = if (row.isNullAt(1)) 0L else row.getLong(1)
        println(f"[digest] $dir%-20s $t%-12s rows=${row.getLong(0)}%-10d h=$h")
        "\"" + t + "\":{\"rows\":" + row.getLong(0) + ",\"h\":" + h + "}"
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "digest.json"),
        ("{" + entries.mkString(",") + "}").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
