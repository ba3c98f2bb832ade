package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-19 optimization probe: per-gate forced timings (the Bench forcing —
  * count + bit_xor(xxhash64(*)) — so sub-second plan differences are honest)
  * plus `.explain("formatted")` dumps for the plan-artifact contract
  * (`plans/r19/<q>_{before,after}.txt`).
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.R19Probe plans/r19 before q_cut_spans q_dedup_spans"
  *
  * arg0 = output dir for plan dumps, arg1 = suffix (before/after/none to skip
  * dumps), rest = query-name substrings (empty = all).
  */
object R19Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = args.headOption.getOrElse("plans/r19")
    val suffix = if (args.length > 1) args(1) else "none"
    val wanted = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.registerAll(spark, sfDir)
    graft.functions.FlinkFunctions.registerAll(spark)
    spark.sql("SELECT count(*) FROM nation").collect()
    val selected = graft.SparkEntry.queries
      .filter { case (n, _) => wanted.isEmpty || wanted.exists(n.contains) }
    new java.io.File(outDir).mkdirs()
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      import org.apache.spark.sql.functions.{count, expr, lit}
      def once(): Double = {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.agg(count(lit(1)).as("n"),
          expr(df.columns.map(c => s"cast(`$c` as string)")
            .mkString("bit_xor(xxhash64(", ", ", "))")).as("h"))
          .collect()
        (System.nanoTime() - t0) / 1e9
      }
      if (suffix != "none") {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
      }
      val (a, b) = (once(), once())
      println(f"[r19] $name%-36s best=${math.min(a, b)}%.3f s  (runs: $a%.3f / $b%.3f)")
    }
    spark.stop()
  }
}
