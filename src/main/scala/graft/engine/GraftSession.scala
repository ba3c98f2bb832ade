package graft.engine

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession configured the way the engine expects
  * (UTC wall-clock semantics, AQE with skew handling, sane local shuffle
  * width) with every Flink-dialect function registered. A user of the
  * reference toolkit starts here:
  *
  * {{{
  * val spark = GraftSession.create()        // or .configure(existingBuilder)
  * val gw = new Gateway(spark)
  * val session = gw.openSession("default")
  * gw.executeScript(session, "CREATE TABLE t (...) WITH (...); SELECT ...")
  * }}}
  */
object GraftSession {

  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // Flink TIMESTAMP(p) is wall-clock: surface parquet timestamps as NTZ
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Local session (tests / single node). Cluster deployments pass their own
    * master/resource config through `configure`. */
  def create(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = configure(SparkSession.builder().master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    graft.functions.FlinkFunctions.registerAll(spark)
    graft.functions.Aggregators.registerAll(spark)
    graft.plans.CumulateTwoPhase.install(spark)
    spark
  }
}
