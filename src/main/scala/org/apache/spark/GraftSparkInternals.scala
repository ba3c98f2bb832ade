package org.apache.spark

/** One deliberate reach across Spark's package-private line, kept tiny.
  *
  * `SparkStatusTracker.getExecutorInfos` lists block managers as
  * `SparkExecutorInfo(host, port, …)` WITHOUT the executor id, so the
  * driver's entry cannot be told apart from an executor co-located on the
  * driver host by public API alone. The block manager itself knows: on the
  * driver JVM, `SparkEnv.get.blockManager.blockManagerId` is the driver's
  * block manager id, whose (host, port) pair uniquely matches its tracker
  * entry — ports differ even when hosts coincide.
  */
object GraftSparkInternals {

  /** (host, port) of the DRIVER's block manager — call from driver code
    * only (Gateway/Jobs run there). None if the env isn't up yet. */
  def driverBlockManagerHostPort(): Option[(String, Int)] =
    Option(SparkEnv.get).flatMap(env => Option(env.blockManager.blockManagerId))
      .map(id => (id.host, id.port))
}
