package graft.engine

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming-job registry: the Spark side of SHOW JOBS / STOP JOB and the
  * reference's job trees (src/jobsProvider.ts:60-77, flinkClient.ts:174-239).
  *
  * A Flink "job" maps to a StreamingQuery: it has an id, a RUNNING/FINISHED/
  * FAILED/CANCELED status, and is cancellable. Finished/cancelled jobs stay
  * listed (the reference shows job history) until `clearHistory`.
  */
object Jobs {

  final case class JobInfo(
      name: String, id: String, status: String, startMillis: Long)

  private val active = TrieMap.empty[String, StreamingQuery]
  private val history = TrieMap.empty[String, JobInfo]
  /** job name → the file-sink path it writes (filesystem sinks only).
    * Batch DML into the same path must refuse while the writer is live:
    * Spark's file sink dedups micro-batches by batch id against the sink's
    * own commit log, so a batch append that bumps the log makes the RUNNING
    * stream silently skip its next micro-batches (r15 ADVICE, medium). */
  private val sinkPaths = TrieMap.empty[String, Set[String]]

  /** Every spelling of `p` this registry matches on: the raw `Path` form
    * plus, when the scheme's filesystem can be instantiated, the
    * filesystem-QUALIFIED form — so 'file:/tmp/x', '/tmp/x', and a
    * relative path compare equal (r16 ADVICE: an unqualified
    * `Path.toString` kept the spelling, so a registration under one
    * spelling and an `activeWriterOf` probe under the other silently
    * missed — reintroducing the micro-batch-skip the live-writer guard
    * exists to prevent). Qualification uses the active session's Hadoop
    * conf (the same conf the staging/append code resolves against).
    *
    * Both sides match on SET INTERSECTION of their spellings (r17
    * verdict): `register()` and `activeWriterOf()` run at different times
    * on different threads, so one side can qualify while the other falls
    * back (no active session during shutdown, transient FS init failure).
    * A qualified-or-nothing form on each side silently missed in exactly
    * that window; keeping the raw form in BOTH sets makes a one-sided
    * qualification failure still intersect on the spelling it was given. */
  private[graft] def pathForms(p: String): Set[String] = {
    val path = new org.apache.hadoop.fs.Path(p)
    val qualified =
      try {
        val conf = org.apache.spark.sql.SparkSession.getActiveSession
          .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
          .map(_.sessionState.newHadoopConf())
          .getOrElse(new org.apache.hadoop.conf.Configuration())
        Some(path.getFileSystem(conf).makeQualified(path).toString)
      } catch { case _: Exception => None }
    Set(path.toString) ++ qualified
  }

  def register(name: String, q: StreamingQuery,
      sinkPath: Option[String] = None): Unit = {
    active.put(name, q)
    sinkPath.foreach(p => sinkPaths.put(name, pathForms(p)))
    history.put(name, JobInfo(name, q.id.toString, "RUNNING", System.currentTimeMillis()))
  }

  /** The name of a LIVE streaming job writing `path`, if any. A stopped,
    * finished, or failed job no longer claims its path. Matching is on
    * intersection of spelling SETS (see [[pathForms]]) so a one-sided
    * qualification fallback cannot reopen the guard's hole. */
  def activeWriterOf(path: String): Option[String] = {
    val target = pathForms(path)
    sinkPaths.collectFirst { case (n, ps) if (ps & target).nonEmpty &&
      active.get(n).exists(q => q.isActive && q.exception.isEmpty) => n }
  }

  def list(): Seq[JobInfo] =
    history.map { case (name, info) =>
      active.get(name) match {
        case Some(q) if q.isActive => info.copy(status = "RUNNING")
        case Some(q) if q.exception.isDefined => info.copy(status = "FAILED")
        case Some(_) => info.copy(status = "FINISHED")
        case None => info
      }
    }.toSeq.sortBy(-_.startMillis)

  /** SHOW JOBS as a DataFrame (job id, name, status, start time). */
  def showJobs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    list().map(j => (j.id, j.name, j.status, new java.sql.Timestamp(j.startMillis)))
      .toDF("job_id", "job_name", "status", "start_time")
  }

  /** Cluster overview (reference taskManagersProvider.ts:84-193 overview
    * cards): a Flink task manager maps to a Spark executor and a slot to a
    * task slot (core). Sourced from `sc.statusTracker` — the numbers the
    * Spark UI's executors page shows; job counts come from this registry
    * plus the tracker's active job list. */
  /** The task-manager entries: `statusTracker.getExecutorInfos` minus the
    * driver. In cluster mode the tracker lists the driver's block manager as
    * an entry, but the driver runs no tasks — counting it would overstate
    * slot capacity by one executor's cores. Tracker entries are block
    * managers reported as (host, port), so the driver's is matched on BOTH
    * (via [[org.apache.spark.GraftSparkInternals]] — the public info type
    * omits the executor id): an executor co-located on the driver host has
    * a different port and keeps its entry. Host-only match is the fallback
    * if the env is unreadable. Local mode: the single entry IS the
    * executor, keep it. Shared by the overview and SHOW TASK MANAGERS so
    * both report the same fleet. */
  private def tmEntries(sc: org.apache.spark.SparkContext): Seq[org.apache.spark.SparkExecutorInfo] = {
    val all = sc.statusTracker.getExecutorInfos.toSeq
    if (sc.isLocal || all.size <= 1) all
    else {
      val i = org.apache.spark.GraftSparkInternals.driverBlockManagerHostPort() match {
        case Some((h, p)) => all.indexWhere(e => e.host == h && e.port == p)
        case None => all.indexWhere(_.host == sc.getConf.get("spark.driver.host", ""))
      }
      if (i >= 0) all.patch(i, Nil, 1) else all
    }
  }

  def clusterOverview(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val sc = spark.sparkContext
    val execs = tmEntries(sc)
    // live slot capacity from the CURRENT executor list × configured cores:
    // defaultParallelism is a launch-time value that misreports under
    // dynamic allocation or non-default executor sizing. Counting every
    // tracker entry keeps the overview consistent with SHOW TASK MANAGERS,
    // which rolls up the same list. Local mode: one executor whose slot
    // count is the local[n] thread count.
    val slotsTotal =
      if (sc.isLocal) sc.defaultParallelism
      else execs.length * sc.getConf.getInt("spark.executor.cores", 1)
    val runningTasks = execs.map(_.numRunningTasks()).sum
    val js = list()
    Seq((spark.version, execs.length, slotsTotal,
        math.max(slotsTotal - runningTasks, 0),
        js.count(_.status == "RUNNING"), js.count(_.status == "FINISHED"),
        js.count(_.status == "CANCELED"), js.count(_.status == "FAILED")))
      .toDF("version", "taskmanagers", "slots_total", "slots_available",
        "jobs_running", "jobs_finished", "jobs_cancelled", "jobs_failed")
  }

  /** Per-executor rollup (the reference's per-TM cards: id, slots in use,
    * memory): host:port id, running tasks, storage memory used/total, cached
    * bytes. In local mode this is the single driver executor. */
  def showTaskManagers(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val sc = spark.sparkContext
    tmEntries(sc)
      .map(e => (s"${e.host}:${e.port}", e.numRunningTasks(),
        e.usedOnHeapStorageMemory(), e.totalOnHeapStorageMemory(), e.cacheSize()))
      .sortBy(_._1)
      .toDF("tm_id", "running_tasks", "used_storage_bytes",
        "total_storage_bytes", "cached_bytes")
  }

  /** STOP JOB 'name-or-id' [WITH SAVEPOINT | WITH DRAIN]: checkpoints are
    * already durable (Flink savepoint ≈ Spark checkpointLocation), so both
    * modifiers reduce to a clean stop. */
  def stop(nameOrId: String): Boolean = {
    val hit = active.find { case (n, q) => n == nameOrId || q.id.toString == nameOrId }
    hit match {
      case Some((n, q)) =>
        q.stop()
        history.get(n).foreach(i => history.put(n, i.copy(status = "CANCELED")))
        active.remove(n)
        sinkPaths.remove(n)
        true
      case None => false
    }
  }

  def get(nameOrId: String): Option[StreamingQuery] =
    active.collectFirst { case (n, q) if n == nameOrId || q.id.toString == nameOrId => q }

  def stopAll(): Unit = {
    // mirror stop(): a stopped-but-still-listed job must not read RUNNING
    // (Jobs.list falls back to the registration-time status once the query
    // leaves `active`, which said RUNNING forever)
    active.foreach { case (n, q) =>
      q.stop()
      history.get(n).foreach { i =>
        val st = if (q.exception.isDefined) "FAILED" else "CANCELED"
        history.put(n, i.copy(status = st))
      }
    }
    active.clear(); sinkPaths.clear()
  }
  def clearHistory(): Unit = { stopAll(); history.clear() }
}
