package graft

import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.FlinkDialect
import graft.queries.StreamParityQueries.withParityConf

/** Checkpoint-restart determinism for the STATEFUL streaming operators.
  *
  * The r12 exactly-once INSERT test pins the stateless source→sink resume
  * path; what it cannot see is whether OPERATOR STATE survives a restart
  * intact — the java-serialized `CepState` of streaming MATCH_RECOGNIZE,
  * the (buffered rows, last version) tuple of the streaming as-of join,
  * the keep-first dedup candidate slots, and Spark's own windowed-agg
  * state, all restored from the HDFS-backed state store plus the restored
  * watermark. A serialization field that doesn't round-trip, state keyed
  * on something batch-local, or logic that consults the pre-restart
  * watermark would all pass every existing single-run parity gate and
  * still corrupt results on the first real-world failover.
  *
  * Property fuzzed here: for a random stateful query and random input
  * waves, (run waves 0..k-1 → STOP the query → start a NEW query from the
  * same checkpoint → run waves k..n) must produce exactly the same output
  * multiset as one uninterrupted run — the restart boundary is placed at
  * every interior wave by the seed sweep, including before the far-future
  * pusher waves, so pending state crosses the restart and is drained only
  * AFTER it (the restored-state path does the emitting, not the
  * pre-restart run).
  *
  * Determinism notes baked into the generators:
  * - waves are precomputed once per config, so both runs feed identical
  *   batch compositions; the late filter (one-batch-lagged watermark) and
  *   eviction (current watermark) then see identical values in both runs,
  *   because a restart restores the previous batch's watermark from the
  *   commit log — the same value the next batch would have seen anyway;
  * - dedup/CEP inputs avoid exact event-time ties within a key (tie-breaks
  *   are arrival-order inside a micro-batch, which Spark does not order
  *   across shuffle within a batch).
  */
class StreamRestartSpec extends SparkTestBase {

  private val N = sys.props.get("graft.restartfuzz.n").map(_.toInt).getOrElse(soak(64))

  private val rowSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("ets", TimestampType),
    StructField("v", DoubleType)))

  private def ts(sec: Long, ms: Int = 0): Timestamp =
    Timestamp.from(Instant.ofEpochMilli(sec * 1000L + ms))

  private def interval(sec: Int): String =
    if (sec % 60 == 0) s"INTERVAL '${sec / 60}' MINUTE"
    else s"INTERVAL '$sec' SECOND"

  private def ckptBase: String =
    if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
    else System.getProperty("java.io.tmpdir")

  private def freshCkpt(name: String): java.io.File = {
    val who = System.getProperty("user.name", "anon")
    val f = new java.io.File(
      s"$ckptBase/graft_restart_ckpt_${who}_${ProcessHandle.current().pid()}/$name")
    org.apache.commons.io.FileUtils.deleteQuietly(f)
    f
  }

  /** Start `out` against `ckpt` writing to the parquet `dir`, feed each
    * wave to a processAllAvailable quiescent point, stop. A second call
    * with the SAME ckpt+dir resumes from the stop point — the file sink is
    * the one exactly-once sink Spark allows to recover, and its metadata
    * log keeps replayed/orphan batches out of [[sinkRows]]. (The memory
    * sink refuses checkpoint recovery outright.) */
  private def runSegment(out: DataFrame, dir: java.io.File, ckpt: java.io.File,
      waves: Seq[() => Unit]): Unit = {
    val q = out.writeStream.format("parquet")
      .option("path", dir.getAbsolutePath)
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .outputMode("append").start()
    try {
      waves.foreach { w => w(); q.processAllAvailable() }
      q.processAllAvailable()
    } finally q.stop()
  }

  /** Metadata-log-aware read of a file-sink dir; a query that committed no
    * batches leaves nothing readable — that is the empty multiset. */
  private def sinkRows(dir: java.io.File): List[List[Any]] =
    try spark.read.parquet(dir.getAbsolutePath).collect().map(_.toSeq.toList).toList
    catch { case _: org.apache.spark.sql.AnalysisException => Nil }

  private def multisetDiff(a: Seq[List[Any]], b: Seq[List[Any]]): Long = {
    val m = collection.mutable.Map.empty[List[Any], Long]
    a.foreach(r => m.update(r, m.getOrElse(r, 0L) + 1))
    b.foreach(r => m.update(r, m.getOrElse(r, 0L) - 1))
    m.valuesIterator.map(math.abs).sum
  }

  /** One restartable case: fresh sources per instantiation (`tag` keeps
    * view/sink names apart across the straight and restarted runs), the
    * same precomputed waves feeding them. */
  private type Case = (DataFrame, Seq[() => Unit])

  // ---- family 0: TVF window aggregation (TUMBLE/HOP/CUMULATE/SESSION) ----
  private def tvfCase(i: Int, rnd: scala.util.Random): (String, String => Case) = {
    val kind = rnd.nextInt(4)
    val keyed = rnd.nextBoolean()
    val (tvf, label) = kind match {
      case 0 =>
        val size = 5 + rnd.nextInt(236)
        (s"TUMBLE(TABLE %s, DESCRIPTOR(ets), ${interval(size)})", s"TUMBLE($size s)")
      case 1 =>
        val slide = 2 + rnd.nextInt(59)
        val size = slide + 1 + rnd.nextInt(math.min(slide * 3, 240 - slide))
        (s"HOP(TABLE %s, DESCRIPTOR(ets), ${interval(slide)}, ${interval(size)})",
          s"HOP($slide/$size s)")
      case 2 =>
        val step = 2 + rnd.nextInt(29)
        val size = step * (2 + rnd.nextInt(4))
        (s"CUMULATE(TABLE %s, DESCRIPTOR(ets), ${interval(step)}, ${interval(size)})",
          s"CUMULATE($step/$size s)")
      case _ =>
        val gap = 2 + rnd.nextInt(59)
        val part = if (keyed) " PARTITION BY user_id" else ""
        (s"SESSION(TABLE %s$part, DESCRIPTOR(ets), ${interval(gap)})", s"SESSION($gap s)")
    }
    val delay = rnd.nextInt(11)
    val groupCols = if (keyed) "window_start, window_end, user_id"
      else "window_start, window_end"
    val nKeys = 1 + rnd.nextInt(3)
    val nRows = 40 + rnd.nextInt(41)
    val rows = (0 until nRows).map { _ =>
      val sec = 3600L + rnd.nextInt(601)
      val ms = if (rnd.nextInt(4) == 0) 0 else rnd.nextInt(1000)
      Row(rnd.nextInt(nKeys).toLong, ts(sec, ms), rnd.nextInt(1000) / 10.0)
    }.sortBy(_.getAs[Timestamp](1).getTime)
    val third = math.max(1, rows.length / 3)
    val dataWaves = Seq(rows.take(third), rows.slice(third, 2 * third),
      rows.drop(2 * third)).map(w => rnd.shuffle(w))
    val pushers = Seq(Seq(Row(-1L, ts(1000000L), 0.0)), Seq(Row(-1L, ts(2000000L), 0.0)))
    val mk = (tag: String) => {
      val mem = MemoryStream[Row](
        org.apache.spark.sql.Encoders.row(rowSchema), spark.sqlContext)
      val view = s"rs_tvf_src_${i}_$tag"
      mem.toDF().withWatermark("ets", s"$delay seconds").createOrReplaceTempView(view)
      val out = spark.sql(FlinkDialect.rewrite(
        s"""SELECT $groupCols, COUNT(*) AS n,
           |  SUM(CAST(v AS DECIMAL(20, 6))) AS sv
           |FROM TABLE(${tvf.format(view)})
           |GROUP BY $groupCols""".stripMargin))
      assert(out.isStreaming, s"[config $i] rewrite lost the streaming source")
      (out, (dataWaves ++ pushers).map(w => () => { mem.addData(w: _*); () }))
    }
    (s"$label delay=${delay}s keys=$nKeys rows=$nRows keyed=$keyed", mk)
  }

  // ---- family 1: streaming MATCH_RECOGNIZE ----
  private def cepCase(i: Int, rnd: scala.util.Random): (String, String => Case) = {
    import graft.operators.MatchRecognize
    import graft.operators.MatchRecognize._
    val patterns = Seq("A+ B", "A B+", "A{2,3} B")
    val pat = patterns(rnd.nextInt(patterns.length))
    val delay = rnd.nextInt(6)
    val nKeys = 1 + rnd.nextInt(3)
    val nRows = 45 + rnd.nextInt(46)
    var sec = 3600L
    val rows = (0 until nRows).map { _ =>
      sec += 1 + rnd.nextInt(3) // strictly increasing: no event-time ties
      val price = if (rnd.nextInt(10) < 7) rnd.nextInt(99).toDouble
        else (100 + rnd.nextInt(100)).toDouble
      (rnd.nextInt(nKeys).toLong, ts(sec), price)
    }
    val third = math.max(1, rows.length / 3)
    val dataWaves = Seq(rows.take(third), rows.slice(third, 2 * third), rows.drop(2 * third))
    val pushers = Seq(Seq((999L, ts(1000000L), 50.0)), Seq((998L, ts(2000000L), 50.0)))
    val mk = (_: String) => {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val mem = MemoryStream[(Long, Timestamp, Double)]
      val out = MatchRecognize.matchRecognizeStream(
        mem.toDF().toDF("k", "ts", "price"), Seq("k"), "ts",
        defines = Seq("A" -> (col("price") < 100), "B" -> (col("price") >= 100)),
        pattern = parsePattern(pat),
        measures = Seq(
          Measure("start_ts", "first", "A", "ts"),
          Measure("b_val", "last", "B", "price"),
          Measure("mno", "match_number", "", "")),
        watermarkDelay = Some(s"$delay seconds"))
      (out, (dataWaves ++ pushers).map(w => () => { mem.addData(w: _*); () }))
    }
    (s"CEP pattern='$pat' delay=${delay}s keys=$nKeys rows=$nRows", mk)
  }

  // ---- family 2: streaming as-of join ----
  private def asofCase(i: Int, rnd: scala.util.Random): (String, String => Case) = {
    import graft.operators.AsOfJoin
    val nKeys = 3 + rnd.nextInt(3)
    val base = 3600L * 1000L
    val nLeft = 90 + rnd.nextInt(61)
    val leftRows = (0 until nLeft).map { j =>
      (j % nKeys.toLong, j.toLong, new Timestamp(base + rnd.nextInt(3600) * 1000L))
    }
    val rightRows = (0 until 30 + rnd.nextInt(31)).map { j =>
      (j % nKeys.toLong, s"v$j", new Timestamp(base + rnd.nextInt(3600) * 1000L))
    }.groupBy(r => (r._1, r._3)).map(_._2.head).toSeq // unique (key, ts) versions
    def slice3[A](xs: Seq[A]): Seq[Seq[A]] = {
      val t = math.max(1, xs.length / 3)
      Seq(xs.take(t), xs.slice(t, 2 * t), xs.drop(2 * t))
    }
    val (lw, rw) = (slice3(leftRows), slice3(rightRows))
    val dataWaves = (0 until 3).map(j => (lw(j), rw(j)))
    val pushTs = Seq(6L, 7L).map(h => new Timestamp(base + h * 3600L * 1000L))
    val mk = (_: String) => {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val lm = MemoryStream[(Long, Long, Timestamp)]
      val rm = MemoryStream[(Long, String, Timestamp)]
      val out = AsOfJoin.leftAsOfStream(
        lm.toDF().toDF("k", "lid", "lts"),
        rm.toDF().toDF("k", "payload", "rts"),
        "k", "lts", "rts", Seq("payload"), watermarkDelay = "2 hours")
      val feeds = dataWaves.map { case (lc, rc) => () => {
        if (lc.nonEmpty) lm.addData(lc)
        if (rc.nonEmpty) rm.addData(rc)
        ()
      } } ++ pushTs.zipWithIndex.map { case (t, j) => () => {
        lm.addData((99L, 1000L + j, t)); rm.addData((99L, s"z$j", t)); ()
      } }
      (out, feeds)
    }
    (s"ASOF keys=$nKeys left=${leftRows.length} right=${rightRows.length}", mk)
  }

  // ---- family 3: event-time keep-first dedup ----
  private def dedupCase(i: Int, rnd: scala.util.Random): (String, String => Case) = {
    val nKeys = 2 + rnd.nextInt(4)
    val delaySec = 700 + rnd.nextInt(300)
    // distinct event times per key (tie-breaks are arrival-order within a
    // batch — not deterministic across runs), all inside the lateness
    // bound so arrival shuffling never late-drops
    val rows = (0 until nKeys).flatMap { k =>
      val times = rnd.shuffle((0 until 650).toList).take(2 + rnd.nextInt(5))
      times.map(t => (k.toLong, ts(3600L + t), rnd.nextInt(1000) / 10.0))
    }
    val shuffled = rnd.shuffle(rows)
    val third = math.max(1, shuffled.length / 3)
    val dataWaves = Seq(shuffled.take(third), shuffled.slice(third, 2 * third),
      shuffled.drop(2 * third))
    val pushers = Seq(Seq((9999L, ts(1000000L), 0.0)), Seq((9998L, ts(2000000L), 0.0)))
    val mk = (_: String) => {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val mem = MemoryStream[(Long, Timestamp, Double)]
      val out = graft.operators.StreamingDedup.keepFirstByEventTime(
        mem.toDF().toDF("k", "ts", "v").withWatermark("ts", s"$delaySec seconds"),
        Seq("k"), "ts")
      (out, (dataWaves ++ pushers).map(w => () => { mem.addData(w: _*); () }))
    }
    (s"DEDUP keys=$nKeys rows=${rows.length} delay=${delaySec}s", mk)
  }

  test(s"$N random stateful streaming configs: restart from checkpoint == uninterrupted") {
    val seed0 = 0x4e57a97dL
    val workers = 8
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def runConfig(i: Int): Unit = {
      val rnd = new scala.util.Random(seed0 + i)
      val (label, mk) = (i % 4) match {
        case 0 => tvfCase(i, rnd)
        case 1 => cepCase(i, rnd)
        case 2 => asofCase(i, rnd)
        case _ => dedupCase(i, rnd)
      }
      // straight run
      val (outA, wavesA) = mk("a")
      val ckA = freshCkpt(s"straight_$i")
      val dirA = freshCkpt(s"straight_sink_$i")
      runSegment(outA, dirA, ckA, wavesA)
      val straight = sinkRows(dirA)
      // interrupted run: same case shape, fresh sources, shared checkpoint
      val (outB, wavesB) = mk("b")
      val k = 1 + rnd.nextInt(wavesB.length - 1) // ≥1 wave each side of the stop
      val ck = freshCkpt(s"resumed_$i")
      val dirB = freshCkpt(s"resumed_sink_$i")
      runSegment(outB, dirB, ck, wavesB.take(k))
      runSegment(outB, dirB, ck, wavesB.drop(k))
      val resumed = sinkRows(dirB)
      val diff = multisetDiff(straight, resumed)
      // CEP configs can legitimately match nothing; the other families
      // always emit (TVF pusher windows, as-of left rows, dedup keepers)
      if (diff != 0 || (straight.isEmpty && (i % 4) != 1))
        failures.add(s"[config $i seed ${seed0 + i}] $label stopAfterWave=$k -> " +
          s"diff=$diff straight=${straight.size} resumed=${resumed.size}")
      // per-config dirs only: the parent is shared with in-flight configs
      Seq(ckA, dirA, ck, dirB).foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    }
    withParityConf(spark) {
      // single state partition per stream (same rationale as StreamFuzzSpec:
      // per-batch overhead is linear in state partitions × live queries;
      // multi-partition state correctness is the parity gates' job)
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(workers)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      (0 until N).foreach { i =>
        pool.submit(new Runnable {
          def run(): Unit =
            try runConfig(i)
            catch { case e: Throwable => errs.add(
              new RuntimeException(s"[config $i seed ${seed0 + i}] crashed", e)) }
        })
      }
      pool.shutdown()
      assert(pool.awaitTermination(30, java.util.concurrent.TimeUnit.MINUTES),
        "restart fuzz pool did not finish")
      errs.forEach(e => info(s"${e.getMessage}: ${e.getCause}"))
      assert(errs.isEmpty, s"${errs.size} configs crashed (see info output)")
    }
    failures.forEach(f => info(f))
    assert(failures.isEmpty, s"${failures.size} of $N configs diverged (see info output)")
  }

  test("gateway checkpoint-restart x schema evolution: named outcome per ALTER kind (r15)") {
    // The one seam two proven subsystems never composed: AlterSchemaSpec
    // pins ALTER against RUNNING jobs, the fuzz above pins restarts with a
    // FIXED schema — but a job restarted FROM A CHECKPOINT after its
    // binding evolved between STOP JOB and the restart hits Spark's state
    // restore path, whose failures are raw state-store internals. Pinned
    // outcomes: stateless sink ADD/DROP -> evolved write, NULL-fill read;
    // stateful shape change -> NAMED restart-from-fresh-checkpoint error on
    // the INSERT itself (job FAILED in SHOW JOBS, never a raw throw);
    // watermark MODIFY -> resumes; fresh checkpoint over a used sink path
    // -> named refusal (Spark would silently skip the first batches).
    import graft.engine.{Gateway, TableEnv}
    TableEnv.clear()
    val gw = new Gateway(spark)
    val h = gw.openSession("ckpt_evo")
    def run(s: String) = gw.fetchResults(gw.executeStatement(h, s), 0)
    def ok(s: String): String = {
      val r = run(s)
      assert(r.columns != Seq("error"), s"`$s` errored: ${r.rows.take(1)}")
      r.rows.headOption.map(_.head.toString).getOrElse("")
    }
    def errLike(s: String, contains: String): String = {
      val r = run(s)
      assert(r.columns == Seq("error"), s"`$s` should refuse, got ${r.rows.take(1)}")
      val msg = r.rows.head.head.toString
      assert(msg.contains(contains), s"`$s` error should mention '$contains': $msg")
      msg
    }
    def startJob(sql: String): String =
      "Job (\\S+) started".r.findFirstMatchIn(ok(sql))
        .getOrElse(fail(s"INSERT did not start a job")).group(1)
    def count(tbl: String, pred: String = "true"): Long =
      try run(s"SELECT count(*) AS n FROM $tbl WHERE $pred").rows.head.head.toString.toLong
      catch { case _: Exception => -1L }
    def awaitTrue(what: String)(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 240L * 1000 * 1000 * 1000
      while (!cond && System.nanoTime() < deadline) Thread.sleep(250)
      assert(cond, s"timed out waiting for: $what")
    }
    val runDir = s"/tmp/graft-ckptevo-${java.util.UUID.randomUUID()}"
    ok("CREATE TABLE cr_src (k INT, ts TIMESTAMP(3), v DOUBLE, " +
      "WATERMARK FOR ts AS ts - INTERVAL '5' SECOND) WITH " +
      "('connector'='datagen','rows-per-second'='500')")
    try {
      // ---- ADD on a stateless sink: restart resumes, old rows NULL-fill --
      ok(s"CREATE TABLE cra (k INT, v DOUBLE) WITH ('connector'='filesystem'," +
        s"'path'='$runDir/a','format'='parquet','checkpoint'='$runDir/ca')")
      val ja = startJob("INSERT INTO cra SELECT k, v FROM cr_src")
      awaitTrue("cra commits")(count("cra") > 0)
      ok(s"STOP JOB '$ja'")
      ok("ALTER TABLE cra ADD tag STRING")
      startJob("INSERT INTO cra SELECT k, v, 'g2' FROM cr_src") // same ckpt
      awaitTrue("evolved rows commit")(count("cra", "tag = 'g2'") > 0)
      assert(count("cra", "tag IS NULL") > 0, "generation-1 rows must NULL-fill")
      // ---- DROP on a stateless sink: restart writes the narrower shape --
      ok(s"CREATE TABLE crb (k INT, v DOUBLE) WITH ('connector'='filesystem'," +
        s"'path'='$runDir/b','format'='parquet','checkpoint'='$runDir/cb')")
      val jb = startJob("INSERT INTO crb SELECT k, v FROM cr_src")
      awaitTrue("crb commits")(count("crb") > 0)
      ok(s"STOP JOB '$jb'")
      ok("ALTER TABLE crb DROP v")
      startJob("INSERT INTO crb SELECT k FROM cr_src") // same ckpt
      val before = count("crb")
      awaitTrue("narrower rows commit")(count("crb") > before)
      assert(run("SELECT * FROM crb").columns == Seq("k"))
      // ---- stateful shape change: NAMED error, FAILED job, recovery ----
      ok(s"CREATE TABLE crc (ws TIMESTAMP(3), sv DOUBLE) WITH " +
        s"('connector'='filesystem','path'='$runDir/c','format'='parquet'," +
        s"'checkpoint'='$runDir/cc')")
      val agg = "SELECT window_start, SUM(v) AS sv FROM TABLE(TUMBLE(TABLE " +
        "cr_src, DESCRIPTOR(ts), INTERVAL '10' SECOND)) " +
        "GROUP BY window_start, window_end"
      val jc = startJob(s"INSERT INTO crc $agg")
      awaitTrue("crc commits closed windows")(count("crc") > 0)
      ok(s"STOP JOB '$jc'")
      ok("ALTER TABLE crc ADD n BIGINT")
      // the restarted plan's agg buffer gained a field — Spark's state
      // store would kill the job with a raw schema-compat internal; the
      // INSERT itself must answer the named, actionable error instead
      val msg = errLike("INSERT INTO crc SELECT window_start, SUM(v) AS sv, " +
        "COUNT(*) AS n FROM TABLE(TUMBLE(TABLE cr_src, DESCRIPTOR(ts), " +
        "INTERVAL '10' SECOND)) GROUP BY window_start, window_end",
        "could not restart from its checkpoint")
      assert(msg.contains("fresh checkpoint"), s"no recovery guidance: $msg")
      assert(run("SHOW JOBS").rows.exists(r =>
        r(1).toString.startsWith("crc_") && r(2).toString == "FAILED"),
        "the failed restart must stay visible in SHOW JOBS")
      // recovery path the error names: fresh checkpoint AND fresh path
      ok(s"ALTER TABLE crc SET ('path'='$runDir/c2','checkpoint'='$runDir/cc2')")
      startJob("INSERT INTO crc SELECT window_start, SUM(v) AS sv, " +
        "COUNT(*) AS n FROM TABLE(TUMBLE(TABLE cr_src, DESCRIPTOR(ts), " +
        "INTERVAL '10' SECOND)) GROUP BY window_start, window_end")
      awaitTrue("evolved agg commits")(count("crc", "n IS NOT NULL") > 0)
      // ---- watermark MODIFY: delay is plan-side, restart resumes ----
      ok(s"CREATE TABLE crd (ws TIMESTAMP(3), sv DOUBLE) WITH " +
        s"('connector'='filesystem','path'='$runDir/d','format'='parquet'," +
        s"'checkpoint'='$runDir/cd')")
      val jd = startJob(s"INSERT INTO crd $agg")
      awaitTrue("crd commits")(count("crd") > 0)
      ok(s"STOP JOB '$jd'")
      ok("ALTER TABLE cr_src MODIFY WATERMARK FOR ts AS ts - INTERVAL '1' SECOND")
      startJob(s"INSERT INTO crd $agg") // same ckpt, same query
      val beforeD = count("crd")
      awaitTrue("crd resumes committing")(count("crd") > beforeD)
      // ---- fresh checkpoint over a used sink path: named refusal ----
      ok(s"ALTER TABLE crd SET ('checkpoint'='$runDir/cd_fresh')")
      errLike(s"INSERT INTO crd $agg", "commit log from an earlier job")
    } finally {
      graft.engine.Jobs.stopAll()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(runDir))
      gw.closeSession(h)
    }
  }

  test("file sink batch/streaming mixing: appends commit to the sink log, divergent resumes refuse (r15)") {
    // Spark's file sink dedups micro-batches by batch id against the
    // sink's OWN commit log, and batch reads over a logged dir are
    // log-aware. Three silent-loss seams around that key, all found by
    // code audit this round and now handled:
    //   (a) a batch INSERT INTO a streaming-written dir used to write
    //       files NO read ever saw — it now commits them to the sink log
    //       as the next batch;
    //   (b) resuming a streaming job after the sink log advanced past its
    //       checkpoint (that batch INSERT, or a foreign job) would
    //       silently SKIP the resumed job's first batches — named refusal;
    //   (c) a fresh streaming job over a dir holding plain batch data
    //       would HIDE those files behind its new log — named refusal.
    import graft.engine.{Gateway, TableEnv}
    TableEnv.clear()
    val gw = new Gateway(spark)
    val h = gw.openSession("mix")
    def run(s: String) = gw.fetchResults(gw.executeStatement(h, s), 0)
    def ok(s: String): String = {
      val r = run(s)
      assert(r.columns != Seq("error"), s"`$s` errored: ${r.rows.take(1)}")
      r.rows.headOption.map(_.head.toString).getOrElse("")
    }
    def errLike(s: String, contains: String): Unit = {
      val r = run(s)
      assert(r.columns == Seq("error"), s"`$s` should refuse, got ${r.rows.take(1)}")
      assert(r.rows.head.head.toString.contains(contains),
        s"`$s` error should mention '$contains': ${r.rows.head.head}")
    }
    def count(pred: String = "true"): Long =
      try run(s"SELECT count(*) AS n FROM mx_a WHERE $pred").rows.head.head.toString.toLong
      catch { case _: Exception => -1L }
    def awaitTrue(what: String)(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 240L * 1000 * 1000 * 1000
      while (!cond && System.nanoTime() < deadline) Thread.sleep(250)
      assert(cond, s"timed out waiting for: $what")
    }
    val runDir = s"/tmp/graft-mix-${java.util.UUID.randomUUID()}"
    ok("CREATE TABLE mx_src (k INT, v DOUBLE) WITH " +
      "('connector'='datagen','rows-per-second'='500')")
    ok(s"CREATE TABLE mx_a (k INT, v DOUBLE) WITH ('connector'='filesystem'," +
      s"'path'='$runDir/a','format'='parquet','checkpoint'='$runDir/ca')")
    try {
      val j = "Job (\\S+) started".r.findFirstMatchIn(
        ok("INSERT INTO mx_a SELECT k, v FROM mx_src")).get.group(1)
      awaitTrue("stream commits")(count() > 0)
      ok(s"STOP JOB '$j'")
      val c1 = count()
      // (a) the batch append is VISIBLE through the log-aware read
      ok("INSERT INTO mx_a VALUES (-1, 1.5), (-2, 2.5)")
      assert(count("k < 0") == 2, "batch-appended rows invisible behind the sink log")
      assert(count() == c1 + 2)
      // (b) resuming past the diverged log refuses by name
      errLike("INSERT INTO mx_a SELECT k, v FROM mx_src",
        "would silently SKIP")
      // OVERWRITE resets the dir AND drops the stale log…
      ok("INSERT OVERWRITE mx_a SELECT CAST(-7 AS INT), CAST(0.5 AS DOUBLE)")
      assert(count() == 1 && count("k = -7") == 1)
      // …(c) so a fresh streaming job over the now-unlogged batch data
      // refuses rather than hiding it behind a new log
      ok(s"ALTER TABLE mx_a SET ('checkpoint'='$runDir/cb')")
      errLike("INSERT INTO mx_a SELECT k, v FROM mx_src",
        "would create a streaming commit log over a directory already holding")
      // the named recovery: a fresh path streams fine
      ok(s"ALTER TABLE mx_a SET ('path'='$runDir/a2')")
      val j2 = "Job (\\S+) started".r.findFirstMatchIn(
        ok("INSERT INTO mx_a SELECT k, v FROM mx_src")).get.group(1)
      awaitTrue("fresh-path stream commits")(count() > 0)
      ok(s"STOP JOB '$j2'")
    } finally {
      graft.engine.Jobs.stopAll()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(runDir))
      gw.closeSession(h)
    }
  }

  test("live-writer guard + avro resume divergence + bounded inconclusive resume (r16)") {
    // Three r15-verdict/advice seams around the batch/streaming mixing key:
    //   (d) a batch INSERT into a path a streaming job is ACTIVELY writing
    //       refuses by name (committing to the live sink log would make the
    //       stream silently skip its next micro-batches; overwrite would
    //       delete the log out from under it) — and the claim is released
    //       the moment the job stops;
    //   (e) the avro sink (batch-id-tagged parts, no _spark_metadata) gets
    //       the same resume-divergence refusal as the logged formats: parts
    //       beyond the checkpoint's last batch mean a foreign job wrote the
    //       sink, and the resumed job's batches would overwrite them;
    //   (f) a resume with NOTHING to validate against (no replay, no new
    //       data) is INCONCLUSIVE, not healthy: it holds a bounded idle
    //       budget (so a slow source still gets validated) and then
    //       releases the statement with the job running — never a 240 s
    //       stall, never a false early "healthy" at 500 ms.
    import graft.engine.{Gateway, TableEnv, Jobs}
    TableEnv.clear()
    val gw = new Gateway(spark)
    val h = gw.openSession("r16mix")
    def run(s: String) = gw.fetchResults(gw.executeStatement(h, s), 0)
    def ok(s: String): String = {
      val r = run(s)
      assert(r.columns != Seq("error"), s"`$s` errored: ${r.rows.take(1)}")
      r.rows.headOption.map(_.head.toString).getOrElse("")
    }
    def errLike(s: String, contains: String): Unit = {
      val r = run(s)
      assert(r.columns == Seq("error"), s"`$s` should refuse, got ${r.rows.take(1)}")
      assert(r.rows.head.head.toString.contains(contains),
        s"`$s` error should mention '$contains': ${r.rows.head.head}")
    }
    def awaitTrue(what: String)(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 240L * 1000 * 1000 * 1000
      while (!cond && System.nanoTime() < deadline) Thread.sleep(250)
      assert(cond, s"timed out waiting for: $what")
    }
    val runDir = s"/tmp/graft-r16mix-${java.util.UUID.randomUUID()}"
    val noData = spark.conf.getOption("spark.sql.streaming.noDataMicroBatches.enabled")
    try {
      // ---- (d) live-writer refusal + release-on-stop --------------------
      ok("CREATE TABLE lw_src (k INT, v DOUBLE) WITH " +
        "('connector'='datagen','rows-per-second'='500')")
      ok(s"CREATE TABLE lw_t (k INT, v DOUBLE) WITH ('connector'='filesystem'," +
        s"'path'='$runDir/lw','format'='parquet','checkpoint'='$runDir/lwc')")
      val j = "Job (\\S+) started".r.findFirstMatchIn(
        ok("INSERT INTO lw_t SELECT k, v FROM lw_src")).get.group(1)
      // refuse IMMEDIATELY (before the first commit necessarily lands: the
      // guard must not depend on the sink log existing yet)...
      errLike("INSERT INTO lw_t VALUES (-1, 1.5)", "actively writing")
      // ...and keep refusing once it does, overwrite included
      awaitTrue("first commit")(
        run("SELECT count(*) AS n FROM lw_t").rows.head.head.toString.toLong > 0)
      errLike("INSERT INTO lw_t VALUES (-1, 1.5)", "actively writing")
      errLike("INSERT OVERWRITE lw_t SELECT CAST(1 AS INT), CAST(1.0 AS DOUBLE)",
        "actively writing")
      // the guard matches across path SPELLINGS: a SECOND binding naming
      // the same directory with an explicit scheme must refuse too — the
      // pre-r17 comparison was over unqualified strings, so 'file:/x' vs
      // '/x' silently missed and reintroduced the exact micro-batch skip
      // the guard exists to prevent (r16 ADVICE)
      ok(s"CREATE TABLE lw_alias (k INT, v DOUBLE) WITH " +
        s"('connector'='filesystem','path'='file:$runDir/lw','format'='parquet')")
      errLike("INSERT INTO lw_alias VALUES (-2, 2.5)", "actively writing")
      ok(s"STOP JOB '$j'")
      val c1 = run("SELECT count(*) AS n FROM lw_t").rows.head.head.toString.toLong
      ok("INSERT INTO lw_t VALUES (-1, 1.5)") // stop releases the claim
      assert(run("SELECT count(*) AS n FROM lw_t WHERE k = -1")
        .rows.head.head.toString.toLong == 1)
      assert(run("SELECT count(*) AS n FROM lw_t").rows.head.head.toString.toLong == c1 + 1)
      // ---- (e) avro resume divergence ------------------------------------
      ok(s"CREATE TABLE av_t (k INT, v DOUBLE) WITH ('connector'='filesystem'," +
        s"'path'='$runDir/av','format'='avro','checkpoint'='$runDir/avc')")
      val ja = "Job (\\S+) started".r.findFirstMatchIn(
        ok("INSERT INTO av_t SELECT k, v FROM lw_src")).get.group(1)
      awaitTrue("avro batch-0 part")(
        new java.io.File(s"$runDir/av").listFiles() != null &&
          new java.io.File(s"$runDir/av").listFiles()
            .exists(_.getName.matches(""".*-batch-\d+\.avro""")))
      ok(s"STOP JOB '$ja'")
      // a FOREIGN job's tagged part beyond our checkpoint's batches
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$runDir/av/foreign-batch-99.avro"),
        Array.emptyByteArray)
      errLike("INSERT INTO av_t SELECT k, v FROM lw_src",
        "would silently OVERWRITE")
      // recovery path the error names: fresh path + checkpoint streams fine
      ok(s"ALTER TABLE av_t SET ('path'='$runDir/av2','checkpoint'='$runDir/avc2')")
      val ja2 = "Job (\\S+) started".r.findFirstMatchIn(
        ok("INSERT INTO av_t SELECT k, v FROM lw_src")).get.group(1)
      ok(s"STOP JOB '$ja2'")
      // ---- (f) inconclusive idle resume is bounded, not a stall ---------
      val srcDir = s"$runDir/fsrc"
      import spark.implicits._
      // without this, Spark appends a no-data batch after every data batch
      // and RE-RUNS it at restart — a real validated batch, so the resume
      // is conclusive in ~0.1 s and never exercises the idle path
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      Seq((1, 1.0), (2, 2.0), (3, 3.0)).toDF("k", "v")
        .coalesce(1).write.parquet(srcDir)
      TableEnv.createTable(spark, s"CREATE TABLE fidle_src (k INT, v DOUBLE) " +
        s"WITH ('connector'='filesystem','path'='$srcDir','format'='parquet')")
      TableEnv.createTable(spark, s"CREATE TABLE fidle_t (k INT, v DOUBLE) " +
        s"WITH ('connector'='filesystem','path'='$runDir/fidle'," +
        s"'format'='parquet','checkpoint'='$runDir/fidlec')")
      val srcB = TableEnv.lookup("fidle_src").get
      val sinkB = TableEnv.lookup("fidle_t").get
      val j1 = TableEnv.startStreamingInsert(spark, sinkB,
        TableEnv.streamDF(spark, srcB))
      awaitTrue("file-source rows commit")(
        try spark.read.parquet(s"$runDir/fidle").count() == 3
        catch { case _: Exception => false })
      Jobs.stop(j1)
      def logMax(sub: String): Long = {
        val f = new java.io.File(s"$runDir/fidlec/$sub")
        Option(f.listFiles()).map(_.map(_.getName)
          .flatMap(n => "^(\\d+)".r.findFirstIn(n)).map(_.toLong))
          .filter(_.nonEmpty).map(_.max).getOrElse(-1L)
      }
      assert(logMax("offsets") == logMax("commits"),
        "precondition: run 1 must stop fully committed")
      val commitsBefore = logMax("commits")
      // Resume with no new files: nothing replays, nothing arrives, the
      // commits log never advances (Spark DOES emit a no-data progress
      // EVENT for batch n+1 — measured — which is why progress events must
      // not count as validation). The old 500 ms idle exit claimed
      // "healthy" with the state store never touched; the fix holds a
      // ~15 s inconclusive budget keyed on the COMMITS log, then releases
      // the statement with the job running — never a 240 s stall.
      val t0 = System.nanoTime()
      val j2 = TableEnv.startStreamingInsert(spark, sinkB,
        TableEnv.streamDF(spark, srcB))
      val sec = (System.nanoTime() - t0) / 1e9
      val q2 = Jobs.get(j2).get
      assert(q2.isActive && q2.exception.isEmpty,
        s"idle resume must stay healthy: ${q2.exception}")
      assert(sec < 120, f"inconclusive resume must be bounded, took $sec%.1f s")
      assert(sec > 4, f"idle-with-nothing-validated must NOT be released at " +
        f"500 ms (r15 ADVICE) — returned in $sec%.1f s")
      assert(logMax("commits") == commitsBefore,
        "precondition violated: no batch should have committed on this resume")
      Jobs.stop(j2)
    } finally {
      noData match {
        case Some(v) => spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", v)
        case None => spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
      }
      graft.engine.Jobs.stopAll()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(runDir))
      gw.closeSession(h)
    }
  }

  test("statement set: a member's restart refusal fails the set by index with siblings stopped (r16)") {
    // The full stop/ALTER/re-set choreography the r15 verdict asked for:
    // a statement set whose SECOND member must refuse at start — its
    // checkpoint resume diverged (the stateful agg shape changed under it)
    // — answers a named per-member error, and the streaming job its healthy
    // FIRST member already started is stopped: the set never half-runs.
    import graft.engine.{Gateway, TableEnv, Jobs}
    TableEnv.clear()
    Jobs.clearHistory() // suite-order independence: SHOW JOBS is global
    val gw = new Gateway(spark)
    val h = gw.openSession("r16set")
    def run(s: String) = gw.fetchResults(gw.executeStatement(h, s), 0)
    def ok(s: String): String = {
      val r = run(s)
      assert(r.columns != Seq("error"), s"`$s` errored: ${r.rows.take(1)}")
      r.rows.headOption.map(_.head.toString).getOrElse("")
    }
    def awaitTrue(what: String)(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 240L * 1000 * 1000 * 1000
      while (!cond && System.nanoTime() < deadline) Thread.sleep(250)
      assert(cond, s"timed out waiting for: $what")
    }
    def count(tbl: String, pred: String = "true"): Long =
      try run(s"SELECT count(*) AS n FROM $tbl WHERE $pred").rows.head.head.toString.toLong
      catch { case _: Exception => -1L }
    val runDir = s"/tmp/graft-r16set-${java.util.UUID.randomUUID()}"
    ok("CREATE TABLE ss_src (k INT, ts TIMESTAMP(3), v DOUBLE, " +
      "WATERMARK FOR ts AS ts - INTERVAL '5' SECOND) WITH " +
      "('connector'='datagen','rows-per-second'='500')")
    ok(s"CREATE TABLE ss_a (k INT, v DOUBLE) WITH ('connector'='filesystem'," +
      s"'path'='$runDir/a','format'='parquet','checkpoint'='$runDir/ca')")
    ok(s"CREATE TABLE ss_b (ws TIMESTAMP(3), sv DOUBLE) WITH " +
      s"('connector'='filesystem','path'='$runDir/b','format'='parquet'," +
      s"'checkpoint'='$runDir/cb')")
    val agg = "SELECT window_start, SUM(v) AS sv FROM TABLE(TUMBLE(TABLE " +
      "ss_src, DESCRIPTOR(ts), INTERVAL '10' SECOND)) " +
      "GROUP BY window_start, window_end"
    try {
      // seed ss_b's checkpoint with the ORIGINAL agg shape, then stop
      val jb = "Job (\\S+) started".r.findFirstMatchIn(
        ok(s"INSERT INTO ss_b $agg")).get.group(1)
      awaitTrue("ss_b commits closed windows")(count("ss_b") > 0)
      ok(s"STOP JOB '$jb'")
      // evolve the sink AND the query's stateful shape under the checkpoint
      ok("ALTER TABLE ss_b ADD n BIGINT")
      val evolvedAgg = "SELECT window_start, SUM(v) AS sv, COUNT(*) AS n " +
        "FROM TABLE(TUMBLE(TABLE ss_src, DESCRIPTOR(ts), INTERVAL '10' " +
        "SECOND)) GROUP BY window_start, window_end"
      // the set: member 1 is healthy and STARTS; member 2's restart must
      // answer the named refusal — the whole set fails by member index and
      // member 1's job is stopped
      val r = run("BEGIN STATEMENT SET; " +
        "INSERT INTO ss_a SELECT k, v FROM ss_src; " +
        s"INSERT INTO ss_b $evolvedAgg; END")
      assert(r.columns == Seq("error"), s"the set must fail: ${r.rows.take(1)}")
      val msg = r.rows.head.head.toString
      assert(msg.contains("member 2 of 2"), s"must name the failing member: $msg")
      assert(msg.contains("could not restart from its checkpoint"),
        s"must carry the restart refusal: $msg")
      assert(msg.contains("streaming job(s) earlier members started were stopped"),
        s"must report sibling cleanup: $msg")
      awaitTrue("no job left RUNNING")(
        run("SHOW JOBS").rows.forall(_.apply(2).toString != "RUNNING"))
      // member 2's failed job stays visible (FAILED) — the SHOW JOBS
      // contract of the single-statement restart path holds inside sets too
      assert(run("SHOW JOBS").rows.exists(row =>
        row(1).toString.startsWith("ss_b_") && row(2).toString == "FAILED"),
        "the refused member's job must stay visible as FAILED")
      // recovery: fresh checkpoint + path for ss_b, the SAME set runs whole
      ok(s"ALTER TABLE ss_b SET ('path'='$runDir/b2','checkpoint'='$runDir/cb2')")
      ok("BEGIN STATEMENT SET; " +
        "INSERT INTO ss_a SELECT k, v FROM ss_src; " +
        s"INSERT INTO ss_b $evolvedAgg; END")
      awaitTrue("both members commit")(
        count("ss_a") > 0 && count("ss_b", "n IS NOT NULL") > 0)
    } finally {
      graft.engine.Jobs.stopAll()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(runDir))
      gw.closeSession(h)
    }
  }

  test("raced kills of a stateful windowed aggregation resume exactly-once from checkpoint") {
    // The fuzz above stops cleanly at batch boundaries; this test kills the
    // query WHEREVER it happens to be — racing the state-store commit, the
    // file-sink manifest commit, and the offset-log commit — three times,
    // then lets a final run drain. The file sink's metadata log must
    // exclude any orphan files from killed batches and the restored state
    // must not double- or drop-count: the final sink contents equal the
    // batch aggregation of the input, exactly once.
    val rnd = new scala.util.Random(42)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-rkill-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-rkill-out").toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    val ckpt = freshCkpt("raced_kill")
    // integer-valued v keeps double sums exact whatever the partial-agg
    // association order is
    val real = (0 until 2400).map(j =>
      (j % 7L, ts(3600L + j / 4 + rnd.nextInt(2)), (j % 100).toDouble))
    // two far-future rows: the second's watermark closes the first's
    // window, so every REAL window plus the first far-future one emits
    val all = real ++ Seq((99L, ts(10000000L), 1.0), (98L, ts(20000000L), 1.0))
    import spark.implicits._
    all.grouped(100).zipWithIndex.foreach { case (chunk, gi) =>
      chunk.toDF("user_id", "ets", "v").coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    val schema = spark.read.parquet(srcDir).schema
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .withWatermark("ets", "30 seconds")
      .groupBy(window(col("ets"), "60 seconds"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .select(col("window.start").as("ws"), col("user_id"), col("n"), col("sv"))
    def start() = stream.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt.getAbsolutePath)
      .outputMode("append").start()
    try {
      Seq(400L, 900L, 1700L).foreach { sleepMs =>
        val q = start()
        Thread.sleep(sleepMs)
        q.stop() // kill wherever the micro-batch happens to be
      }
      val q = start()
      q.processAllAvailable()
      q.stop()
      val streamed = spark.read.parquet(outDir) // metadata-log-aware read
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      // exactly-once: one row per (window, key), values equal batch
      assert(streamed.map(r => (r._1, r._2)).distinct.length == streamed.length,
        "a replayed batch double-emitted a window")
      val expected = real.toDF("user_id", "ets", "v")
        .union(Seq((99L, ts(10000000L), 1.0)).toDF("user_id", "ets", "v"))
        .groupBy(window(col("ets"), "60 seconds"), col("user_id"))
        .agg(count(lit(1)).as("n"), sum("v").as("sv"))
        .select(col("window.start").as("ws"), col("user_id"), col("n"), col("sv"))
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(streamed.toSet == expected.toSet,
        s"resume diverged from batch: extra=${streamed.toSet.diff(expected.toSet).take(3)} " +
          s"missing=${expected.toSet.diff(streamed.toSet).take(3)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(srcDir))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
      org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
    }
  }

  test("live-writer guard: spelling-SET match survives one-sided qualification fallback (r18)") {
    // r17 fixed the guard to compare filesystem-QUALIFIED paths, but
    // qualification runs independently on the register and probe sides
    // (different times, different threads) — one side can qualify while the
    // other falls back (no active session during shutdown, transient FS
    // init failure), and a qualified-vs-raw comparison silently misses
    // again. r18: both sides carry the SET {raw, qualified} and match on
    // intersection, so a one-sided fallback still matches on the raw
    // spelling both were given.
    import graft.engine.Jobs
    val forms = Jobs.pathForms("/tmp/graft-guard-sets")
    assert(forms.contains("/tmp/graft-guard-sets"), "raw spelling must stay in the set")
    assert(forms.exists(_.startsWith("file:")), "qualified spelling must join the set")
    // one-sided fallback simulations: a side that could NOT qualify carries
    // only the raw form — intersection with the other side's full set must
    // stay non-empty in both directions
    assert((forms & Set("/tmp/graft-guard-sets")).nonEmpty,
      "register qualified + probe fell back: must still match")
    assert((Jobs.pathForms("file:/tmp/graft-guard-sets") & forms).nonEmpty,
      "spelled with scheme vs without: must still match")
    // a scheme with no loadable filesystem: qualification fails, the raw
    // form alone still matches a same-spelling probe (never an exception)
    val bogus = Jobs.pathForms("nosuchfs12345://bucket/dir")
    assert(bogus == Set("nosuchfs12345://bucket/dir"))
    assert((bogus & Jobs.pathForms("nosuchfs12345://bucket/dir")).nonEmpty)
  }
}
