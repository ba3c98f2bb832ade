package graft

import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.FlinkDialect
import graft.queries.StreamParityQueries.{drain, withParityConf}

/** Streaming TVF SQL fuzz (r12): DialectFuzzSpec reparses rewritten TVF SQL
  * but never EXECUTES it against a stream. Each random config here drives
  * the full user path — Flink TVF SQL text → FlinkDialect.rewrite →
  * spark.sql over a watermarked MemoryStream-backed view → append-mode
  * sink drained over multi-batch waves — and the closed windows must equal
  * the batch execution of the SAME rewritten SQL on the same rows, minus
  * rows planted as unambiguously late (their windows end far below the
  * already-advanced watermark), which the stream side must DROP.
  *
  * Config space: window kind (TUMBLE / HOP / CUMULATE / SESSION),
  * size/slide/step/gap,
  * SECOND vs MINUTE interval units, watermark delay 0–20 s, 1–4 keys,
  * keyed vs global grouping, boundary-exact timestamps, and 0–4 late rows.
  * Late-drop determinism: real rows live ≥ 3600 s, late rows at ≤ 120 s,
  * window sizes ≤ 240 s — a late row's last window ends ≤ 360 s while the
  * watermark after the real waves is ≥ 3580 s, so the drop is unambiguous
  * (no exact-tie dependence on the late-filter edge semantics).
  *
  * Two Spark micro-batch facts this harness had to learn (found by this
  * fuzz, pinned below in "late filter uses the one-batch-lagged
  * watermark"): (1) late events are filtered against
  * eventTimeWatermarkForLateEvents — the watermark of the PREVIOUS batch —
  * so with no-data micro-batches disabled (the parity-gate conf) a late
  * row must arrive ≥ 2 batches after the data that advanced the watermark,
  * or it is legitimately admitted and re-emits its closed window; hence
  * late rows ride a DEDICATED third wave. (2) eviction uses the current
  * batch's watermark, so the final real windows flush only on a SECOND
  * far-future pusher batch (the first pusher still evicts with the
  * real-data watermark).
  */
class StreamFuzzSpec extends SparkTestBase {

  private val N = sys.props.get("graft.streamfuzz.n").map(_.toInt).getOrElse(500)

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("ets", TimestampType),
    StructField("v", DoubleType)))

  private def ts(sec: Long, ms: Int = 0): Timestamp =
    Timestamp.from(Instant.ofEpochMilli(sec * 1000L + ms))

  /** INTERVAL text: prefer MINUTE when exact, for unit-path coverage. */
  private def interval(sec: Int): String =
    if (sec % 60 == 0) s"INTERVAL '${sec / 60}' MINUTE"
    else s"INTERVAL '$sec' SECOND"

  test("late filter uses the one-batch-lagged watermark (no-data batches off)") {
    // Pinned Spark semantics the fuzz harness depends on: with no-data
    // micro-batches disabled, a late row arriving in the batch IMMEDIATELY
    // after the watermark-advancing data is admitted (the late filter sees
    // the previous batch's watermark = initial 0) and re-emits its closed
    // window; the same row one batch later is dropped. If a Spark upgrade
    // changes either half, the fuzz's late-wave placement must be revisited.
    def run(laggedByOneBatch: Boolean): Long = withParityConf(spark) {
      val mem = MemoryStream[Row](
        org.apache.spark.sql.Encoders.row(schema), spark.sqlContext)
      val out = mem.toDF().withWatermark("ets", "16 seconds")
        .groupBy(window(col("ets"), "51 seconds", "22 seconds"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("n"))
      drain(spark, out, "fuzz_lag_sink") { q =>
        mem.addData((0 until 40).map(k => Row(1L, ts(3600 + k * 10), 1.0)): _*)
        q.processAllAvailable()
        if (!laggedByOneBatch) { // interpose a data batch: filter catches up
          mem.addData(Row(1L, ts(4010), 1.0)); q.processAllAvailable()
        }
        mem.addData(Row(1L, ts(91), 5.0)) // late: windows end ≤ 142 s
        q.processAllAvailable()
        mem.addData(Row(-1L, ts(1000000L), 0.0)); q.processAllAvailable()
        mem.addData(Row(-1L, ts(2000000L), 0.0)); q.processAllAvailable()
      }.filter(col("ws") < timestamp_seconds(lit(3000))).count()
    }
    assert(run(laggedByOneBatch = true) > 0,
      "expected the one-batch-lagged filter to ADMIT the immediate late row")
    assert(run(laggedByOneBatch = false) == 0,
      "expected the caught-up filter to DROP the late row")
  }

  test(s"$N random TVF window/watermark configs: stream == batch on closed windows") {
    val seed0 = 0x57f0f221L
    // Per-config wall time is dominated by micro-batch scheduling latency
    // (4-5 processAllAvailable round-trips + query start), not compute, so
    // configs run CONCURRENTLY on independent streams — 12 workers plus
    // single-partition state take the 500-config sweep from ~8 min
    // sequential to ~1.5 min (measured: 6 workers 2m23s, 12 workers 1m36s).
    val workers = 12
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def runConfig(i: Int): Unit = {
        val rnd = new scala.util.Random(seed0 + i)
        // ---- window shape
        val kind = rnd.nextInt(4)
        val keyed = rnd.nextBoolean()
        val (tvf, label) = kind match {
          case 0 =>
            val size = 5 + rnd.nextInt(236)
            (s"TUMBLE(TABLE %s, DESCRIPTOR(ets), ${interval(size)})",
              s"TUMBLE($size s)")
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
            // SESSION merges state across waves — the only TVF whose window
            // BOUNDS depend on other rows, so batch==stream pins the merge
            val gap = 2 + rnd.nextInt(59)
            val part = if (keyed) " PARTITION BY user_id" else ""
            (s"SESSION(TABLE %s$part, DESCRIPTOR(ets), ${interval(gap)})",
              s"SESSION($gap s)")
        }
        val delay = rnd.nextInt(21)
        val groupCols = if (keyed) "window_start, window_end, user_id"
          else "window_start, window_end"
        def sql(view: String) =
          s"""SELECT $groupCols, COUNT(*) AS n,
             |  SUM(CAST(v AS DECIMAL(20, 6))) AS sv
             |FROM TABLE(${tvf.format(view)})
             |GROUP BY $groupCols""".stripMargin
        // ---- data: contiguous-in-time waves, boundary-exact ts sometimes
        val nKeys = 1 + rnd.nextInt(4)
        val nRows = 40 + rnd.nextInt(81)
        val base = 3600L
        val rows = (0 until nRows).map { _ =>
          val sec = base + rnd.nextInt(601)
          val ms = if (rnd.nextInt(4) == 0) 0 else rnd.nextInt(1000)
          Row(rnd.nextInt(nKeys).toLong, ts(sec, ms), rnd.nextInt(1000) / 10.0)
        }.sortBy(_.getAs[Timestamp](1).getTime)
        val nLate = rnd.nextInt(5)
        val lateRows = (0 until nLate).map { _ =>
          Row(rnd.nextInt(nKeys).toLong, ts(1 + rnd.nextInt(120)), 5.0)
        }
        // ---- stream side: rewrite + execute over the watermarked stream
        val mem = MemoryStream[Row](
          org.apache.spark.sql.Encoders.row(schema), spark.sqlContext)
        mem.toDF().withWatermark("ets", s"$delay seconds")
          .createOrReplaceTempView(s"fuzz_stream_src_$i")
        val out = spark.sql(FlinkDialect.rewrite(sql(s"fuzz_stream_src_$i")))
        assert(out.isStreaming, s"[config $i] rewrite lost the streaming source")
        val streamed = drain(spark, out, s"fuzz_stream_sink_$i") { q =>
          val half = rows.length / 2
          val w1 = rnd.shuffle(rows.take(half))
          val w2 = rnd.shuffle(rows.drop(half))
          mem.addData(w1: _*); q.processAllAvailable()
          mem.addData(w2: _*); q.processAllAvailable()
          // late rows two batches behind the data that advanced the
          // watermark — the one-batch-lagged late filter now sees it
          if (lateRows.nonEmpty) {
            mem.addData(lateRows: _*); q.processAllAvailable()
          }
          // two pushers: the second's batch evicts with the first's
          // far-future watermark, flushing the final real windows
          mem.addData(Row(-1L, ts(1000000L), 0.0)); q.processAllAvailable()
          mem.addData(Row(-1L, ts(2000000L), 0.0)); q.processAllAvailable()
        }.filter(col("window_start") < timestamp_seconds(lit(500000)))
        // ---- batch side: SAME rewritten SQL, late rows excluded
        spark.createDataFrame(
            new java.util.ArrayList[Row](scala.jdk.CollectionConverters
              .SeqHasAsJava(rows).asJava), schema)
          .createOrReplaceTempView(s"fuzz_batch_src_$i")
        val batch = spark.sql(FlinkDialect.rewrite(sql(s"fuzz_batch_src_$i")))
        // ---- multiset diff, driver-side (both sides bounded)
        val cols = batch.columns.toSeq.sorted.map(col)
        def counts(df: DataFrame) = {
          val m = collection.mutable.Map.empty[Seq[Any], Long]
          df.select(cols: _*).collect()
            .foreach(r => m.update(r.toSeq, m.getOrElse(r.toSeq, 0L) + 1L))
          m
        }
        val (bc, sc) = (counts(batch), counts(streamed))
        val diff = (bc.keySet ++ sc.keySet).iterator
          .map(k => math.abs(bc.getOrElse(k, 0L) - sc.getOrElse(k, 0L))).sum
        if (diff != 0 || bc.isEmpty)
          failures.add(s"[config $i seed ${seed0 + i}] $label delay=${delay}s " +
            s"keys=$nKeys rows=$nRows late=$nLate keyed=$keyed -> " +
            s"diff=$diff batchRows=${bc.size} streamRows=${sc.size}")
        spark.catalog.dropTempView(s"fuzz_stream_src_$i")
        spark.catalog.dropTempView(s"fuzz_batch_src_$i")
        spark.catalog.dropTempView(s"fuzz_stream_sink_$i")
        ()
    }
    withParityConf(spark) {
      // one shuffle/state partition per stream: each config's state is a
      // few dozen windows, and per-batch overhead is linear in state-store
      // partitions × concurrent queries. Multi-partition state correctness
      // is the parity gates' job (they run at 4).
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
        "fuzz pool did not finish")
      errs.forEach(e => info(s"${e.getMessage}: ${e.getCause}"))
      assert(errs.isEmpty, s"${errs.size} configs crashed (see info output)")
    }
    failures.forEach(f => info(f))
    assert(failures.isEmpty, s"${failures.size} of $N configs diverged (see info output)")
  }
}
