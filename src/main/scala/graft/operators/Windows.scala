package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Flink window TVFs re-expressed as Spark DataFrame transforms.
  *
  * Reference surface: TUMBLE/HOP/SESSION/CUMULATE table-valued functions
  * (reference test/syntax-test.fsql:196-239, snippets/flink.code-snippets:45-68,
  * grammar syntaxes/flink.tmLanguage.json:391). Flink exposes the window as
  * `window_start`/`window_end` columns; we do the same so downstream GROUP BY
  * window_start, window_end works verbatim.
  *
  * TUMBLE/HOP map 1:1 onto Spark's `window()` expression and SESSION onto
  * `session_window()` — both are native, codegen'd, and streaming-capable
  * (watermark-aware), so they scale: the window assignment is a per-row
  * projection (HOP explodes into size/slide rows), and the aggregation that
  * follows is an ordinary partial+final hash aggregate on the shuffle key
  * (window_start, keys...).
  *
  * CUMULATE has no Spark counterpart: we expand each row into its open
  * cumulative windows with `explode(sequence(...))` — a pure projection, no
  * shuffle, no driver state — then the caller aggregates. Expansion factor is
  * size/step (bounded, known at plan time), identical to what Flink's
  * cumulate operator materializes in state.
  */
object Windows {

  /** TUMBLE(TABLE t, DESCRIPTOR(ts), size) — fixed, non-overlapping windows. */
  def tumble(df: DataFrame, tsCol: String, size: String): DataFrame =
    withStartEnd(df, window(col(tsCol), size))

  /** HOP(TABLE t, DESCRIPTOR(ts), slide, size) — sliding windows. */
  def hop(df: DataFrame, tsCol: String, slide: String, size: String): DataFrame =
    withStartEnd(df, window(col(tsCol), size, slide))

  /** SESSION(TABLE t, DESCRIPTOR(ts), gap): session_window() must live in the
    * groupBy itself, so this returns the grouping column. Window is
    * [first event, last event + gap) — Flink's session semantics. */
  def sessionWindow(tsCol: String, gap: String): Column = session_window(col(tsCol), gap)

  /** Streaming-mode grouping column for TUMBLE/HOP: in append mode the
    * event-time tag lives on the window STRUCT, so streaming aggregations
    * must group by the struct itself (then select `window.start/end` as
    * window_start/window_end after the agg). Batch mode can use the
    * projected tumble()/hop() columns directly. */
  def tumbleWindow(tsCol: String, size: String): Column = window(col(tsCol), size)
  def hopWindow(tsCol: String, slide: String, size: String): Column =
    window(col(tsCol), size, slide)

  /** CUMULATE(TABLE t, DESCRIPTOR(ts), step, size) — expanding windows that
    * share a start aligned to `size` and grow by `step` until `size`:
    * [0,step), [0,2*step), ..., [0,size). A row at offset o from the aligned
    * start belongs to every window whose end > o, i.e. ends
    * (floor(o/step)+1)*step .. size.
    *
    * stepSec/sizeSec in whole seconds; sizeSec % stepSec must be 0 (Flink
    * enforces the same).
    */
  def cumulate(df: DataFrame, tsCol: String, stepSec: Long, sizeSec: Long): DataFrame = {
    require(sizeSec % stepSec == 0, s"CUMULATE size ($sizeSec s) must be a multiple of step ($stepSec s)")
    df.withColumn("window_start", window(col(tsCol), s"$sizeSec seconds").getField("start"))
      .withColumn("__off_sec",
        expr(s"(unix_micros(cast(`$tsCol` as timestamp)) - unix_micros(cast(window_start as timestamp))) div 1000000"))
      .withColumn("__end_sec",
        explode(sequence(
          (expr(s"__off_sec div $stepSec") + lit(1L)) * lit(stepSec),
          lit(sizeSec), lit(stepSec))))
      .withColumn("window_end", expr("window_start + make_dt_interval(0, 0, 0, __end_sec)"))
      .drop("__off_sec", "__end_sec")
  }

  private def withStartEnd(df: DataFrame, w: Column): DataFrame =
    df.withColumn("__w", w)
      .withColumn("window_start", col("__w.start"))
      .withColumn("window_end", col("__w.end"))
      .drop("__w")

  /** A decomposable aggregate for [[cumulativeAgg]]: `partial` computes the
    * per-bucket piece, `merge` recombines partials across buckets into the
    * final value under the same output name. */
  final case class CumAgg(partial: Column, merge: String => Column, alias: String)
  object CumAgg {
    def count(alias: String): CumAgg =
      CumAgg(org.apache.spark.sql.functions.count(lit(1)),
        p => sum(col(p)).cast("long"), alias)
    /** Exact-decimal sum surfaced as double (the repo-wide dsum convention —
      * partials stay decimal so the merge order can't drift the hash). */
    def dsum(e: String, alias: String): CumAgg =
      CumAgg(expr(s"sum(cast(($e) as decimal(18,4)))"),
        p => expr(s"cast(sum(`$p`) as double)"), alias)
    def min(e: String, alias: String): CumAgg =
      CumAgg(org.apache.spark.sql.functions.min(expr(e)),
        p => org.apache.spark.sql.functions.min(col(p)), alias)
    def max(e: String, alias: String): CumAgg =
      CumAgg(org.apache.spark.sql.functions.max(expr(e)),
        p => org.apache.spark.sql.functions.max(col(p)), alias)
  }

  /** HOP + decomposable GROUP BY (window_start, window_end, keys...) via
    * pane-based two-phase aggregation (the "pairs/panes" scheme: Li et al.,
    * "No Pane, No Gain", SIGMOD Record 34(1), 2005). Spark's native sliding
    * `window()` lowers to an Expand that replicates every input row into
    * size/slide overlapping windows before aggregating. Here each row is
    * assigned ONE tumbling pane of width `slide`, partials aggregate per
    * (pane, keys) — map-side combine on unreplicated input — and the
    * size/slide expansion replicates only the grouped pane partials, which
    * every hop window covering the pane then merges. O(groups × size/slide)
    * expansion instead of O(rows × size/slide); bit-identical to the native
    * path for any decomposable [[CumAgg]] (spec-pinned).
    *
    * sizeSec % slideSec must be 0 (Flink HOP requires the same to align
    * windows; panes require it too). */
  def hopAggregate(df: DataFrame, tsCol: String, slideSec: Long, sizeSec: Long,
      keys: Seq[String], aggs: Seq[CumAgg]): DataFrame = {
    require(sizeSec % slideSec == 0, s"HOP size ($sizeSec s) must be a multiple of slide ($slideSec s)")
    require(aggs.nonEmpty, "hopAggregate needs at least one aggregate")
    val nPanes = sizeSec / slideSec
    val partialCols = aggs.zipWithIndex.map { case (a, i) => a.partial.as(s"__p$i") }
    val mergeCols = aggs.zipWithIndex.map { case (a, i) => a.merge(s"__p$i").as(a.alias) }
    val keyCols = keys.map(col)
    df.withColumn("__pane_start", window(col(tsCol), s"$slideSec seconds").getField("start"))
      .groupBy(col("__pane_start") +: keyCols: _*)
      .agg(partialCols.head, partialCols.tail: _*)
      // pane at p feeds hop windows starting p, p-slide, ..., p-(n-1)*slide
      .withColumn("__k", explode(sequence(lit(0L), lit(nPanes - 1), lit(1L))))
      .withColumn("window_start",
        expr(s"__pane_start - make_dt_interval(0, 0, 0, __k * $slideSec)"))
      .withColumn("window_end", expr(s"window_start + make_dt_interval(0, 0, 0, ${sizeSec}L)"))
      .groupBy(col("window_start") +: col("window_end") +: keyCols: _*)
      .agg(mergeCols.head, mergeCols.tail: _*)
  }

  /** CUMULATE + decomposable GROUP BY (window_start, window_end, keys...) in
    * two phases: aggregate per (aligned start, first-open-window end, keys)
    * FIRST, then explode each tiny partial row into the windows it feeds and
    * merge. [[cumulate]]'s row expansion multiplies the INPUT by up to
    * size/step before any reduction — fine at test scale, but at 10^11 rows
    * that is size/step extra passes of partial aggregation. Here the explode
    * runs on post-aggregation cardinality (buckets × keys — data-independent
    * once the corpus covers the key space), so the expansion cost is
    * O(groups), not O(rows): the shape that survives a 1000× scale-up.
    * Results are bit-identical to cumulate-then-aggregate for any
    * decomposable [[CumAgg]] (spec-pinned).
    *
    * BATCH-ONLY shape: streaming keeps [[cumulate]]'s row expansion (and
    * [[graft.plans.CumulateTwoPhase]] excludes streaming plans) because the
    * two-phase chain is two stateful aggregations whose second grouping key
    * is a derived column pair, not a fixed-size `window()` over the
    * watermarked column — the only chained-stateful-agg shape the streaming
    * planner admits; CUMULATE's growing windows cannot be expressed as one.
    * The expansion path keeps ONE stateful aggregation (watermark-legal in
    * every output mode) and matches Flink's own per-step cumulate state.
    * StreamingSpec "streaming CUMULATE parity" pins stream == batch; for
    * bounded state on a watermarked stream use [[cumulateStreamingAgg]]. */
  def cumulativeAgg(df: DataFrame, tsCol: String, stepSec: Long, sizeSec: Long,
      keys: Seq[String], aggs: Seq[CumAgg]): DataFrame = {
    require(sizeSec % stepSec == 0, s"CUMULATE size ($sizeSec s) must be a multiple of step ($stepSec s)")
    require(aggs.nonEmpty, "cumulativeAgg needs at least one aggregate")
    val partialCols = aggs.zipWithIndex.map { case (a, i) => a.partial.as(s"__p$i") }
    val mergeCols = aggs.zipWithIndex.map { case (a, i) => a.merge(s"__p$i").as(a.alias) }
    val keyCols = keys.map(col)
    df.withColumn("window_start", window(col(tsCol), s"$sizeSec seconds").getField("start"))
      .withColumn("__first_end_sec",
        (expr(s"((unix_micros(cast(`$tsCol` as timestamp)) - unix_micros(cast(window_start as timestamp))) div 1000000) div $stepSec")
          + lit(1L)) * lit(stepSec))
      .groupBy(col("window_start") +: col("__first_end_sec") +: keyCols: _*)
      .agg(partialCols.head, partialCols.tail: _*)
      .withColumn("__end_sec", explode(sequence(col("__first_end_sec"), lit(sizeSec), lit(stepSec))))
      .withColumn("window_end", expr("window_start + make_dt_interval(0, 0, 0, __end_sec)"))
      .groupBy(col("window_start") +: col("window_end") +: keyCols: _*)
      .agg(mergeCols.head, mergeCols.tail: _*)
  }

  /** CUMULATE aggregation for a WATERMARKED STREAM with BOUNDED state: the
    * single stateful aggregation groups by the event-time `window(ts, size)`
    * STRUCT (which carries the watermark metadata, so Spark evicts a
    * size-window's state — all its cumulative steps — once the watermark
    * passes window_start + size) plus the derived step end. Without this,
    * grouping by the projected window_start/window_end columns (the batch
    * [[cumulate]] shape) loses the event-time tag and streaming state grows
    * forever. Output: (window_start, window_end, keys..., aggExprs...).
    *
    * Mode semantics vs Flink: update mode re-emits a step's row on every
    * refining batch (Flink's retract stream); append mode emits all of a
    * size-window's steps only when that window closes (Spark's eviction
    * horizon is the struct end — per-step early firing is not expressible).
    * State per key: size/step open steps per aligned window — same bound as
    * Flink's cumulate operator state. Spec: "streaming CUMULATE bounded
    * state" (row-for-row vs the batch expansion + eviction asserted via
    * StateOperatorProgress). `aggExprs` are plain aliased aggregates (one
    * stateful phase — no partial/merge split needed). */
  def cumulateStreamingAgg(df: DataFrame, tsCol: String, stepSec: Long, sizeSec: Long,
      keys: Seq[String], aggExprs: Seq[Column]): DataFrame = {
    require(sizeSec % stepSec == 0, s"CUMULATE size ($sizeSec s) must be a multiple of step ($stepSec s)")
    require(aggExprs.nonEmpty, "cumulateStreamingAgg needs at least one aggregate")
    val grouped = df.withColumn("__w", window(col(tsCol), s"$sizeSec seconds"))
      .withColumn("__off_sec",
        expr(s"(unix_micros(cast(`$tsCol` as timestamp)) - unix_micros(cast(__w.start as timestamp))) div 1000000"))
      .withColumn("__end_sec",
        explode(sequence(
          (expr(s"__off_sec div $stepSec") + lit(1L)) * lit(stepSec),
          lit(sizeSec), lit(stepSec))))
      .groupBy(col("__w") +: col("__end_sec") +: keys.map(col): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
      .withColumn("window_start", col("__w.start"))
      .withColumn("window_end", expr("window_start + make_dt_interval(0, 0, 0, __end_sec)"))
      .drop("__w", "__end_sec")
    val front = Seq("window_start", "window_end") ++ keys
    grouped.select((front ++ grouped.columns.filterNot(front.contains)).map(col): _*)
  }
}
