package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Flink `table.exec.state.ttl` for keyed streaming aggregations, mapped to
  * watermark-driven state eviction (the VERDICT/ADVICE "state TTL" gap).
  *
  * Flink expires aggregation state that has not been UPDATED for the TTL;
  * Spark's streaming `groupBy().agg()` keeps unwindowed aggregation state
  * forever. This operator re-expresses the aggregation with
  * `flatMapGroupsWithState` + event-time timeouts: a key's state carries
  * (aggregates, last event time); when the WATERMARK passes
  * `lastEventTime + ttl` the state is dropped — an idle key later receiving
  * new rows restarts its aggregate from zero, which is exactly the
  * observable behavior of Flink's TTL (OnCreateAndWrite update type,
  * NeverReturnExpired visibility), with the watermark standing in for
  * processing time so the semantics stay replayable/deterministic.
  *
  * Scale: state per live key is a fixed-width array of doubles — no rows are
  * buffered; eviction is O(1) per expired key via the timeout callback, the
  * same shape Spark's own streaming dedup uses. Output is an update-mode
  * changelog (one refreshed row per key per batch), matching the unwindowed
  * streaming aggregation it replaces.
  *
  * Aggregates supported: COUNT(*) (long), SUM/MIN/MAX(numeric-castable
  * column, emitted as double). Anything else should stay on the native
  * (non-TTL) path.
  */
object StateTtl {

  /** (kind, field, alias); kind ∈ count | sum | min | max ("*" field for count). */
  type AggSpec = (String, String, String)

  /** Parse a Flink TTL value: bare millis, or "<n> <unit>" with the usual
    * unit spellings. Returns milliseconds. */
  def parseTtlMillis(s: String): Long = {
    val t = s.trim.toLowerCase
    if (t.matches("\\d+")) t.toLong
    else {
      val m = """(\d+)\s*(ms|milliseconds?|s|sec|seconds?|min|minutes?|h|hours?|d|days?)""".r
        .findFirstMatchIn(t)
        .getOrElse(throw new IllegalArgumentException(
          s"cannot parse state TTL '$s' — use millis or '<n> <ms|s|min|h|d>'"))
      val n = m.group(1).toLong
      m.group(2) match {
        case u if u.startsWith("ms") || u.startsWith("milli") => n
        case u if u.startsWith("s") => n * 1000L
        case u if u.startsWith("min") => n * 60000L
        case u if u.startsWith("h") => n * 3600000L
        case _ => n * 86400000L
      }
    }
  }

  def ttlKeyedAgg(
      df: DataFrame, keys: Seq[String], tsCol: String,
      aggs: Seq[AggSpec], ttlMillis: Long): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(keys.nonEmpty && aggs.nonEmpty, "TTL aggregation needs keys and aggregates")
    require(aggs.forall(a => Set("count", "sum", "min", "max")(a._1)),
      s"unsupported TTL aggregate in ${aggs.map(_._1)}")

    val schema = df.schema
    val keyIdx = keys.map(schema.fieldIndex).toArray
    val tsIdx = schema.fieldIndex(tsCol)
    // the fold below runs per row — index positionally, never walk a List
    val aggsArr = aggs.toArray
    val aggIdx = aggs.map(a => if (a._2 == "*") -1 else schema.fieldIndex(a._2)).toArray
    val outSchema = StructType(
      keys.map(k => schema(schema.fieldIndex(k))) ++
        aggs.map(a => StructField(a._3,
          if (a._1 == "count") LongType else DoubleType, nullable = true)))
    val rowEnc = org.apache.spark.sql.Encoders.row(schema)
    val outEnc = org.apache.spark.sql.Encoders.row(outSchema)
    // state: one slot per aggregate (count as a double cell; NaN = unseen
    // for min/max) + the newest event time folded into this key's state
    val stateEnc = org.apache.spark.sql.Encoders.javaSerialization[(Array[Double], Long)]

    def tsMillis(r: Row): Long = r.get(tsIdx) match {
      case t: java.sql.Timestamp => t.getTime
      case i: java.time.Instant => i.toEpochMilli
      case l: java.time.LocalDateTime => l.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case l: Long => l
      case other => throw new IllegalArgumentException(s"not an event time: $other")
    }
    def num(r: Row, i: Int): Option[Double] = if (r.isNullAt(i)) None else (r.get(i) match {
      case n: Number => Some(n.doubleValue())
      case other => throw new IllegalArgumentException(s"not numeric: $other")
    })

    val grouped = df.as(rowEnc)
      .groupByKey(StateKeys.encoder(schema, keys))(org.apache.spark.sql.Encoders.STRING)

    val out = grouped.flatMapGroupsWithState(
      OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
      (_: String, rows: Iterator[Row], state: GroupState[(Array[Double], Long)]) => {
        if (state.hasTimedOut) {
          // watermark passed lastEventTime + ttl with no updates: expire
          state.remove()
          Iterator.empty
        } else {
          val wm = state.getCurrentWatermarkMs()
          val (acc0, last0) = state.getOption.getOrElse((Array.fill(aggsArr.length)(Double.NaN), Long.MinValue))
          // a key can receive fresh rows in the same batch its state would
          // have expired — apply the eviction before folding, as the timeout
          // callback only fires for keys with NO data this batch
          val expired = last0 != Long.MinValue && wm > last0 + ttlMillis
          val acc = if (expired) Array.fill(aggsArr.length)(Double.NaN) else acc0
          var last = if (expired) Long.MinValue else last0
          var keyRow: Row = null
          rows.foreach { r =>
            keyRow = r
            last = math.max(last, tsMillis(r))
            var i = 0
            while (i < aggsArr.length) {
              val (kind, _, _) = aggsArr(i)
              if (kind == "count") acc(i) = (if (acc(i).isNaN) 0d else acc(i)) + 1d
              else num(r, aggIdx(i)).foreach { v =>
                acc(i) =
                  if (acc(i).isNaN) v
                  else kind match {
                    case "sum" => acc(i) + v
                    case "min" => math.min(acc(i), v)
                    case "max" => math.max(acc(i), v)
                  }
              }
              i += 1
            }
          }
          state.update((acc, last))
          state.setTimeoutTimestamp(last + ttlMillis)
          if (keyRow == null) Iterator.empty
          else Iterator.single(Row.fromSeq(
            keyIdx.toSeq.map(keyRow.get) ++ aggsArr.toSeq.zipWithIndex.map {
              case ((kind, _, _), i) =>
                if (kind == "count") (if (acc(i).isNaN) 0L else acc(i).toLong)
                else if (acc(i).isNaN) null else acc(i)
            }))
        }
      })(stateEnc, outEnc)

    out.toDF()
  }
}
