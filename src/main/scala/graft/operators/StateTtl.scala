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
  * Scale: state per live key is a fixed-width array of accumulator cells —
  * no rows are buffered; eviction is O(1) per expired key via the timeout
  * callback, the same shape Spark's own streaming dedup uses. Output is an
  * update-mode changelog (one refreshed row per key per batch), matching the
  * unwindowed streaming aggregation it replaces.
  *
  * Aggregates supported: COUNT(*) / COUNT(col) (long; COUNT(col) skips
  * NULLs like SQL), SUM/MIN/MAX over integral (byte/short/int/long) and
  * floating (float/double) columns. Accumulation is TYPED so the result
  * types match the native aggregation being replaced: SUM(integral) → long,
  * SUM(floating) → double, MIN/MAX(t) → t. Decimal and non-numeric inputs
  * are not supported here — [[graft.engine.Gateway.ttlAggregate]] routes
  * those statements to the native (non-TTL) path.
  */
object StateTtl {

  /** (kind, field, alias); kind ∈ count | sum | min | max ("*" field for count). */
  type AggSpec = (String, String, String)

  /** Input types the typed accumulators cover. Decimals are deliberately
    * excluded (sum precision widening is the native path's job). */
  def supportedInput(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType => true
    case _ => false
  }

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
    val inType: Array[DataType] =
      aggIdx.map(i => if (i < 0) LongType else schema(i).dataType)
    inType.zip(aggsArr).foreach { case (dt, (kind, field, _)) =>
      require(kind == "count" || supportedInput(dt),
        s"TTL $kind($field): unsupported input type $dt — " +
          "integral/floating only (decimals keep the native path)")
    }
    // integral inputs accumulate in a Long cell, floating in a Double cell;
    // COUNT always in Long — result types then match the native aggregation
    val isLongCell: Array[Boolean] = aggsArr.indices.map { i =>
      aggsArr(i)._1 == "count" || (inType(i) match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      })
    }.toArray
    def outType(i: Int): DataType = aggsArr(i)._1 match {
      case "count" => LongType
      case "sum" => if (isLongCell(i)) LongType else DoubleType
      case _ => inType(i) // min/max keep the input type
    }
    val outSchema = StructType(
      keys.map(k => schema(schema.fieldIndex(k))) ++
        aggsArr.indices.map(i => StructField(aggsArr(i)._3, outType(i), nullable = true)))
    val rowEnc = org.apache.spark.sql.Encoders.row(schema)
    val outEnc = org.apache.spark.sql.Encoders.row(outSchema)
    // state: one boxed cell per aggregate (java.lang.Long or java.lang.Double
    // per isLongCell; null = unseen) + the newest event time for this key
    val stateEnc = org.apache.spark.sql.Encoders.javaSerialization[(Array[AnyRef], Long)]

    def tsMillis(r: Row): Long = r.get(tsIdx) match {
      case t: java.sql.Timestamp => t.getTime
      case i: java.time.Instant => i.toEpochMilli
      case l: java.time.LocalDateTime => l.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case l: Long => l
      case other => throw new IllegalArgumentException(s"not an event time: $other")
    }
    // emit the accumulator in the declared output type (cast back for
    // narrow min/max inputs); count's unseen cell is 0, others NULL
    def emit(i: Int, cell: AnyRef): Any = {
      if (cell == null) return if (aggsArr(i)._1 == "count") 0L else null
      (outType(i), cell) match {
        case (LongType, l: java.lang.Long) => l.longValue()
        case (IntegerType, l: java.lang.Long) => l.intValue()
        case (ShortType, l: java.lang.Long) => l.shortValue()
        case (ByteType, l: java.lang.Long) => l.byteValue()
        case (DoubleType, d: java.lang.Double) => d.doubleValue()
        case (FloatType, d: java.lang.Double) => d.floatValue()
        case (t, c) => throw new IllegalStateException(s"TTL emit mismatch $t/$c")
      }
    }

    val grouped = df.as(rowEnc)
      .groupByKey(StateKeys.encoder(schema, keys))(org.apache.spark.sql.Encoders.STRING)

    val out = grouped.flatMapGroupsWithState(
      OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
      (_: String, rows: Iterator[Row], state: GroupState[(Array[AnyRef], Long)]) => {
        if (state.hasTimedOut) {
          // watermark passed lastEventTime + ttl with no updates: expire
          state.remove()
          Iterator.empty
        } else {
          val wm = state.getCurrentWatermarkMs()
          val (acc0, last0) =
            state.getOption.getOrElse((new Array[AnyRef](aggsArr.length), Long.MinValue))
          // a key can receive fresh rows in the same batch its state would
          // have expired — apply the eviction before folding, as the timeout
          // callback only fires for keys with NO data this batch
          val expired = last0 != Long.MinValue && wm > last0 + ttlMillis
          val acc = if (expired) new Array[AnyRef](aggsArr.length) else acc0
          var last = if (expired) Long.MinValue else last0
          var keyRow: Row = null
          rows.foreach { r =>
            keyRow = r
            last = math.max(last, tsMillis(r))
            var i = 0
            while (i < aggsArr.length) {
              val (kind, _, _) = aggsArr(i)
              val idx = aggIdx(i)
              val isNull = idx >= 0 && r.isNullAt(idx)
              if (kind == "count") {
                // COUNT(col) skips NULLs; COUNT(*) (idx < 0) counts every row
                if (!isNull) {
                  val prev = if (acc(i) == null) 0L else acc(i).asInstanceOf[java.lang.Long].longValue()
                  acc(i) = java.lang.Long.valueOf(prev + 1L)
                }
              } else if (!isNull) {
                val n = r.get(idx).asInstanceOf[Number]
                if (isLongCell(i)) {
                  val v = n.longValue()
                  acc(i) =
                    if (acc(i) == null) java.lang.Long.valueOf(v)
                    else {
                      val p = acc(i).asInstanceOf[java.lang.Long].longValue()
                      java.lang.Long.valueOf(kind match {
                        case "sum" => p + v
                        case "min" => math.min(p, v)
                        case "max" => math.max(p, v)
                      })
                    }
                } else {
                  val v = n.doubleValue()
                  acc(i) =
                    if (acc(i) == null) java.lang.Double.valueOf(v)
                    else {
                      val p = acc(i).asInstanceOf[java.lang.Double].doubleValue()
                      // Double.compare's total order (NaN greatest), not
                      // math.min/max: Spark SQL MIN of [5.0, NaN, 3.0] is
                      // 3.0 (NaN sorts greatest), while math.min would
                      // propagate NaN for the rest of the key's lifetime
                      java.lang.Double.valueOf(kind match {
                        case "sum" => p + v
                        case "min" => if (java.lang.Double.compare(p, v) <= 0) p else v
                        case "max" => if (java.lang.Double.compare(p, v) >= 0) p else v
                      })
                    }
                }
              }
              i += 1
            }
          }
          state.update((acc, last))
          state.setTimeoutTimestamp(last + ttlMillis)
          if (keyRow == null) Iterator.empty
          else Iterator.single(Row.fromSeq(
            keyIdx.toSeq.map(keyRow.get) ++ aggsArr.indices.map(i => emit(i, acc(i)))))
        }
      })(stateEnc, outEnc)

    out.toDF()
  }
}
