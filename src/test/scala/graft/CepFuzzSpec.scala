package graft

import org.scalacheck.{Gen, rng}
import org.apache.spark.sql.functions._
import graft.operators.MatchRecognize
import graft.operators.MatchRecognize._

/** Differential fuzz of the MATCH_RECOGNIZE batch NFA (r11): with DISJOINT
  * define predicates, a pattern over variables is exactly a regex over the
  * row-classifier string, and ONE ROW PER MATCH + AFTER MATCH SKIP PAST
  * LAST ROW is exactly `java.util.regex.Matcher.find()`'s leftmost-greedy
  * non-overlapping scan. So the JDK's regex engine is a trusted oracle for
  * the 969-line NFA kernel: generate random patterns (quantifiers, ranges,
  * per-token alternation) and random symbol sequences, and compare every
  * match's per-variable row counts in match order.
  *
  * The generated first token is non-optional, so no pattern can match the
  * empty sequence (where SQL and regex semantics would part ways). */
class CepFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.from(0)
      .map(i => gen.apply(params, rng.Seed(seed + i)))
      .flatten.take(n).toSeq
  }

  private val varG = Gen.oneOf("A", "B", "C")
  private val quantG: Gen[String] = Gen.frequency(
    4 -> Gen.const(""), 2 -> Gen.const("+"), 2 -> Gen.const("*"),
    2 -> Gen.const("?"), 1 -> Gen.const("{2}"), 1 -> Gen.const("{1,2}"),
    1 -> Gen.const("{2,}"))

  /** (MATCH_RECOGNIZE token, equivalent regex token). */
  private val tokenG: Gen[(String, String)] = for {
    nv <- Gen.frequency(3 -> Gen.const(1), 1 -> Gen.const(2))
    vars <- Gen.pick(nv, Seq("A", "B", "C"))
    q <- quantG
  } yield
    if (vars.size == 1) (vars.head + q, vars.head + q)
    else (s"(${vars.mkString("|")})$q", s"[${vars.mkString}]$q")

  /** (pattern text, regex text) with a guaranteed non-optional head. */
  private val patternG: Gen[(String, String)] = for {
    headV <- varG
    headQ <- Gen.oneOf("", "+")
    n <- Gen.choose(0, 3)
    toks <- Gen.listOfN(n, tokenG)
  } yield (
    ((headV + headQ) +: toks.map(_._1)).mkString(" "),
    ((headV + headQ) +: toks.map(_._2)).mkString)

  private val seqG: Gen[String] =
    Gen.choose(3, 14).flatMap(len => Gen.stringOfN(len, Gen.oneOf('A', 'B', 'C')))

  /** regex-side reference: find() over the classifier string, emitting
    * (A-count, B-count, C-count) per match in match order. */
  private def refMatches(rx: String, syms: String): Seq[(Long, Long, Long)] = {
    val m = java.util.regex.Pattern.compile(rx).matcher(syms)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    while (m.find()) {
      val g = m.group()
      out += ((g.count(_ == 'A').toLong, g.count(_ == 'B').toLong,
        g.count(_ == 'C').toLong))
    }
    out.toSeq
  }

  /** SKIP TO NEXT ROW reference: an anchored match attempt at EVERY start
    * position (overlapping matches allowed), still leftmost-greedy. */
  private def refMatchesNextRow(rx: String, syms: String): Seq[(Long, Long, Long)] = {
    val p = java.util.regex.Pattern.compile(rx)
    (0 until syms.length).flatMap { i =>
      val m = p.matcher(syms).region(i, syms.length)
        .useTransparentBounds(false).useAnchoringBounds(true)
      if (m.lookingAt()) {
        val g = m.group()
        Some((g.count(_ == 'A').toLong, g.count(_ == 'B').toLong,
          g.count(_ == 'C').toLong))
      } else None
    }
  }

  private def checkCases(seed: Long, nCases: Int, skip: SkipMode,
      ref: (String, String) => Seq[(Long, Long, Long)], label: String): Unit = {
    val defines = Seq(
      "A" -> (col("value") < 10), "B" -> (col("value") >= 10 && col("value") < 20),
      "C" -> (col("value") >= 20))
    val measures = Seq(
      Measure("mno", "match_number", "", ""),
      Measure("n_a", "count", "A", "*"),
      Measure("n_b", "count", "B", "*"),
      Measure("n_c", "count", "C", "*"))
    def valueOf(c: Char): Double = c match {
      case 'A' => 5.0; case 'B' => 15.0; case _ => 25.0
    }
    val cases = samples(Gen.zip(patternG, Gen.listOfN(5, seqG)), nCases, seed)
    cases.zipWithIndex.foreach { case (((pat, rx), seqs), ci) =>
      val rows = seqs.zipWithIndex.flatMap { case (syms, k) =>
        syms.zipWithIndex.map { case (c, i) =>
          (k.toLong, java.sql.Timestamp.from(
            java.time.Instant.ofEpochSecond(3600L + i)), valueOf(c))
        }
      }
      val df = rows.toDF("k", "ets", "value")
      val got = MatchRecognize.matchRecognize(
          df, Seq("k"), "ets", defines, parsePattern(pat), measures, skip = skip)
        .select(col("k"), col("mno"), col("n_a"), col("n_b"), col("n_c"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (k, rs) =>
          k -> rs.sortBy(_.getLong(1))
            .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
        }
      seqs.zipWithIndex.foreach { case (syms, k) =>
        val want = ref(rx, syms)
        val have = got.getOrElse(k.toLong, Seq.empty)
        assert(have == want,
          s"[$label case $ci seed $seed] PATTERN '$pat' (regex '$rx') over '$syms':\n" +
            s"  engine: $have\n  regex:  $want")
      }
    }
  }

  test("NFA == JDK regex: SKIP PAST LAST ROW, 150 patterns × 5 sequences") {
    checkCases(0xcef0fL, 150, SkipPastLastRow, refMatches, "past-last")
  }

  test("streaming NFA == batch NFA on random patterns through real micro-batches") {
    import org.apache.spark.sql.{Row => SRow}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val seed = 0xcebabeL
    // C is a bounded band so the sentinel below matches NOTHING
    val defines = Seq(
      "A" -> (col("value") < 10), "B" -> (col("value") >= 10 && col("value") < 20),
      "C" -> (col("value") >= 20 && col("value") < 30))
    val measures = Seq(
      Measure("mno", "match_number", "", ""),
      Measure("n_a", "count", "A", "*"),
      Measure("n_b", "count", "B", "*"),
      Measure("n_c", "count", "C", "*"))
    def valueOf(c: Char): Double = c match {
      case 'A' => 5.0; case 'B' => 15.0; case 'C' => 25.0
      case _ => 999.0 // 'Z' sentinel: satisfies NO define
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, ets TIMESTAMP, value DOUBLE")
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val cases = samples(Gen.zip(patternG, Gen.listOfN(2, seqG)), 12, seed)
    graft.queries.StreamParityQueries.withParityConf(spark) {
      cases.zipWithIndex.foreach { case (((pat, _), seqs), ci) =>
        val rows = seqs.zipWithIndex.flatMap { case (syms, k) =>
          // +3600 s: a row at exactly the initial watermark (epoch 0) would
          // be late-filtered on the stream side only (the parity-gate note).
          // Each key's data ends with two UNMATCHABLE 'Z' rows: a pending
          // greedy attempt can never extend through them, so every match's
          // closure is decidable from the data itself on BOTH sides and
          // exact parity is the correct assertion. (Without the sentinel a
          // greedy quantifier can legitimately leave a match PENDING at the
          // end of a key's data — a future row above the watermark could
          // still extend it — and the stream correctly holds while batch,
          // knowing the data ended, closes: not a divergence.)
          (syms + "ZZ").zipWithIndex.map { case (c, i) =>
            SRow(k.toLong, ts(3600L + i), valueOf(c))
          }
        }.sortBy(_.getTimestamp(1).getTime)
        implicit val sqlCtx = spark.sqlContext
        val mem = MemoryStream[SRow](
          org.apache.spark.sql.Encoders.row(schema), spark.sqlContext)
        val out = MatchRecognize.matchRecognizeStream(
          mem.toDF(), Seq("k"), "ets", defines, parsePattern(pat), measures,
          watermarkDelay = Some("0 seconds"))
        val sink = s"cep_fuzz_stream_$ci"
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        try {
          val n = rows.length
          Seq(rows.slice(0, n / 2), rows.drop(n / 2)).foreach { w =>
            if (w.nonEmpty) { mem.addData(w: _*); q.processAllAvailable() }
          }
          // far-future pushers flush pending state (key -1 filtered below)
          mem.addData(SRow(-1L, ts(100000L), 0.0)); q.processAllAvailable()
          mem.addData(SRow(-1L, ts(200000L), 1.0)); q.processAllAvailable()
        } finally q.stop()
        def tuples(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, Long)] =
          df.filter(col("k") >= 0)
            .select(col("k"), col("mno"), col("n_a"), col("n_b"), col("n_c"))
            .collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
              r.getLong(4))).toSet
        val streamed = tuples(spark.table(sink))
        val batch = tuples(MatchRecognize.matchRecognize(
          spark.createDataFrame(
            new java.util.ArrayList[SRow](scala.jdk.CollectionConverters
              .SeqHasAsJava(rows).asJava), schema),
          Seq("k"), "ets", defines, parsePattern(pat), measures))
        assert(streamed == batch,
          s"[stream case $ci seed $seed] PATTERN '$pat' over $seqs:\n" +
            s"  stream: ${streamed.toSeq.sorted}\n  batch:  ${batch.toSeq.sorted}")
      }
    }
  }

  test("NFA == JDK regex: SKIP TO NEXT ROW (overlapping), 100 patterns × 5 sequences") {
    checkCases(0xcefffL, 100, SkipToNextRow, refMatchesNextRow, "next-row")
  }

  test("SQL front-end == direct API on 40 random patterns (the gateway's path)") {
    // the hand-rolled MATCH_RECOGNIZE SQL parser (MrRegex + measure/define
    // splitting) is what Gateway statements actually traverse; random
    // patterns rendered as SQL must produce the same rows as the direct API
    import spark.implicits._
    val seed = 0x5c1f0dL
    def valueOf(c: Char): Double = c match {
      case 'A' => 5.0; case 'B' => 15.0; case _ => 25.0
    }
    val cases = samples(Gen.zip(patternG, Gen.listOfN(3, seqG)), 40, seed)
    cases.zipWithIndex.foreach { case (((pat, _), seqs), ci) =>
      val rows = seqs.zipWithIndex.flatMap { case (syms, k) =>
        syms.zipWithIndex.map { case (c, i) =>
          (k.toLong, java.sql.Timestamp.from(
            java.time.Instant.ofEpochSecond(3600L + i)), valueOf(c))
        }
      }
      val df = rows.toDF("k", "ets", "value")
      df.createOrReplaceTempView("cep_sql_fuzz")
      val viaSql = MatchRecognize.sql(spark,
        s"""SELECT * FROM cep_sql_fuzz MATCH_RECOGNIZE (
           |  PARTITION BY k ORDER BY ets
           |  MEASURES MATCH_NUMBER() AS mno, COUNT(A.*) AS n_a,
           |           COUNT(B.*) AS n_b, COUNT(C.*) AS n_c
           |  ONE ROW PER MATCH
           |  AFTER MATCH SKIP PAST LAST ROW
           |  PATTERN ($pat)
           |  DEFINE A AS A.value < 10,
           |         B AS B.value >= 10 AND B.value < 20,
           |         C AS C.value >= 20
           |)""".stripMargin)
      val defines = Seq(
        "A" -> (col("value") < 10),
        "B" -> (col("value") >= 10 && col("value") < 20),
        "C" -> (col("value") >= 20))
      val measures = Seq(
        Measure("mno", "match_number", "", ""),
        Measure("n_a", "count", "A", "*"),
        Measure("n_b", "count", "B", "*"),
        Measure("n_c", "count", "C", "*"))
      def tuples(out: org.apache.spark.sql.DataFrame) =
        out.select(col("k"), col("mno"), col("n_a"), col("n_b"), col("n_c"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet
      val viaApi = tuples(MatchRecognize.matchRecognize(
        df, Seq("k"), "ets", defines, parsePattern(pat), measures))
      assert(tuples(viaSql) == viaApi,
        s"[sql case $ci seed $seed] PATTERN '$pat': SQL path diverges from API")
    }
  }
}
