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

  test("NFA == JDK regex: SKIP TO NEXT ROW (overlapping), 100 patterns × 5 sequences") {
    checkCases(0xcefffL, 100, SkipToNextRow, refMatchesNextRow, "next-row")
  }
}
