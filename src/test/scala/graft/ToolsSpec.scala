package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.{CorpusDigest, SweepScale}

/** Pins for the measurement-harness helpers that gate sweep honesty (r18):
  * the corpus-digest comparison SweepScale refuses on, and the stale-digest
  * file-fingerprint check. Pure JVM — no Spark session. */
class ToolsSpec extends AnyFunSuite {

  private val v2 =
    """{"v":2,"documents":{"rows":500,"h":-123,"h2":456,"files":3,"bytes":9999},
      |"events":{"rows":10,"h":7,"h2":8,"files":1,"bytes":42}}""".stripMargin

  test("compareDigests: equal digests match; every differing field is named") {
    assert(SweepScale.compareDigests(v2, v2).isEmpty)
    val drifted = v2.replace("\"h\":-123", "\"h\":-124")
    val m = SweepScale.compareDigests(v2, drifted)
    assert(m.size == 1 && m.head.contains("documents") && m.head.contains("h"), m)
    val fewerRows = v2.replace("\"rows\":10", "\"rows\":9")
    val m2 = SweepScale.compareDigests(v2, fewerRows)
    assert(m2.size == 1 && m2.head.contains("events") && m2.head.contains("rows"), m2)
  }

  test("compareDigests: missing table named; v1-vs-v2 compares only shared fields") {
    val missing = """{"v":2,"documents":{"rows":500,"h":-123,"h2":456,"files":3,"bytes":9999}}"""
    val m = SweepScale.compareDigests(v2, missing)
    assert(m.size == 1 && m.head.contains("events") && m.head.contains("missing"), m)
    // a v1 digest (no h2, no file fingerprint) must still compare rows+h —
    // the r17 PLANS.md recordings are v1, and they anchor the r18 corpora
    val v1 = """{"documents":{"rows":500,"h":-123},"events":{"rows":10,"h":7}}"""
    assert(SweepScale.compareDigests(v1, v2).isEmpty, "v1 expected vs v2 actual must match on rows+h")
    assert(SweepScale.compareDigests(v2, v1).isEmpty, "v2 expected vs v1 actual must match on rows+h")
    assert(SweepScale.compareDigests(v1, v2.replace("\"h\":7", "\"h\":9")).nonEmpty)
  }

  test("staleTables: flags a table regenerated after digesting; v1 digests uncheckable") {
    val dir = java.nio.file.Files.createTempDirectory("toolsspec-").toFile
    try {
      val t = new java.io.File(dir, "documents.parquet")
      assert(t.mkdir())
      java.nio.file.Files.write(t.toPath.resolve("part-0"), Array[Byte](1, 2, 3))
      val (n, b) = CorpusDigest.fileStats(t)
      assert((n, b) == (1L, 3L))
      val digest = s"""{"v":2,"documents":{"rows":1,"h":0,"h2":0,"files":$n,"bytes":$b}}"""
      assert(SweepScale.staleTables(digest, dir.toString).isEmpty)
      // regenerate: an extra part file changes the fingerprint -> stale
      java.nio.file.Files.write(t.toPath.resolve("part-1"), Array[Byte](4))
      val stale = SweepScale.staleTables(digest, dir.toString)
      assert(stale.size == 1 && stale.head.contains("documents"), stale)
      // a v1 digest has no fingerprint: nothing to check, never stale
      assert(SweepScale.staleTables("""{"documents":{"rows":1,"h":0}}""", dir.toString).isEmpty)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
