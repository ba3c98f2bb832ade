package graft

import org.apache.spark.sql.functions._
import graft.engine.{Gateway, Jobs}

/** The README "Gateway lifecycle walkthrough" as an executable spec — the
  * reference's notebook execution loop (`src/notebookController.ts:64-294`:
  * execute → poll pages to EOS for batch, incremental offset-fetch for
  * streams → cancel; `src/sessionManager.ts:257-288` session recovery;
  * `src/jobsProvider.ts:63-77` job control) driven end-to-end through the
  * gateway exactly as the README transcript shows it. If the README and
  * the engine drift apart, this suite fails, not the docs.
  */
class NotebookLifecycleSpec extends SparkTestBase {

  test("README walkthrough: batch SELECT pages to EOS over a bounded token loop") {
    val gw = new Gateway(spark)
    val h = gw.openSession("notebook")
    val dir = java.nio.file.Files.createTempDirectory("graft-nb-clicks").toString
    try {
      // quick-start fixture: a parquet clicks table big enough to span pages
      import spark.implicits._
      (0 until 5000).map(i => (i.toLong % 97, s"/page/${i % 13}",
          new java.sql.Timestamp(1700000000000L + i * 1000L)))
        .toDF("user_id", "url", "ts").write.mode("overwrite").parquet(dir)
      gw.executeStatement(h,
        s"""CREATE TABLE nb_clicks (
           |  user_id BIGINT, url STRING, ts TIMESTAMP(3),
           |  WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
           |) WITH ('connector'='filesystem','path'='$dir','format'='parquet')""".stripMargin)
      // the README batch poll loop, verbatim
      val op = gw.executeStatement(h, "SELECT user_id, url FROM nb_clicks")
      var page = gw.fetchResults(op, 0)
      assert(page.columns == Seq("user_id", "url"))
      val all = collection.mutable.Buffer(page.rows: _*)
      var pages = 1
      while (!page.eos) {
        page = gw.fetchResults(op, page.nextToken.get)
        all ++= page.rows
        pages += 1
      }
      assert(all.size == 5000, s"paged loop lost rows: ${all.size}")
      assert(pages > 1, "5000 rows fit one page — the loop never paged")
      assert(all.map(_.head.toString.toLong).sum == (0 until 5000).map(_ % 97).sum)
      // a finished op keeps serving already-fetched pages idempotently
      assert(gw.fetchResults(op, 0).rows.nonEmpty)
    } finally {
      gw.executeStatement(h, "DROP TABLE IF EXISTS nb_clicks")
      gw.closeSession(h)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("README walkthrough: streaming SELECT offset-fetch, INSERT job control, session close") {
    val gw = new Gateway(spark)
    val h = gw.openSession("notebook")
    val runDir = s"/tmp/graft-nb-${java.util.UUID.randomUUID()}"
    try {
      gw.executeStatement(h,
        "CREATE TABLE nb_live (id BIGINT, amount DOUBLE) WITH " +
          "('connector'='datagen','rows-per-second'='200')")
      // ---- streaming SELECT: ring-buffer op, token is a row offset
      val sop = gw.executeStatement(h, "SELECT id, amount FROM nb_live")
      try {
        var live = gw.fetchResults(sop, 0)
        var tries = 0
        while (live.rows.isEmpty && tries < 150) {
          Thread.sleep(200); live = gw.fetchResults(sop, 0); tries += 1
        }
        assert(live.rows.nonEmpty, "streaming SELECT produced no rows in 30s")
        assert(!live.eos, "a streaming op must never report EOS")
        val offset = live.nextToken.get
        assert(offset >= live.rows.size)
        // resuming at the token never replays the rows already seen
        val next = gw.fetchResults(sop, offset)
        assert(next.nextToken.get >= offset)
      } finally gw.cancelOperation(sop)
      // ---- INSERT job: cluster-owned, visible and stoppable from any session
      gw.executeStatement(h,
        s"CREATE TABLE nb_sink (id BIGINT, amount DOUBLE) WITH " +
          s"('connector'='filesystem','path'='$runDir/sink'," +
          s"'format'='parquet','checkpoint'='$runDir/ckpt')")
      val msg = gw.fetchResults(gw.executeStatement(h,
        "INSERT INTO nb_sink SELECT id, amount FROM nb_live"), 0).rows.head.head.toString
      val job = "Job (\\S+) started".r.findFirstMatchIn(msg)
        .getOrElse(fail(s"unexpected INSERT result '$msg'")).group(1)
      def status(handle: String): Option[String] =
        gw.fetchResults(gw.executeStatement(handle, "SHOW JOBS"), 0)
          .rows.find(_(1).toString == job).map(_(2).toString)
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (!status(h).contains("RUNNING") && System.nanoTime() < deadline)
        Thread.sleep(200)
      assert(status(h).contains("RUNNING"), s"job $job never showed RUNNING")
      // ---- closeSession purges the session's temp state; jobs keep running
      gw.closeSession(h)
      val h2 = gw.openSession("notebook-reattached")
      assert(status(h2).contains("RUNNING"),
        "a cluster-owned job must survive its submitting session")
      val stopMsg = gw.fetchResults(
        gw.executeStatement(h2, s"STOP JOB '$job'"), 0).rows.head.head.toString
      assert(stopMsg.toLowerCase.contains("stop"), stopMsg)
      assert(status(h2).contains("CANCELED"), s"job $job not CANCELED after STOP JOB")
      gw.executeStatement(h2, "DROP TABLE IF EXISTS nb_sink")
      gw.executeStatement(h2, "DROP TABLE IF EXISTS nb_live")
      gw.closeSession(h2)
    } finally {
      Jobs.stopAll()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(runDir))
    }
  }

  test("README walkthrough: executeScript cells, error surfacing, handle auto-recovery") {
    val gw = new Gateway(spark)
    val h = gw.openSession("notebook")
    val dir = java.nio.file.Files.createTempDirectory("graft-nb-script").toString
    try {
      import spark.implicits._
      (0 until 100).map(i => (i.toLong, new java.sql.Timestamp(1700000000000L + i * 60000L)))
        .toDF("user_id", "ts").write.mode("overwrite").parquet(dir)
      // the README quick-start cell: DDL + TVF query in one script, with the
      // comment/string hazards the splitter guarantees against
      val ops = gw.executeScript(h,
        s"""-- create; then query
           |CREATE TABLE script_clicks (
           |  user_id BIGINT, ts TIMESTAMP(3),
           |  WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
           |) WITH ('connector'='filesystem','path'='$dir','format'='parquet');
           |SELECT window_start, COUNT(*) AS n
           |FROM TABLE(TUMBLE(TABLE script_clicks, DESCRIPTOR(ts), INTERVAL '10' MINUTE))
           |GROUP BY window_start, window_end;""".stripMargin)
      assert(ops.size == 2, s"splitter produced ${ops.size} ops")
      val page = gw.fetchResults(ops.last, 0)
      assert(page.columns == Seq("window_start", "n"))
      assert(page.rows.map(_(1).toString.toLong).sum == 100)
      // errors surface as a one-row error page with the root cause
      val bad = gw.fetchResults(gw.executeStatement(h, "SELECT * FROM no_such_nb_table"), 0)
      assert(bad.columns == Seq("error"))
      assert(bad.rows.size == 1 && bad.rows.head.head.toString.nonEmpty)
      assert(!bad.rows.head.head.toString.contains("\tat "), "raw stack leaked to the page")
      // an invalid/stale handle auto-recovers to a fresh session instead of
      // failing the cell (the client calls getOrRecreate before execute)
      val recovered = gw.getOrRecreate("no-such-session-handle")
      assert(recovered != "no-such-session-handle")
      val ghost = gw.fetchResults(gw.executeStatement(recovered, "SELECT 1 AS one"), 0)
      assert(ghost.rows == Seq(Seq(1)), s"auto-recovery returned $ghost")
      assert(gw.getOrRecreate(recovered) == recovered, "a live handle must be kept")
      gw.closeSession(recovered)
    } finally {
      gw.executeStatement(h, "DROP TABLE IF EXISTS script_clicks")
      gw.closeSession(h)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
