package graft

import scala.collection.mutable
import scala.util.Random
import graft.engine.{Jobs, TableEnv}

/** Model-based fuzz of the CDC changelog surface (r12, the DmlFuzzSpec
  * recipe): a random WELL-FORMED debezium event stream (c only on absent
  * keys, u/d only on present ones, before/after images consistent,
  * strictly increasing ts_ms) is shuffled across several files and
  * checked against the generator's own final state through BOTH engine
  * paths:
  *
  *   (a) the bounded *-cdc snapshot fold (latest surviving row per key —
  *       `TableEnv.cdcSnapshot`), which must be ts-ordered, never
  *       file-ordered;
  *   (b) the streaming changelog APPLY onto a jdbc PRIMARY KEY sink
  *       (per-microbatch upsert + delete — `TableEnv.batchInsert`'s CDC
  *       branch), whose database end-state must equal the same model.
  *
  * Deleted-then-recreated keys, multi-update keys, and empty-table
  * endings all occur naturally under the seeds. */
class CdcFuzzSpec extends SparkTestBase {

  for (seed <- Seq(660L, 661L, 662L))
  test(s"model fuzz: random debezium changelog folds to the model state (seed $seed)") {
    TableEnv.clear()
    val rnd = new Random(seed)
    val live = mutable.Map.empty[Long, Long] // id -> v (the reference model)
    val events = mutable.ArrayBuffer.empty[String]
    var ts = 1000L
    (1 to soak(80)).foreach { _ =>
      ts += 1 + rnd.nextInt(3)
      val id = rnd.nextInt(8).toLong
      if (!live.contains(id)) {
        val v = rnd.nextInt(1000).toLong
        events += s"""{"before": null, "after": {"id": $id, "v": $v}, "op": "c", "ts_ms": $ts}"""
        live(id) = v
      } else if (rnd.nextInt(3) == 0) {
        events += s"""{"before": {"id": $id, "v": ${live(id)}}, "after": null, "op": "d", "ts_ms": $ts}"""
        live -= id
      } else {
        val v = rnd.nextInt(1000).toLong
        events += s"""{"before": {"id": $id, "v": ${live(id)}}, "after": {"id": $id, "v": $v}, "op": "u", "ts_ms": $ts}"""
        live(id) = v
      }
    }
    val want = live.toMap
    // shuffle across 3 files: the fold must order by ts_ms, not by file
    val dir = java.nio.file.Files.createTempDirectory("graft-cdcfuzz")
    rnd.shuffle(events.toList).grouped((events.size + 2) / 3).zipWithIndex.foreach {
      case (chunk, i) => java.nio.file.Files.write(
        dir.resolve(s"part$i.json"), chunk.mkString("\n").getBytes("UTF-8"))
    }

    // (a) bounded *-cdc read = snapshot fold
    TableEnv.createTable(spark,
      s"""CREATE TABLE cdcf_t (id BIGINT, v BIGINT, PRIMARY KEY (id) NOT ENFORCED)
         |WITH ('connector'='mysql-cdc','hostname'='x','database-name'='d',
         |'table-name'='t','changelog.path'='$dir')""".stripMargin)
    val got = TableEnv.batchDF(spark, TableEnv.lookup("cdcf_t").get)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"snapshot fold diverged:\n got: $got\nwant: $want")

    // (b) streaming changelog applied to a jdbc PK sink
    val dbdir = java.nio.file.Files.createTempDirectory("graft-cdcfuzz-db")
    TableEnv.createTable(spark,
      s"""CREATE TABLE cdcf_src (id BIGINT, v BIGINT)
         |WITH ('connector'='filesystem','path'='$dir','format'='debezium-json')""".stripMargin)
    TableEnv.createTable(spark,
      s"""CREATE TABLE cdcf_snk (id BIGINT, v BIGINT, PRIMARY KEY (id) NOT ENFORCED)
         |WITH ('connector'='jdbc','url'='jdbc:derby:$dbdir/db;create=true',
         |'table-name'='cdcf_state')""".stripMargin)
    val snk = TableEnv.lookup("cdcf_snk").get
    val name = TableEnv.startStreamingInsert(spark,
      snk, TableEnv.streamDF(spark, TableEnv.lookup("cdcf_src").get))
    try {
      spark.streams.active.find(_.name == name).foreach(_.processAllAvailable())
      val state = try TableEnv.batchDF(spark, snk).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      catch { case _: Exception => Map.empty[Long, Long] }
      assert(state == want, s"jdbc apply diverged:\n got: $state\nwant: $want")
    } finally Jobs.stopAll()
  }
}
