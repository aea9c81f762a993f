package graft

import graft.model.{ReplicationSpec, SchemaSpec}
import graft.sources.CdcFileSource
import graft.streaming.{CdcPipeline, ParquetUpsertSink}

/** O10 — bidirectional sync (reference `driver/handle.go:205-220`,
  * `extractor.go:173-196`): two symmetric pipelines A→B and B→A, each
  * with the cycle filter (F9) on its own server id, so applied rows
  * never echo back. The applied row keeps its ORIGIN server id when
  * re-captured on the peer — exactly the reference's origin-SID
  * propagation (`applier_incr.go:290-313`).
  */
class TwoWaySyncSpec extends SparkSpec {

  private def ev(seq: Long, key: String, origin: String): String =
    s"""{"db":"shop","table":"t","op":"c","key":"$key","before":null,""" +
      s""""after":"{\\"v\\":$seq}","ts_ms":$seq,"gtid":"g:$seq","seq":$seq,""" +
      s""""last_committed":${seq - 1},"origin_server_id":"$origin"}"""

  test("A->B and B->A apply peer rows once and drop self-originated echoes") {
    val work = graft.TempDirs.scratch("graft-2way")
    val streamA = s"$work/streamA" // changes captured ON server A
    val streamB = s"$work/streamB"

    // server A's capture stream: its own writes k1,k2 + an echo of a row
    // that ORIGINATED on B (applied by the B->A pipeline, re-captured)
    CdcFileSource.writeSegment(streamA, Seq(
      ev(1, "a1", "server-A"), ev(2, "a2", "server-A"), ev(3, "b9", "server-B")), 1, 3)
    // server B's capture stream, mirrored
    CdcFileSource.writeSegment(streamB, Seq(
      ev(1, "b1", "server-B"), ev(2, "a9", "server-A")), 1, 2)

    val spec = ReplicationSpec(doDb = Seq(SchemaSpec("shop")))
    def pump(srcDir: String, selfId: String, tableDir: String, ckpt: String): Unit = {
      // the A->B applier drops rows that ORIGINATED on B (selfId = dest)
      val sink = new ParquetUpsertSink(spark, tableDir, s"$tableDir-ledger", "key", "seq", "op")
      val events = spark.readStream.format(classOf[CdcFileSource].getName)
        .option("path", srcDir).load()
        .withColumnRenamed("origin_server_id", "originServerId")
      val q = CdcPipeline.run(events, spec.copy(selfServerId = Some(selfId)), sink,
        ckpt, triggerMs = 100)
      try q.processAllAvailable() finally q.stop()
    }

    // A->B: apply A's stream to B, dropping rows that originated on B
    pump(streamA, "server-B", s"$work/tableB", s"$work/ckptAB")
    // B->A: apply B's stream to A, dropping rows that originated on A
    pump(streamB, "server-A", s"$work/tableA", s"$work/ckptBA")

    val atB = spark.read.parquet(s"$work/tableB").select("key").collect().map(_.getString(0)).toSet
    val atA = spark.read.parquet(s"$work/tableA").select("key").collect().map(_.getString(0)).toSet
    assert(atB == Set("a1", "a2"), s"B must get A's rows only, got $atB")
    assert(atA == Set("b1"), s"A must get B's rows only, got $atA")
  }
}
