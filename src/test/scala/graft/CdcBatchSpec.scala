package graft

import org.apache.spark.sql.functions._
import graft.operators.CdcBatch

/** K2-K4 / O1 / O2 / O4 / S2 batch semantics on hand-built change logs. */
class CdcBatchSpec extends SparkSpec {
  import spark.implicits._

  // (key, seq, op, payload)
  private lazy val log = Seq(
    ("k1", 1L, "i", "a"), ("k1", 3L, "u", "b"),
    ("k2", 2L, "i", "x"), ("k2", 4L, "d", "-"),
    ("k3", 5L, "i", "z"), ("k3", 6L, "d", "-"), ("k3", 7L, "i", "z2")
  ).toDF("pk", "seq", "op", "payload")

  test("applyChangeLog: last write wins, trailing delete removes key") {
    val out = CdcBatch.applyChangeLog(log, "pk", "seq", "op")
      .select("pk", "payload").as[(String, String)].collect().toMap
    assert(out == Map("k1" -> "b", "k3" -> "z2")) // k2 deleted
  }

  test("writesetDependencies: lastCommitted = previous seq on same key") {
    val out = CdcBatch.writesetDependencies(log, "pk", "seq")
      .select("seq", "last_committed").as[(Long, Long)].collect().toMap
    assert(out(1L) == -1L && out(3L) == 1L && out(4L) == 2L && out(7L) == 6L)
  }

  test("assembleTx: sessions split on time gap") {
    val ev = Seq(
      ("u1", 1L, "2024-01-01 00:00:00"), ("u1", 2L, "2024-01-01 00:10:00"),
      ("u1", 3L, "2024-01-02 00:00:00"), // > 1h gap → new tx
      ("u2", 4L, "2024-01-01 00:00:00")
    ).toDF("user_id", "seq", "ts_s").withColumn("ts", to_timestamp(col("ts_s")))
    val out = CdcBatch.assembleTx(ev, "user_id", "ts", "seq", 3600000L)
      .select("user_id", "tx_index", "n_events").as[(String, Long, Long)].collect().toSet
    assert(out == Set(("u1", 0L, 2L), ("u1", 1L, 1L), ("u2", 0L, 1L)))
  }

  test("sizeBatches: running byte total partitions into batches") {
    val ev = Seq(("p", 1L, 1000L), ("p", 2L, 1000L), ("p", 3L, 100L), ("p", 4L, 2000L))
      .toDF("part", "seq", "bytes")
    val out = CdcBatch.sizeBatches(ev, "part", "seq", "bytes", 2048L)
      .select("seq", "batch_id").as[(Long, Long)].collect().toMap
    // cum: 1000, 2000, 2100, 4100 → batches 0,0,1,2 ((cum-1) div 2048)
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L))
  }

  test("mergeConsecutiveInserts: runs of same op coalesce (reuseLast)") {
    val ev = Seq(
      ("t1", 1L, "i"), ("t1", 2L, "i"), ("t1", 3L, "u"), ("t1", 4L, "i"),
      ("t2", 5L, "i")
    ).toDF("tbl", "seq", "op")
    val out = CdcBatch.mergeConsecutiveInserts(ev, "tbl", "seq", "op")
      .select("tbl", "op", "first_seq", "n_rows").as[(String, String, Long, Long)].collect().toSet
    assert(out == Set(("t1", "i", 1L, 2L), ("t1", "u", 3L, 1L), ("t1", "i", 4L, 1L), ("t2", "i", 5L, 1L)))
  }

  test("splitBigTx: parts carry index and final marker") {
    val ev = Seq(
      ("tx1", 1L, 40L), ("tx1", 2L, 40L), ("tx1", 3L, 40L), // 120 bytes, limit 64 → parts 0,1,1
      ("tx2", 4L, 10L)
    ).toDF("gtid", "seq", "bytes")
    val bySeq = CdcBatch.splitBigTx(ev, "gtid", "seq", "bytes", 64L)
      .select("seq", "part_index", "is_final").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(bySeq(1L) == ((0, false)))
    assert(bySeq(2L) == ((1, true)))
    assert(bySeq(3L) == ((1, true)))
    assert(bySeq(4L) == ((0, true)))
  }

  test("checksum is order-insensitive and distributes") {
    val a = CdcBatch.checksum(log, Seq("op"), "seq", "seq").orderBy("op").collect()
    val b = CdcBatch.checksum(log.orderBy(rand(42)), Seq("op"), "seq", "seq").orderBy("op").collect()
    assert(a.sameElements(b))
  }

  test("scd2History: deletes close intervals, version gaps mark tombstones") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(s: Long) = new java.sql.Timestamp(ts.getTime + s * 1000)
    val log2 = Seq(
      ("k1", 1L, "u", at(10)), ("k1", 2L, "u", at(20)),          // live key, 2 versions
      ("k2", 3L, "u", at(30)), ("k2", 4L, "d", at(40)),          // ends deleted
      ("k3", 5L, "u", at(50)), ("k3", 6L, "d", at(60)), ("k3", 7L, "u", at(70))
    ).toDF("pk", "seq", "op", "ts")
    val out = CdcBatch.scd2History(log2, "pk", "seq", "ts", Seq("op"), "op")
      .collect().map(r => (r.getString(0), r.getInt(1),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    val t0 = ts.getTime
    assert(out == Set(
      ("k1", 1, t0 + 10000, t0 + 20000, false),
      ("k1", 2, t0 + 20000, -1L, true),
      ("k2", 1, t0 + 30000, t0 + 40000, false),   // closed by the delete, no current row
      ("k3", 1, t0 + 50000, t0 + 60000, false),
      ("k3", 3, t0 + 70000, -1L, true)))          // version 2 was the tombstone: gap
    // no key ever has two current versions
    val currents = CdcBatch.scd2History(log2, "pk", "seq", "ts", Seq("op"), "op")
      .filter(col("is_current")).groupBy("pk").count().collect()
    assert(currents.forall(_.getLong(1) == 1L))
  }
}
