package graft.sinks

import java.sql.{Connection, PreparedStatement}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.streaming.UpsertSink

/** K2-K5 + K7 + O4/O5 — the production JDBC upsert sink: the Spark-
  * native applier (reference `driver/mysql/applier_incr.go`).
  *
  * Per micro-batch:
  *   1. repartition by row key + sort by seq within partitions — rows of
  *      one key reach one task in commit order, the distributed
  *      equivalent of the reference's writeset/logical-clock safety
  *      (`applier_mts.go`; SURVEY §2.8 O4/O5). `numPartitions` plays
  *      `ParallelWorkers`.
  *   2. each partition opens one connection, replays its rows as
  *      REPLACE / DELETE(+REPLACE for updates) via prepared statements
  *      cached per (table, kind, tier) — the reference's per-worker
  *      statement cache (`driver/common/binlog.go:150-190`).
  *   3. the GTID ledger insert shares the partition's transaction
  *      (reference `applier_incr.go:812-844`): idempotence survives
  *      partial-batch failure because replayed GTIDs are filtered by the
  *      ledger anti-join upstream (F10) and the tx makes row+marker
  *      atomic.
  *
  * Connection management is pluggable so tests can run against any
  * JDBC target; no driver classes are referenced statically.
  */
class JdbcUpsertSink(
    connect: () => Connection,
    table: SqlBuilder.TableDef,
    jobId: String,
    ledgerSchema: String,
    keyCol: String = "key",
    seqCol: String = "seq",
    opCol: String = "op",
    gtidCol: String = "gtid",
    numPartitions: Int = 4,
    compactThreshold: Int = 2048
) extends UpsertSink {

  override def applyBatch(batch: DataFrame, epochId: Long): Unit = {
    if (batch.isEmpty) return
    val cols = table.columns
    val conn0 = connect()
    try {
      conn0.createStatement().execute(SqlBuilder.ledgerCreate(ledgerSchema))
    } finally conn0.close()

    val ordered = batch
      .repartition(numPartitions, col(keyCol))
      .sortWithinPartitions(col(seqCol))

    val tableDef = table
    val job = jobId
    val lSchema = ledgerSchema
    val (kc, sc, oc, gc) = (keyCol, seqCol, opCol, gtidCol)
    val connectF = connect

    ordered.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = connectF()
        conn.setAutoCommit(false)
        val cache = new StatementCache(conn)
        try {
          var appliedGtids = Set.empty[String]
          // Bulk application (reference `applier_incr.go:694-730` +
          // `driver.go:161-167`): buffer consecutive same-op runs and
          // flush them as multi-row statements via SqlBuilder.tierPlan
          // (128/8/4/1 rows per REPLACE) and addBatch/executeBatch for
          // deletes — one network round trip per statement batch instead
          // of one per row. Op-switch flushes the other run first, so
          // per-key ordering (rows arrive seq-sorted) is preserved.
          val replaceRun = scala.collection.mutable.ArrayBuffer.empty[Row]
          val deleteRun = scala.collection.mutable.ArrayBuffer.empty[Row]
          val whereCols = if (tableDef.hasPk) tableDef.pkColumns else tableDef.columns

          def flushReplaces(): Unit = if (replaceRun.nonEmpty) {
            var off = 0
            SqlBuilder.tierPlan(replaceRun.length).foreach { case (tier, count) =>
              val st = cache.get(tableDef.fqn, "replace", tier,
                SqlBuilder.replaceInto(tableDef, tier))
              var n = 0
              while (n < count) {
                var i = 1
                var k = 0
                while (k < tier) {
                  val r = replaceRun(off + k)
                  tableDef.columns.foreach { c => st.setObject(i, r.getAs[AnyRef](c)); i += 1 }
                  k += 1
                }
                st.addBatch()
                off += tier
                n += 1
              }
              st.executeBatch()
            }
            replaceRun.clear()
          }

          def flushDeletes(): Unit = if (deleteRun.nonEmpty) {
            val st = cache.get(tableDef.fqn, "delete", 1, SqlBuilder.delete(tableDef))
            deleteRun.foreach { r =>
              var i = 1
              whereCols.foreach { c =>
                val v = r.getAs[AnyRef](c)
                st.setObject(i, v); st.setObject(i + 1, v); i += 2
              }
              st.addBatch()
            }
            st.executeBatch()
            deleteRun.clear()
          }

          rows.foreach { r =>
            r.getAs[String](oc) match {
              case "d" =>
                flushReplaces()
                deleteRun += r
                if (deleteRun.length >= SqlBuilder.bulkTiers.head) flushDeletes()
              case _ => // c/u/r → replace
                flushDeletes()
                replaceRun += r
                // at the top tier, flush eagerly: bounds the run buffer and
                // emits exactly one full 128-row statement
                if (replaceRun.length >= SqlBuilder.bulkTiers.head) flushReplaces()
            }
            val g = if (r.schema.fieldNames.contains(gc)) r.getAs[String](gc) else null
            if (g != null) appliedGtids += g
          }
          flushReplaces()
          flushDeletes()
          // ledger rows in the same tx (exactly-once: row+marker atomic)
          if (appliedGtids.nonEmpty) {
            val st = cache.get(lSchema, "ledger", 1, SqlBuilder.ledgerInsert(lSchema))
            appliedGtids.foreach { g =>
              st.setString(1, job); st.setString(2, "graft")
              st.setLong(3, math.abs(g.hashCode).toLong); st.setString(4, g)
              st.addBatch()
            }
            st.executeBatch()
          }
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally {
          cache.close(); conn.close()
        }
      }
    }

    // K7 — periodic ledger compaction (reference
    // `applier_gtid_executed.go:248-291`): after the batch commits,
    // collapse any source UUID whose per-tx rows exceeded the threshold
    // into one interval-set row. Driver-side, O(threshold) rows per sid.
    if (compactThreshold > 0) {
      val c = connect()
      try LedgerCompactor.compact(c, ledgerSchema, jobId, compactThreshold)
      finally c.close()
    }
  }
}

/** Executor-local prepared-statement cache keyed by (table, kind, tier)
  * — the reference's per-worker cache keys on the statement shape the
  * same way (`driver/common/binlog.go:150-190`). Keying on kind alone
  * would hand a 4-row REPLACE to a caller expecting the 128-row shape
  * the moment one sink instance serves more than one table or tier.
  */
class StatementCache(conn: Connection) {
  private val cache = scala.collection.mutable.Map.empty[(String, String, Int), PreparedStatement]
  def get(table: String, kind: String, tier: Int, sql: => String): PreparedStatement =
    cache.getOrElseUpdate((table, kind, tier), conn.prepareStatement(sql))
  def close(): Unit = cache.values.foreach(st => try st.close() catch { case _: Throwable => () })
}
