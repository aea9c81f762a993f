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
    numPartitions: Int = 4
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
          rows.foreach { r =>
            val op = r.getAs[String](oc)
            op match {
              case "d" =>
                val st = cache.get("delete", SqlBuilder.delete(tableDef))
                var i = 1
                val whereCols = if (tableDef.hasPk) tableDef.pkColumns else tableDef.columns
                whereCols.foreach { c =>
                  val v = r.getAs[AnyRef](c)
                  st.setObject(i, v); st.setObject(i + 1, v); i += 2
                }
                st.executeUpdate()
              case _ => // c/u/r → replace
                val st = cache.get("replace", SqlBuilder.replaceInto(tableDef, 1))
                tableDef.columns.zipWithIndex.foreach { case (c, i) =>
                  st.setObject(i + 1, r.getAs[AnyRef](c))
                }
                st.executeUpdate()
            }
            val g = if (r.schema.fieldNames.contains(gc)) r.getAs[String](gc) else null
            if (g != null) appliedGtids += g
          }
          // ledger rows in the same tx (exactly-once: row+marker atomic)
          if (appliedGtids.nonEmpty) {
            val st = cache.get("ledger", SqlBuilder.ledgerInsert(lSchema))
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
  }
}

/** Executor-local prepared-statement cache keyed by (kind) — reference
  * caches per (table, kind, worker) (`driver/common/binlog.go:150-190`).
  */
class StatementCache(conn: Connection) {
  private val cache = scala.collection.mutable.Map.empty[String, PreparedStatement]
  def get(key: String, sql: => String): PreparedStatement =
    cache.getOrElseUpdate(key, conn.prepareStatement(sql))
  def close(): Unit = cache.values.foreach(st => try st.close() catch { case _: Throwable => () })
}
