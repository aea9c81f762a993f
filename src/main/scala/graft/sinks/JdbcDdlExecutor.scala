package graft.sinks

import java.sql.Connection

/** K5 target-side DDL execution (reference applier runs the rewritten
  * statement on the destination inside the barrier,
  * `driver/mysql/applier_incr.go:640-668`): each forwarded statement
  * executes on a fresh connection — MySQL DDL commits implicitly, so
  * there is no transaction to manage — with the same retryable
  * classification as the row sink (deadlock on a metadata lock, or a
  * transient reconnect after failover, consumes an attempt; a
  * deterministic error fails fast).
  *
  * This is the natural `onDdlForward` for
  * [[graft.JobRunner.incrementalWithDdl]]. Statement caches need no
  * explicit invalidation on DDL: [[JdbcUpsertSink]]'s caches live per
  * partition-attempt and never outlive a micro-batch, so segments after
  * a barrier always re-prepare against the post-DDL schema (the
  * reference invalidates its long-lived per-worker caches at the same
  * point, `applier_incr.go:631-650`).
  */
class JdbcDdlExecutor(connect: () => Connection,
                      maxAttempts: Int = JdbcUpsertSink.RetryTxLimit)
    extends (String => Unit) with Serializable {

  override def apply(sql: String): Unit =
    JdbcUpsertSink.retryWithConnection(connect, maxAttempts) { conn =>
      val st = conn.createStatement()
      try st.execute(sql) finally st.close()
    }
}
