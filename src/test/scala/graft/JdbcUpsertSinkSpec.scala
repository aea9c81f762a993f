package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement, ResultSet, SQLException, Statement}
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._
import graft.sinks.{JdbcUpsertSink, SqlBuilder}

/** Asserts the sink's bulk-tier statement shape against a recording
  * in-JVM JDBC connection (no DB in this container): a mixed batch must
  * apply as multi-row REPLACE statements following
  * `SqlBuilder.tierPlan` (reference golden style,
  * `driver/mysql/sql/builder_test.go:113`) and batched deletes — never
  * one round trip per row.
  */
object JdbcRecorder {
  /** (kind, paramGroupsInSql, rowsInBatch) per executeBatch/executeUpdate. */
  final case class Exec(sql: String, batchSize: Int)
  val events = new ConcurrentLinkedQueue[Exec]()
  def clear(): Unit = events.clear()

  private def defaultFor(t: Class[_]): AnyRef = t match {
    case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE => Integer.valueOf(1)
    case java.lang.Long.TYPE    => java.lang.Long.valueOf(1L)
    case java.lang.Void.TYPE    => null
    case _                      => null
  }

  private def resultSet(rows: Seq[Seq[AnyRef]]): ResultSet = {
    var idx = -1
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[ResultSet]),
      new InvocationHandler {
        override def invoke(proxy: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "next" => idx += 1; java.lang.Boolean.valueOf(idx < rows.length)
          case "getLong" =>
            rows(idx)(args(0).asInstanceOf[Integer] - 1) match {
              case null => java.lang.Long.valueOf(0L)
              case v: java.lang.Long => v
              case v => java.lang.Long.valueOf(v.toString.toLong)
            }
          case "getString" =>
            rows(idx)(args(0).asInstanceOf[Integer] - 1) match {
              case null => null
              case v => v.toString
            }
          case _ => defaultFor(m.getReturnType)
        }
      }).asInstanceOf[ResultSet]
  }

  private def prepared(sql: String, query: String => Seq[Seq[AnyRef]]): PreparedStatement = {
    var batched = 0
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[PreparedStatement]),
      new InvocationHandler {
        override def invoke(proxy: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "addBatch" => batched += 1; null
          case "executeBatch" =>
            events.add(Exec(sql, batched)); val n = batched; batched = 0
            Array.fill(n)(1)
          case "executeUpdate" => events.add(Exec(sql, 1)); Integer.valueOf(1)
          case "executeQuery" => resultSet(query(sql))
          case other => defaultFor(m.getReturnType)
        }
      }).asInstanceOf[PreparedStatement]
  }

  def connection(query: String => Seq[Seq[AnyRef]] = _ => Nil): Connection =
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        override def invoke(proxy: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "prepareStatement" => prepared(args(0).asInstanceOf[String], query)
          case "createStatement" =>
            Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Statement]),
              new InvocationHandler {
                override def invoke(p: Any, mm: Method, a: Array[AnyRef]): AnyRef = mm.getName match {
                  case "execute" => // plain statements (session setup, DDL) record too
                    events.add(Exec(a(0).asInstanceOf[String], 1)); java.lang.Boolean.FALSE
                  case _ => defaultFor(mm.getReturnType)
                }
              }).asInstanceOf[Statement]
          case _ => defaultFor(m.getReturnType)
        }
      }).asInstanceOf[Connection]
}

/** Commit-failure injector for the deadlock-retry tests: wraps the
  * recorder connection, throwing a deadlock (or a configured terminal
  * error) from `commit` until `failRemaining` drains. Static object so
  * executor-side closure copies share the same counters in local mode
  * (same pattern as [[JdbcRecorder.events]]).
  */
object RetryState {
  import java.util.concurrent.atomic.AtomicInteger
  val commits = new AtomicInteger
  val rollbacks = new AtomicInteger
  val opened = new AtomicInteger
  val failRemaining = new AtomicInteger
  @volatile var failure: () => SQLException =
    () => new java.sql.SQLTransactionRollbackException(
      "Deadlock found when trying to get lock; try restarting transaction", "40001", 1213)

  def reset(nFailures: Int): Unit = {
    commits.set(0); rollbacks.set(0); opened.set(0); failRemaining.set(nFailures)
    failure = () => new java.sql.SQLTransactionRollbackException(
      "Deadlock found when trying to get lock; try restarting transaction", "40001", 1213)
  }

  def connection(): Connection = {
    opened.incrementAndGet()
    val inner = JdbcRecorder.connection()
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "commit" =>
            if (failRemaining.getAndDecrement() > 0) throw failure()
            commits.incrementAndGet(); null
          case "rollback" => rollbacks.incrementAndGet(); null
          case _ =>
            if (args == null) m.invoke(inner) else m.invoke(inner, args: _*)
        }
      }).asInstanceOf[Connection]
  }
}

class JdbcUpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private val td = SqlBuilder.TableDef("db", "t", Seq("key", "v"), Seq("key"))

  /** rows-per-statement a REPLACE sql was built for = value groups. */
  private def tierOf(sql: String): Int = sql.count(_ == '(') - 1

  test("mixed 141-row batch applies as tierPlan-shaped multi-row statements") {
    JdbcRecorder.clear()
    // 141 replaces, then 5 deletes, then 3 replaces — seq keeps order
    val rows =
      (1 to 141).map(i => (i.toLong, i.toLong, i.toLong, "u", s"uuid:$i")) ++
      (142 to 146).map(i => (i.toLong, i.toLong, i.toLong, "d", s"uuid:$i")) ++
      (147 to 149).map(i => (i.toLong, i.toLong, i.toLong, "u", s"uuid:$i"))
    val batch = rows.toDF("key", "v", "seq", "op", "gtid")

    val sink = new JdbcUpsertSink(() => JdbcRecorder.connection(), td,
      "job1", "ledger", numPartitions = 1)
    sink.applyBatch(batch, 0L)

    val evs = JdbcRecorder.events.toArray(Array.empty[JdbcRecorder.Exec]).toSeq
    val replaces = evs.filter(_.sql.startsWith("REPLACE"))
    val deletes = evs.filter(_.sql.startsWith("DELETE"))
    val ledger = evs.filter(_.sql.contains("gtid_executed"))

    // 141 = 128 + 8 + 4 + 1, then the trailing 3 as three 1-row batched
    assert(replaces.map(e => (tierOf(e.sql), e.batchSize)) ==
      Seq((128, 1), (8, 1), (4, 1), (1, 1), (1, 3)),
      s"got: ${replaces.map(e => (tierOf(e.sql), e.batchSize))}")
    // every replace row lands exactly once
    assert(replaces.map(e => tierOf(e.sql) * e.batchSize).sum == 144)
    // deletes batch as one executeBatch of 5, not 5 round trips
    assert(deletes.map(_.batchSize) == Seq(5))
    // ledger insert rides the same tx as one batch of all 149 gtids
    // (the ledger CREATE DDL records separately as a plain execute)
    assert(ledger.filter(_.sql.startsWith("INSERT")).map(_.batchSize) == Seq(149))
  }

  test("config-driven tiers and session setup reach the connection") {
    JdbcRecorder.clear()
    val rows = (1 to 100).map(i => (i.toLong, i.toLong, i.toLong, "u", s"u:$i"))
    val batch = rows.toDF("key", "v", "seq", "op", "gtid")
    val sink = new JdbcUpsertSink(() => JdbcRecorder.connection(), td,
      "job1", "ledger", numPartitions = 1,
      bulkTiers = Seq(64, 16), // config form: no terminal 1 — normalized
      sessionSetup = Seq("SET FOREIGN_KEY_CHECKS = 0"))
    sink.applyBatch(batch, 0L)
    val evs = JdbcRecorder.events.toArray(Array.empty[JdbcRecorder.Exec]).toSeq
    val replaces = evs.filter(_.sql.startsWith("REPLACE"))
    assert(replaces.map(e => (tierOf(e.sql), e.batchSize)) ==
      Seq((64, 1), (16, 2), (1, 4)),
      s"got: ${replaces.map(e => (tierOf(e.sql), e.batchSize))}")
    // the session-setup statement ran before the first REPLACE
    val idxSetup = evs.indexWhere(_.sql.contains("FOREIGN_KEY_CHECKS"))
    val idxFirst = evs.indexWhere(_.sql.startsWith("REPLACE"))
    assert(idxSetup >= 0 && idxSetup < idxFirst, evs.map(_.sql).mkString("\n"))
  }

  test("a replace run longer than the top tier flushes eagerly at 128") {
    JdbcRecorder.clear()
    val rows = (1 to 300).map(i => (i.toLong, i.toLong, i.toLong, "u", s"u:$i"))
    val batch = rows.toDF("key", "v", "seq", "op", "gtid")
    new JdbcUpsertSink(() => JdbcRecorder.connection(), td,
      "job1", "ledger", numPartitions = 1).applyBatch(batch, 0L)
    val replaces = JdbcRecorder.events.toArray(Array.empty[JdbcRecorder.Exec]).toSeq
      .filter(_.sql.startsWith("REPLACE"))
    // 300 = 128 + 128 + 44(=40+4); eager flush emits each 128 as its own
    // single-statement batch, remainder 44 -> 8x5 + 4x1
    assert(replaces.map(e => (tierOf(e.sql), e.batchSize)) ==
      Seq((128, 1), (128, 1), (8, 5), (4, 1)))
    assert(replaces.map(e => tierOf(e.sql) * e.batchSize).sum == 300)
  }

  test("deadlocked tx rolls back and replays identically on a fresh connection") {
    JdbcRecorder.clear()
    RetryState.reset(nFailures = 2) // first two commits deadlock, third lands
    val rows = (1 to 10).map(i => (i.toLong, i.toLong, i.toLong, "u", s"u:$i"))
    new JdbcUpsertSink(() => RetryState.connection(), td,
      "job1", "ledger", numPartitions = 1, compactThreshold = 0)
      .applyBatch(rows.toDF("key", "v", "seq", "op", "gtid"), 0L)

    assert(RetryState.commits.get() == 1, "exactly one commit lands")
    assert(RetryState.rollbacks.get() == 2, "each deadlock rolls back")
    // each attempt is an exact replay: same statement shape, all 10 rows +
    // the 10-gtid ledger batch, inside every attempt's own tx
    val evs = JdbcRecorder.events.toArray(Array.empty[JdbcRecorder.Exec]).toSeq
    val replaces = evs.filter(_.sql.startsWith("REPLACE"))
    val ledger = evs.filter(_.sql.contains("gtid_executed"))
    assert(replaces.map(e => (tierOf(e.sql), e.batchSize)) ==
      Seq.fill(3)(Seq((8, 1), (1, 2))).flatten, s"got ${replaces.map(e => (tierOf(e.sql), e.batchSize))}")
    assert(ledger.filter(_.sql.startsWith("INSERT")).map(_.batchSize) == Seq(10, 10, 10))
  }

  test("retry budget exhausts at RetryTxLimit and the stream fails") {
    JdbcRecorder.clear()
    RetryState.reset(nFailures = JdbcUpsertSink.RetryTxLimit + 1)
    val rows = Seq((1L, 1L, 1L, "u", "u:1"))
    val e = intercept[Exception] {
      new JdbcUpsertSink(() => RetryState.connection(), td,
        "job1", "ledger", numPartitions = 1, compactThreshold = 0)
        .applyBatch(rows.toDF("key", "v", "seq", "op", "gtid"), 0L)
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(_.isInstanceOf[java.sql.SQLTransactionRollbackException]))
    assert(RetryState.rollbacks.get() == JdbcUpsertSink.RetryTxLimit)
    assert(RetryState.commits.get() == 0)
  }

  test("a non-retryable failure fails fast: one attempt, no retry storm") {
    JdbcRecorder.clear()
    RetryState.reset(nFailures = 5)
    RetryState.failure = () =>
      new SQLException("Duplicate entry '1' for key 'PRIMARY'", "23000", 1062)
    val rows = Seq((1L, 1L, 1L, "u", "u:1"))
    intercept[Exception] {
      new JdbcUpsertSink(() => RetryState.connection(), td,
        "job1", "ledger", numPartitions = 1, compactThreshold = 0)
        .applyBatch(rows.toDF("key", "v", "seq", "op", "gtid"), 0L)
    }
    assert(RetryState.rollbacks.get() == 1)
    assert(RetryState.commits.get() == 0)
  }

  test("retryable() classifies deadlock/transient vs deterministic errors") {
    import java.sql.{SQLTransactionRollbackException, SQLTransientConnectionException}
    assert(JdbcUpsertSink.retryable(
      new SQLTransactionRollbackException("deadlock", "40001", 1213)))
    assert(JdbcUpsertSink.retryable(new SQLException("lock wait", "HY000", 1205)))
    assert(JdbcUpsertSink.retryable(new SQLTransientConnectionException("conn reset")))
    assert(!JdbcUpsertSink.retryable(new SQLException("dup key", "23000", 1062)))
    assert(!JdbcUpsertSink.retryable(new RuntimeException("npe")))
  }

  test("ledger compaction folds per-tx rows and prior interval rows into one set") {
    import graft.sinks.LedgerCompactor
    val folded = LedgerCompactor.foldRows(Seq(
      ("sid-a", 5L, null), ("sid-a", 1L, null), ("sid-a", 2L, null),
      ("sid-a", 0L, "7-9:100"), ("sid-a", 3L, null),
      ("sid-b", 10L, null)))
    assert(folded == Map("sid-a" -> "1-3:5:7-9:100", "sid-b" -> "10"))
    assert(LedgerCompactor.parse("1-3:5:7-9").render == "1-3:5:7-9")
  }

  test("compact() rewrites only sids over threshold: delete then single insert in one tx") {
    JdbcRecorder.clear()
    import graft.sinks.LedgerCompactor
    val canned: String => Seq[Seq[AnyRef]] = {
      case sql if sql.startsWith("SELECT source_uuid, COUNT(*)") =>
        Seq(Seq("sid-hot", java.lang.Long.valueOf(3L)), Seq("sid-cold", java.lang.Long.valueOf(1L)))
      case sql if sql.startsWith("SELECT gtid, gtid_set") =>
        Seq(Seq(java.lang.Long.valueOf(4L), null),
          Seq(java.lang.Long.valueOf(5L), null),
          Seq(java.lang.Long.valueOf(9L), null))
      case _ => Nil
    }
    val n = LedgerCompactor.compact(JdbcRecorder.connection(canned), "led", "job1", threshold = 2)
    assert(n == 1)
    val evs = JdbcRecorder.events.toArray(Array.empty[JdbcRecorder.Exec]).toSeq
    assert(evs.map(_.sql) == Seq(
      LedgerCompactor.deleteAllSql("led"),
      graft.sinks.SqlBuilder.ledgerInsert("led")))
  }
}
