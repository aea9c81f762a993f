package graft.sinks

import java.sql.Connection
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{JdbcRecorder, SparkSpec}

/** K7 ledger GNO parsing + the conn-acquisition leg of the retry budget
  * (reference `applier_gtid_executed.go:186-246` stores the parsed GNO;
  * `driver.go:168-169` RetryTxLimit covers the whole attempt).
  */
class GtidLedgerSpec extends SparkSpec {
  import spark.implicits._

  test("parseGtid extracts the real (uuid, gno) interval point") {
    val uuid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    assert(JdbcUpsertSink.parseGtid(s"$uuid:23") == (uuid, 23L))
    assert(JdbcUpsertSink.parseGtid(s"$uuid:1") == (uuid, 1L))
    // 18-digit GNOs fit; anything longer is not a GNO
    assert(JdbcUpsertSink.parseGtid(s"$uuid:123456789012345678") ==
      (uuid, 123456789012345678L))
  }

  test("hash-colliding non-GTID ids never share a ledger interval point") {
    // "Aa" and "BB" have equal String.hashCode — the bug the hash-based
    // GNO had: both compacted into one interval, silently F10-skipping
    // an unapplied tx. The fallback derives the synthetic uuid from the
    // full id, so the (source_uuid, gno) pairs stay distinct.
    assert("Aa".hashCode == "BB".hashCode)
    val a = JdbcUpsertSink.parseGtid("Aa")
    val b = JdbcUpsertSink.parseGtid("BB")
    assert(a != b && a._1 != b._1)
    // a range/set string is not a single-tx GTID → fallback, not a bogus parse
    val r = JdbcUpsertSink.parseGtid("3e11fa47-71ca-11e1-9e33-c80aa9429562:1-5")
    assert(r._1.startsWith("synthetic-"))
  }

  test("transient connection failure on a retry attempt consumes the budget, not the stream") {
    JdbcRecorder.clear()
    FlakyConnect.reset(failOnCall = 2) // call 1: driver-side ledgerCreate; call 2: first partition attempt
    val rows = (1 to 5).map(i => (i.toLong, i.toLong, i.toLong, "u", s"u:$i"))
    val sink = new JdbcUpsertSink(() => FlakyConnect.connect(),
      SqlBuilder.TableDef("db", "t", Seq("key", "v"), Seq("key")),
      "job1", "ledger", numPartitions = 1, compactThreshold = 0)
    sink.applyBatch(rows.toDF("key", "v", "seq", "op", "gtid"), 0L)
    // the failed acquisition burned one attempt; the replay applied everything
    val evs = JdbcRecorder.events.toArray(Array.empty[JdbcRecorder.Exec]).toSeq
    assert(evs.exists(_.sql.contains("gtid_executed")))
    assert(FlakyConnect.calls.get() >= 3)
  }
}

class JdbcDdlExecutorSpec extends AnyFunSuite {
  import java.util.concurrent.ConcurrentLinkedQueue
  import java.lang.reflect.{InvocationHandler, Method, Proxy}

  private def recordingConn(executed: ConcurrentLinkedQueue[String]): Connection =
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "createStatement" =>
            Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[java.sql.Statement]),
              new InvocationHandler {
                override def invoke(pp: Any, mm: Method, a: Array[AnyRef]): AnyRef = mm.getName match {
                  case "execute" => executed.add(a(0).asInstanceOf[String]); java.lang.Boolean.FALSE
                  case _ => null
                }
              })
          case _ => null
        }
      }).asInstanceOf[Connection]

  test("executes forwarded DDL; a transient failure consumes an attempt, not the stream") {
    val executed = new ConcurrentLinkedQueue[String]()
    var calls = 0
    val exec = new JdbcDdlExecutor(() => {
      calls += 1
      if (calls == 1)
        throw new java.sql.SQLNonTransientConnectionException("refused", "08001", 2003)
      recordingConn(executed)
    })
    exec("ALTER TABLE `dst`.`t` ADD COLUMN c INT")
    assert(executed.size == 1 && executed.peek.startsWith("ALTER TABLE `dst`.`t`"))
    assert(calls == 2)
  }

  test("a deterministic error fails fast after one attempt") {
    var calls = 0
    val exec = new JdbcDdlExecutor({ () =>
      calls += 1
      throw new java.sql.SQLSyntaxErrorException("bad DDL", "42000", 1064)
    })
    intercept[java.sql.SQLSyntaxErrorException](exec("NOT SQL"))
    assert(calls == 1)
  }
}

/** Static so executor-side closure copies share the counter in local mode. */
object FlakyConnect {
  val calls = new AtomicInteger
  @volatile private var failOn = -1
  def reset(failOnCall: Int): Unit = { calls.set(0); failOn = failOnCall }
  def connect(): Connection = {
    val n = calls.incrementAndGet()
    if (n == failOn)
      throw new java.sql.SQLNonTransientConnectionException(
        "Could not connect: connection refused", "08001", 2003)
    JdbcRecorder.connection()
  }
}
