package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** In-JVM fake Oracle served through the REAL `java.sql` interfaces
  * (dynamic proxies + `DriverManager` registration) — the S7
  * counterpart of the MySQL/Kafka loopbacks. It VALIDATES the
  * dialogue, not just the data: add_logfile only outside a session,
  * dictionary before mining, start_logmnr only after registration,
  * no nested sessions, contents queries only inside the exact window
  * the session opened. A TNS wire endpoint is the one piece that
  * stays external; everything the reference's poll loop does against
  * the JDBC surface runs for real here.
  */
object FakeOracle {
  import java.lang.reflect.{InvocationHandler, Method, Proxy}

  private def proxy[T](cls: Class[T])(h: (String, Array[AnyRef]) => AnyRef): T =
    Proxy.newProxyInstance(cls.getClassLoader, Array[Class[_]](cls),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = {
          val a = if (args == null) Array.empty[AnyRef] else args
          m.getName match {
            case "toString" => s"FakeOracle(${cls.getSimpleName})"
            case "hashCode" => Integer.valueOf(System.identityHashCode(p))
            case "equals" => java.lang.Boolean.valueOf(p eq a(0))
            case name => h(name, a)
          }
        }
      }).asInstanceOf[T]

  private def resultSet(rows: Seq[Map[String, Any]]): java.sql.ResultSet = {
    var i = -1
    proxy(classOf[java.sql.ResultSet]) { (name, args) =>
      def cell = rows(i).getOrElse(args(0).asInstanceOf[String].toLowerCase, null)
      name match {
        case "next" => i += 1; java.lang.Boolean.valueOf(i < rows.size)
        case "close" => null
        case "getString" => Option(cell).map(_.toString).orNull
        case "getLong" => java.lang.Long.valueOf(cell.toString.toLong)
        case "getInt" => Integer.valueOf(cell.toString.toInt)
        case "wasNull" => java.lang.Boolean.FALSE
        case other => throw new UnsupportedOperationException(s"ResultSet.$other")
      }
    }
  }

  /** One redo row in the fake's log (13 lowercase V$LOGMNR_CONTENTS
    * columns, null-padded).
    */
  def redoRow(scn: Long, op: Int, xid: String, sqlRedo: String,
              csf: Int = 0, rowId: String = "", rollback: Int = 0,
              segOwner: String = "SHOP", tableName: String = ""): Map[String, Any] =
    Map("scn" -> scn, "seg_owner" -> segOwner, "table_name" -> tableName,
      "sql_redo" -> sqlRedo, "sql_undo" -> null, "operation_code" -> op,
      "xid" -> xid, "csf" -> csf, "row_id" -> rowId, "rollback" -> rollback,
      "rs_id" -> s"rs$scn", "timestamp" -> "2026-01-01 00:00:00", "username" -> "APP")

  final class Db(redo: Seq[Map[String, Any]], scnProbes: Seq[Long],
                 fpProbes: Seq[(Long, Long, Long)], logFiles: Seq[String]) {
    val addedLogfiles = mutable.ArrayBuffer.empty[String]
    val startedWindows = mutable.ArrayBuffer.empty[(Long, Long)]
    val contentsQueries = mutable.ArrayBuffer.empty[String]
    var dictionaryBuilds = 0
    var endCalls = 0
    private var scnIdx = 0
    private var fpIdx = 0
    private var active: Option[(Long, Long)] = None
    private var registered = false
    private var dictionaried = false

    private def nextScn(): Long = synchronized {
      val v = scnProbes(math.min(scnIdx, scnProbes.size - 1)); scnIdx += 1; v
    }
    private def nextFp(): (Long, Long, Long) = synchronized {
      val v = fpProbes(math.min(fpIdx, fpProbes.size - 1)); fpIdx += 1; v
    }

    private def query(sql: String): java.sql.ResultSet = synchronized {
      if (sql.contains("V$LOGMNR_CONTENTS")) {
        val w = "SCN > (\\d+) AND SCN <= (\\d+)".r.findFirstMatchIn(sql)
          .getOrElse(throw new IllegalStateException(s"contents query without a window: $sql"))
        val (lo, hi) = (w.group(1).toLong, w.group(2).toLong)
        require(active.contains((lo, hi)),
          s"contents query for ($lo,$hi] but the open LogMiner session is $active")
        contentsQueries += sql
        resultSet(redo.filter(r =>
          r("scn").asInstanceOf[Long] > lo && r("scn").asInstanceOf[Long] <= hi))
      } else if (sql.contains("CURRENT_SCN")) {
        resultSet(Seq(Map("current_scn" -> nextScn())))
      } else if (sql.contains("GROUP#, THREAD#, SEQUENCE#")) {
        val (g, t, s) = nextFp()
        resultSet(Seq(Map("group#" -> g, "thread#" -> t, "sequence#" -> s)))
      } else if (sql.contains("v$archived_log")) {
        resultSet(logFiles.map(f => Map[String, Any]("name" -> f, "first_change#" -> 1L)))
      } else throw new UnsupportedOperationException(s"unexpected query: $sql")
    }

    private def executeStmt(sql: String): Unit = synchronized {
      if (sql.contains("add_logfile")) {
        require(active.isEmpty, "add_logfile inside an open LogMiner session")
        addedLogfiles += "'([^']*)'".r.findFirstMatchIn(sql).get.group(1)
        registered = true
      } else if (sql.contains("DBMS_LOGMNR_D.build")) {
        require(registered, "dictionary build before any logfile was registered")
        dictionaryBuilds += 1; dictionaried = true
      } else if (sql.contains("start_logmnr")) {
        require(registered && dictionaried, "start_logmnr before registration/dictionary")
        require(active.isEmpty, "nested LogMiner sessions are not a thing")
        val lo = "startSCN => (\\d+)".r.findFirstMatchIn(sql).get.group(1).toLong
        val hi = "endScn => (\\d+)".r.findFirstMatchIn(sql).get.group(1).toLong
        startedWindows += ((lo, hi)); active = Some((lo, hi))
      } else if (sql.contains("end_logmnr")) {
        require(active.nonEmpty, "end_logmnr without an open session")
        endCalls += 1; active = None
      } else throw new UnsupportedOperationException(s"unexpected statement: $sql")
    }

    private def statement(): java.sql.Statement =
      proxy(classOf[java.sql.Statement]) { (name, args) =>
        name match {
          case "executeQuery" => query(args(0).asInstanceOf[String])
          case "execute" => executeStmt(args(0).asInstanceOf[String]); java.lang.Boolean.FALSE
          case "close" => null
          case other => throw new UnsupportedOperationException(s"Statement.$other")
        }
      }

    def connection: java.sql.Connection =
      proxy(classOf[java.sql.Connection]) { (name, _) =>
        name match {
          case "createStatement" => statement()
          case "close" => null
          case "isClosed" => java.lang.Boolean.FALSE
          case other => throw new UnsupportedOperationException(s"Connection.$other")
        }
      }

    /** Register with DriverManager so the spec connects through the
      * standard front door — the exact call a production deployment
      * makes with the vendor driver on the classpath.
      */
    def jdbcUrl: String = {
      val url = s"jdbc:graft-fake-oracle:${System.identityHashCode(this)}"
      val driver = proxy(classOf[java.sql.Driver]) { (name, args) =>
        name match {
          case "acceptsURL" => java.lang.Boolean.valueOf(args(0) == url)
          case "connect" => if (args(0) == url) connection else null
          case "getMajorVersion" => Integer.valueOf(1)
          case "getMinorVersion" => Integer.valueOf(0)
          case "jdbcCompliant" => java.lang.Boolean.FALSE
          case other => throw new UnsupportedOperationException(s"Driver.$other")
        }
      }
      java.sql.DriverManager.registerDriver(driver)
      url
    }
  }
}

class OracleJdbcLoopSpec extends SparkSpec {
  import FakeOracle._
  import LogMinerSession._
  import spark.implicits._

  test("S7 poll loop over java.sql: windows, rotation re-init, csf + rollback through the chain") {
    val longInsert =
      """insert into "SHOP"."ITEMS"("ID","NAME") values (1,'a-deliberately-long-value-so-the-record-splits')"""
    val (p1, rest) = longInsert.splitAt(35)
    val (p2, p3) = rest.splitAt(30)
    val redo = Seq(
      // tx x1: one insert csf-split across three contents rows, committed
      redoRow(101L, OpInsert, "x1", p1, csf = 1, rowId = "R1", tableName = "ITEMS"),
      redoRow(102L, OpInsert, "x1", p2, csf = 1, rowId = "R1", tableName = "ITEMS"),
      redoRow(103L, OpInsert, "x1", p3, csf = 0, rowId = "R1", tableName = "ITEMS"),
      // tx x2: insert then ROLLBACK — must vanish
      redoRow(105L, OpInsert, "x2",
        """insert into "SHOP"."ITEMS"("ID","NAME") values (9,'gone')""",
        rowId = "R9", tableName = "ITEMS"),
      redoRow(110L, OpCommit, "x1", ""),
      redoRow(112L, OpRollback, "x2", ""),
      // window 2: a DDL (auto-committed tx)
      redoRow(120L, OpDdl, "x3", "CREATE TABLE SHOP.LIVE(ID NUMBER(8))", tableName = "LIVE"),
      redoRow(121L, OpCommit, "x3", ""),
      // window 3 — arrives after the redo rotation
      redoRow(130L, OpInsert, "x4",
        """insert into "SHOP"."LIVE"("ID") values (7)""", rowId = "R7", tableName = "LIVE"),
      redoRow(131L, OpCommit, "x4", ""))

    val db = new Db(redo,
      scnProbes = Seq(115L, 125L, 125L, 135L, 135L, 135L),
      fpProbes = Seq((1L, 1L, 5L), (1L, 1L, 5L), (1L, 1L, 5L), // init + polls 1,2
        (1L, 1L, 6L), (1L, 1L, 6L), (1L, 1L, 6L), (1L, 1L, 6L)), // rotation at poll 3
      logFiles = Seq("/u01/arch_1.log", "/u01/redo01.log"))

    // the standard front door, like a production deployment
    val conn = java.sql.DriverManager.getConnection(db.jdbcUrl)
    val filter = LogMinerSession.schemaFilter(Seq("SHOP" -> Nil), Nil)
    val (finalState, polls) = LogMinerPoller.drain(conn, startScn = 100L, filter)

    // ---- dialogue assertions (the fake REFUSES out-of-order calls,
    // so reaching here already proves ordering; pin the shape too) ----
    assert(db.startedWindows.toSeq == Seq((100L, 115L), (115L, 125L), (125L, 135L)),
      s"windows: ${db.startedWindows}")
    assert(db.endCalls == 3)
    assert(db.dictionaryBuilds == 2, "rotation must rebuild the dictionary")
    assert(db.addedLogfiles.size == 4, s"2 files × (init + rotation re-init): ${db.addedLogfiles}")
    assert(db.contentsQueries.forall(_.contains("seg_owner = 'SHOP'")),
      "schema routing must reach the server-side query")
    assert(finalState.startScn == 135L, "resume point = last mined window's high edge")
    assert(polls.map(_.action) == Seq("mine", "mine", "reinit", "mine"))

    // ---- data: polled rows → the verified operator chain ----
    val rows = polls.flatMap(_.rows)
    assert(rows.size == 10)
    val committed = graft.sources.LogMinerTxCache.committedRecords(
        LogMinerPoller.toRedoFrame(spark, rows))
      .select(col("scn"), col("xid"), col("redo_sql"))
      .orderBy("scn").as[(Long, String, String)].collect()
    // rolled-back x2 gone; csf pieces of x1 joined verbatim
    assert(committed.map(_._1).toSeq == Seq(101L, 120L, 130L), committed.mkString(","))
    assert(committed.head._3 == longInsert)
    val events = RedoSqlParser.toChangeEvents(
      committed.iterator, "oracle-1", segOwner = "SHOP").toSeq
    assert(events.map(_.op) == Seq("c", graft.model.Op.Ddl, "c"))
    assert(events.head.after == Map("ID" -> "1",
      "NAME" -> "a-deliberately-long-value-so-the-record-splits"))
    assert(events(1).after("sql").startsWith("CREATE TABLE `SHOP`.`LIVE`"))
    assert(events(2).after == Map("ID" -> "7"))
  }

  test("poller refuses a broken dialogue: mining before registration fails loudly") {
    val db = new Db(Nil, Seq(10L), Seq((1L, 1L, 1L)), logFiles = Seq("/u01/redo01.log"))
    val conn = db.connection
    // bypass discoverAndRegister: a direct mine must be rejected by the
    // server-side state machine (the same error a real DBMS_LOGMNR
    // raises), proving the fake validates rather than echoes
    val e = intercept[IllegalArgumentException] {
      LogMinerPoller.mineWindow(conn, 0L, 10L, "")
    }
    assert(e.getMessage.contains("before registration"))
  }
}
