package graft.sources

import scala.collection.mutable
import scala.jdk.CollectionConverters._

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
/** A REAL `java.sql.Driver` class (not a proxy): Spark's JDBC source
  * re-instantiates the driver by class name through DriverRegistry, so
  * it needs a public no-arg constructor; state lives in the companion's
  * url → Db registry.
  */
class FakeOracleDriver extends java.sql.Driver {
  override def connect(url: String, info: java.util.Properties): java.sql.Connection =
    if (acceptsURL(url)) FakeOracleDriver.dbs.get(url).map(_.connection).orNull else null
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:graft-fake-oracle:")
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: java.util.Properties): Array[java.sql.DriverPropertyInfo] =
    Array.empty
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}

object FakeOracleDriver {
  val dbs = new java.util.concurrent.ConcurrentHashMap[String, FakeOracle.Db]().asScala

  locally { java.sql.DriverManager.registerDriver(new FakeOracleDriver) }

  def register(db: FakeOracle.Db): String = {
    val url = s"jdbc:graft-fake-oracle:${System.identityHashCode(db)}"
    dbs.put(url, db)
    url
  }
}

object FakeOracle {
  import java.lang.reflect.{InvocationHandler, Method, Proxy}

  /** Column metadata for result sets Spark's JDBC source introspects. */
  case class ColMeta(name: String, sqlType: Int, precision: Int = 0,
                     scale: Int = 0, nullable: Boolean = true)

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

  private def resultSet(rows: Seq[Map[String, Any]],
                        schema: Seq[ColMeta] = Nil): java.sql.ResultSet = {
    var i = -1
    var lastNull = false
    def metaData: java.sql.ResultSetMetaData =
      proxy(classOf[java.sql.ResultSetMetaData]) { (name, args) =>
        def col = schema(args(0).asInstanceOf[Integer] - 1)
        name match {
          case "getColumnCount" => Integer.valueOf(schema.size)
          case "getColumnLabel" | "getColumnName" => col.name
          case "getColumnType" => Integer.valueOf(col.sqlType)
          case "getColumnTypeName" => "FAKE"
          case "getPrecision" => Integer.valueOf(col.precision)
          case "getScale" => Integer.valueOf(col.scale)
          case "isSigned" => java.lang.Boolean.TRUE
          case "isNullable" => Integer.valueOf(
            if (col.nullable) java.sql.ResultSetMetaData.columnNullable
            else java.sql.ResultSetMetaData.columnNoNulls)
          case other => throw new UnsupportedOperationException(s"RSMD.$other")
        }
      }
    proxy(classOf[java.sql.ResultSet]) { (name, args) =>
      // labels arrive lowercase from the poller; Spark's JDBC source
      // reads by 1-based INDEX, resolved through the declared schema
      def cell: Any = {
        val key = args(0) match {
          case idx: Integer => schema(idx - 1).name.toLowerCase
          case label => label.asInstanceOf[String].toLowerCase
        }
        val v = rows(i).getOrElse(key, null)
        lastNull = v == null
        v
      }
      name match {
        case "next" => i += 1; java.lang.Boolean.valueOf(i < rows.size)
        case "close" => null
        case "getString" => Option(cell).map(_.toString).orNull
        case "getLong" => java.lang.Long.valueOf(Option(cell).fold(0L)(_.toString.toLong))
        case "getInt" => Integer.valueOf(Option(cell).fold(0)(_.toString.toInt))
        case "wasNull" => java.lang.Boolean.valueOf(lastNull)
        case "getMetaData" => metaData
        case "isClosed" => java.lang.Boolean.FALSE
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
                 fpProbes: Seq[(Long, Long, Long)], logFiles: Seq[String],
                 snapshotRows: Seq[Map[String, Any]] = Nil,
                 keysetTable: String = "",
                 keysetSchema: Seq[ColMeta] = Nil,
                 keysetAnswers: Map[String, Seq[Map[String, Any]]] = Map.empty) {
    /** WHERE texts the keyset scans actually sent (S3 assertion). */
    val keysetWheres = mutable.ArrayBuffer.empty[String]
    /** S9 flashback-table schema (lowercase keys in snapshotRows). */
    val snapshotSchema: Seq[ColMeta] = Seq(
      ColMeta("O_ID", java.sql.Types.BIGINT, precision = 19),
      ColMeta("O_STATUS", java.sql.Types.VARCHAR, precision = 12),
      ColMeta("RN", java.sql.Types.BIGINT, precision = 19, nullable = false))
    val addedLogfiles = mutable.ArrayBuffer.empty[String]
    val startedWindows = mutable.ArrayBuffer.empty[(Long, Long)]
    val contentsQueries = mutable.ArrayBuffer.empty[String]
    val asOfQueries = mutable.ArrayBuffer.empty[String]
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

    /** Spark prunes projections into the JDBC SELECT list — the served
      * result set's schema must be the SELECTED columns in order, not
      * the whole table.
      */
    private def selectedSchema(sql: String, full: Seq[ColMeta]): Seq[ColMeta] = {
      val list = "(?is)SELECT\\s+(.*?)\\s+FROM".r.findFirstMatchIn(sql).map(_.group(1))
      list match {
        case Some(cols) if !cols.contains("*") =>
          cols.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")).map { n =>
            full.find(_.name.equalsIgnoreCase(n)).getOrElse(
              throw new IllegalStateException(s"scan selects unknown column '$n': $sql"))
          }
        case _ => full
      }
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
      } else if (keysetTable.nonEmpty && sql.contains(keysetTable)) {
        // S3 keyset read — Spark sends one SELECT per predicate, the
        // predicate verbatim as the partition's WHERE clause
        if (sql.contains("1=0")) resultSet(Nil, selectedSchema(sql, keysetSchema))
        else {
          // Spark sends the partition predicate VERBATIM after WHERE
          val where = sql.split("WHERE", 2) match {
            case Array(_, w) => w.trim
            case _ => throw new IllegalStateException(s"keyset scan without WHERE: $sql")
          }
          def norm(s: String) = s.replaceAll("\\s+", " ").trim
          val rows = keysetAnswers.collectFirst {
            case (p, r) if norm(p) == norm(where) => r
          }.getOrElse(throw new IllegalStateException(
            s"keyset scan with an UNPLANNED predicate: '$where'"))
          keysetWheres += where
          resultSet(rows, selectedSchema(sql, keysetSchema))
        }
      } else if (sql.contains("AS OF SCN")) {
        // S9 flashback chunk read — Spark's JDBC source sends a schema
        // probe (WHERE 1=0) then the per-partition rownum-window scans
        asOfQueries += sql
        if (sql.contains("1=0")) resultSet(Nil, selectedSchema(sql, snapshotSchema))
        else {
          val hi = "ROWNUM <= (\\d+)".r.findFirstMatchIn(sql).get.group(1).toLong
          val lo = "rn > (\\d+)".r.findFirstMatchIn(sql).get.group(1).toLong
          resultSet(snapshotRows.filter { r =>
            val rn = r("rn").asInstanceOf[Long]; rn > lo && rn <= hi
          }, selectedSchema(sql, snapshotSchema))
        }
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

    private def preparedStatement(sql: String): java.sql.PreparedStatement =
      proxy(classOf[java.sql.PreparedStatement]) { (name, args) =>
        name match {
          case "executeQuery" if args.isEmpty => query(sql)
          case "execute" if args.isEmpty => executeStmt(sql); java.lang.Boolean.FALSE
          case "setFetchSize" | "setQueryTimeout" | "close" | "cancel" |
               "clearWarnings" => null
          case "isClosed" => java.lang.Boolean.FALSE
          case other => throw new UnsupportedOperationException(s"PreparedStatement.$other")
        }
      }

    def connection: java.sql.Connection =
      proxy(classOf[java.sql.Connection]) { (name, args) =>
        name match {
          case "createStatement" => statement()
          // Spark's JDBC scan prepares its statements (with or without
          // resultset type/concurrency args — the SQL is always args(0))
          case "prepareStatement" => preparedStatement(args(0).asInstanceOf[String])
          case "close" | "commit" | "rollback" | "setAutoCommit" |
               "clearWarnings" | "setTransactionIsolation" => null
          case "getAutoCommit" => java.lang.Boolean.TRUE
          case "isClosed" => java.lang.Boolean.FALSE
          case "isValid" => java.lang.Boolean.TRUE
          case "getTransactionIsolation" =>
            Integer.valueOf(java.sql.Connection.TRANSACTION_READ_COMMITTED)
          case "getMetaData" =>
            proxy(classOf[java.sql.DatabaseMetaData]) { (n, _) =>
              n match {
                case "getDatabaseProductName" => "FakeOracle"
                case "getDatabaseProductVersion" | "getDriverVersion" => "1.0"
                case "getJDBCMajorVersion" => Integer.valueOf(4)
                case "getJDBCMinorVersion" => Integer.valueOf(2)
                case "getDatabaseMajorVersion" | "getDriverMajorVersion" => Integer.valueOf(1)
                case "getDatabaseMinorVersion" | "getDriverMinorVersion" => Integer.valueOf(0)
                case "getSearchStringEscape" => "\\"
                case "supportsTransactions" => java.lang.Boolean.TRUE
                case "getIdentifierQuoteString" => "\""
                case o => throw new UnsupportedOperationException(s"DatabaseMetaData.$o")
              }
            }
          case other => throw new UnsupportedOperationException(s"Connection.$other")
        }
      }

    /** Register in the driver's url → db map; connects through the
      * standard `DriverManager.getConnection` front door — the exact
      * call a production deployment makes with the vendor driver on
      * the classpath.
      */
    def jdbcUrl: String = FakeOracleDriver.register(this)
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

  test("S9 snapshot: Spark's own JDBC source reads the AS-OF-SCN chunks") {
    // the SURVEY primitive for S9 is "JDBC read with AS OF SCN in
    // dbtable" — here spark.read.jdbc executes the oracled chunk plans
    // for real against the fake endpoint: one dbtable subquery per
    // chunk, schema probe + rownum-window scans, rows back as DataFrames
    val total = 23L
    val snapRows = (1L to total).map(i => Map[String, Any](
      "o_id" -> i, "o_status" -> s"st${i % 3}", "rn" -> i))
    val db = new Db(Nil, Seq(1L), Seq((1L, 1L, 1L)),
      logFiles = Seq("/u01/redo01.log"), snapshotRows = snapRows)
    val url = db.jdbcUrl
    val chunks = RedoSqlParser.snapshotChunks("SHOP", "ORDERS", 12345L, total, chunk = 10)
    assert(chunks.size == 3)
    val props = new java.util.Properties()
    val parts = chunks.map(c => spark.read.jdbc(url, c, props))
    val all = parts.reduce(_ unionAll _)
    assert(all.columns.toSeq == Seq("O_ID", "O_STATUS", "RN"))
    val collected = all.select("O_ID", "O_STATUS").as[(Long, String)].collect().sortBy(_._1)
    assert(collected.length == 23)
    assert(collected.map(_._1).toSeq == (1L to 23L))
    assert(collected.forall { case (id, st) => st == s"st${id % 3}" })
    // every server-side scan was a flashback query at the pinned SCN
    assert(db.asOfQueries.nonEmpty &&
      db.asOfQueries.forall(_.contains("AS OF SCN 12345")))
    // and the three data windows (non-probe) tile the table exactly
    val windows = db.asOfQueries.filterNot(_.contains("1=0")).map { q =>
      ("rn > (\\d+)".r.findFirstMatchIn(q).get.group(1).toLong,
        "ROWNUM <= (\\d+)".r.findFirstMatchIn(q).get.group(1).toLong)
    }.distinct.sorted
    // the generator does not clamp the last hi — ROWNUM simply runs out
    // of rows, the reference dumper's chunking shape
    assert(windows == Seq((0L, 10L), (10L, 20L), (20L, 30L)), s"windows: $windows")
  }

  test("S3 keyset chunks: spark.read.jdbc(predicates) scans each range as one partition") {
    // the SURVEY primitive for S3 is "spark.read.jdbc(url, table,
    // predicates)" — run it for real: the generated lexicographic
    // keyset predicates become partition WHERE clauses verbatim, the
    // union is the table exactly once. The fake REFUSES any predicate
    // that was not planned, so a rewritten/mangled clause fails loudly.
    val rows = (1L to 40L).map(i => Map[String, Any](
      "o_id" -> (i / 4), "sub_id" -> (i % 4), "payload" -> s"p$i", "rn" -> i))
    val schema = Seq(
      ColMeta("O_ID", java.sql.Types.BIGINT, precision = 19),
      ColMeta("SUB_ID", java.sql.Types.BIGINT, precision = 19),
      ColMeta("PAYLOAD", java.sql.Types.VARCHAR, precision = 12),
      ColMeta("RN", java.sql.Types.BIGINT, precision = 19))
    // plan predicates on a composite key from a local frame of the same
    // rows (the planner's sampling path), then precompute each range's
    // answer with Spark's own filter semantics — the contract the
    // oracled s3_keyset_chunks already proves mathematically
    val local = rows.map(r => (r("o_id").asInstanceOf[Long],
      r("sub_id").asInstanceOf[Long], r("payload").toString, r("rn").asInstanceOf[Long]))
      .toDF("o_id", "sub_id", "payload", "rn")
    val preds = ChunkPlanner.chunkPredicates(local, Seq("o_id", "sub_id"), numChunks = 4)
    assert(preds.size >= 3, s"predicates: $preds")
    val answers = preds.map { p =>
      p -> local.filter(expr(p)).collect().map(r => Map[String, Any](
        "o_id" -> r.getLong(0), "sub_id" -> r.getLong(1),
        "payload" -> r.getString(2), "rn" -> r.getLong(3))).toSeq
    }.toMap
    val db = new Db(Nil, Seq(1L), Seq((1L, 1L, 1L)), logFiles = Seq("/u01/redo01.log"),
      keysetTable = "SHOP.ORDERS", keysetSchema = schema, keysetAnswers = answers)
    val got = spark.read.jdbc(db.jdbcUrl, "SHOP.ORDERS", preds.toArray,
        new java.util.Properties())
      .select("PAYLOAD").as[String].collect().sorted
    assert(got.toSeq == (1L to 40L).map(i => s"p$i").sorted, s"got ${got.length} rows")
    // one scan per predicate, each sent verbatim
    assert(db.keysetWheres.map(_.replaceAll("\\s+", " ")).sorted ==
      preds.map(_.replaceAll("\\s+", " ")).sorted)
  }

  test("pump: endpoint → staged JSONL windows → streaming tx cache → committed txs") {
    // the full S7 streaming deployment: the single-connection poll loop
    // drains on the driver (a DBMS_LOGMNR session is per-connection —
    // the reference's one-reader-goroutine constraint), stages each
    // window as an atomically-renamed segment, and everything after is
    // distributed Structured Streaming
    import LogMinerTxCache.{OracleTx, RedoRecord}
    val longInsert =
      """insert into "SHOP"."ITEMS"("ID","NAME") values (1,'a-deliberately-long-value-so-the-record-splits')"""
    val (p1, rest) = longInsert.splitAt(35)
    val (p2, p3) = rest.splitAt(30)
    val redo = Seq(
      redoRow(101L, OpInsert, "x1", p1, csf = 1, rowId = "R1", tableName = "ITEMS"),
      redoRow(102L, OpInsert, "x1", p2, csf = 1, rowId = "R1", tableName = "ITEMS"),
      redoRow(103L, OpInsert, "x1", p3, csf = 0, rowId = "R1", tableName = "ITEMS"),
      redoRow(105L, OpInsert, "x2",
        """insert into "SHOP"."ITEMS"("ID","NAME") values (9,'gone')""",
        rowId = "R9", tableName = "ITEMS"),
      redoRow(110L, OpCommit, "x1", ""),
      redoRow(112L, OpRollback, "x2", ""),
      redoRow(120L, OpDdl, "x3", "CREATE TABLE SHOP.LIVE(ID NUMBER(8))", tableName = "LIVE"),
      redoRow(121L, OpCommit, "x3", ""),
      redoRow(130L, OpInsert, "x4",
        """insert into "SHOP"."LIVE"("ID") values (7)""", rowId = "R7", tableName = "LIVE"),
      redoRow(131L, OpCommit, "x4", ""))
    val db = new Db(redo,
      scnProbes = Seq(115L, 135L, 135L, 135L),
      fpProbes = Seq((1L, 1L, 5L)),
      logFiles = Seq("/u01/redo01.log"))
    val conn = java.sql.DriverManager.getConnection(db.jdbcUrl)
    val outDir = graft.TempDirs.scratch("lm_pump_")
    val (state, files) = LogMinerPump.drainTo(conn, 100L,
      LogMinerSession.schemaFilter(Seq("SHOP" -> Nil), Nil), outDir)
    assert(state.startScn == 135L && files.size == 2, s"$state / $files")

    // cross-check: the pump's iterator-form csf join + op map must equal
    // the DataFrame form (toRedoFrame) on the same raw rows
    val staged = spark.read
      .schema(implicitly[org.apache.spark.sql.Encoder[RedoRecord]].schema)
      .json(outDir)
      .select("scn", "xid", "op", "rowId", "redoSql", "rollback")
      .as[(Long, String, String, String, String, Int)].collect().toSet
    val dfForm = LogMinerPoller.toRedoFrame(spark,
        db.startedWindows.toSeq.flatMap { case (lo, hi) =>
          // re-serve the already-polled rows through the fake's own data
          redo.filter(r => r("scn").asInstanceOf[Long] > lo && r("scn").asInstanceOf[Long] <= hi)
        }.map(m => LogMinerPoller.ContentsRow(
          m("scn").asInstanceOf[Long], m("seg_owner").toString, m("table_name").toString,
          Option(m("sql_redo")).map(_.toString).orNull, null,
          m("operation_code").asInstanceOf[Int], m("xid").toString,
          m("csf").asInstanceOf[Int], m("row_id").toString,
          m("rollback").asInstanceOf[Int], m("rs_id").toString,
          m("timestamp").toString, m("username").toString)))
      .as[(Long, String, String, String, String, Int)].collect().toSet
    assert(staged == dfForm, s"iterator form diverged:\n$staged\nvs\n$dfForm")

    // streaming consumption: tail the staged dir, shard tx state by xid
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[RedoRecord]].schema)
      .json(outDir).as[RedoRecord]
    val q = LogMinerTxCache.assemble(stream)
      .writeStream.format("memory").queryName("lm_pump_tx")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val txs = spark.table("lm_pump_tx").as[OracleTx].collect()
      .map(t => t.xid -> t).toMap
    assert(txs.keySet == Set("x1", "x3", "x4"), s"txs: ${txs.keySet}") // x2 rolled back
    assert(txs("x1").records.map(_.redoSql) == Seq(longInsert)) // csf rejoined
    assert(txs("x3").records.head.op == "ddl")
    assert(txs("x4").startScn == 130L && txs("x4").endScn == 131L)
  }

  test("unknown operation codes fail loudly — dropped redo is CDC data loss") {
    // unreachable through contentsQuery's IN-list; pinned for the
    // hand-fed and future-query-edit paths
    val bad = LogMinerPoller.ContentsRow(7L, "SHOP", "T", "whatever", null,
      operationCode = 9, xid = "x", csf = 0, rowId = "R", rollback = 0,
      rsId = "rs", timestamp = "t", username = "u")
    val e = intercept[IllegalArgumentException](LogMinerPump.toRedoRecord(bad))
    assert(e.getMessage.contains("operation_code 9"))
    val e2 = intercept[Exception] {
      LogMinerPoller.toRedoFrame(spark, Seq(bad)).collect()
    }
    assert(e2.getMessage.contains("unknown LogMiner operation_code") ||
      Option(e2.getCause).exists(_.getMessage.contains("unknown LogMiner operation_code")))
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
