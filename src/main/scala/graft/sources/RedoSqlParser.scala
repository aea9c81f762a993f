package graft.sources

import graft.model.{ChangeEvent, Op}

/** S7/S8 — Oracle LogMiner redo-SQL → row parsing (SURVEY.md §2.1;
  * reference `driver/oracle/extractor/sql_parse.go:27-120` and
  * `log_miner.go:918-1073` parseDMLSQL).
  *
  * LogMiner emits each change as literal redo SQL
  * (`insert into "S"."T"("C1","C2") values ('v',1)`; updates/deletes
  * carry the before-image as WHERE conjuncts). The reference parses
  * these with the TiDB MySQL parser; here it is a small recursive-
  * descent parser over the restricted grammar LogMiner actually
  * produces — runs per event inside `mapPartitions`, no driver round
  * trips.
  *
  * Value converters mirror the reference's
  * (`sql_parse_test.go:7`): TO_DATE/TO_TIMESTAMP unwrap to the literal,
  * HEXTORAW to a hex string, EMPTY_BLOB()/EMPTY_CLOB() to empty,
  * NULL to null, numbers and ''-escaped strings to themselves.
  */
object RedoSqlParser {

  case class ParsedDml(
      schema: String,
      table: String,
      op: String,
      before: Map[String, String],
      after: Map[String, String]
  )

  def parse(sql: String): Option[ParsedDml] = {
    val s = sql.trim
    val lower = s.toLowerCase
    try {
      if (lower.startsWith("insert into")) Some(parseInsert(s))
      else if (lower.startsWith("update")) Some(parseUpdate(s))
      else if (lower.startsWith("delete from")) Some(parseDelete(s))
      else None
    } catch {
      case _: Exception => None
    }
  }

  /** Redo rows (scn, xid, sql) → ChangeEvents, ordered by SCN — the
    * stream stage after the LogMiner poll (reference LoopLogminerRecord,
    * `log_miner.go:733`). DML parses to row images; DDL redo converts
    * through [[graft.ddl.OracleDdlConverter]] (the reference's
    * parseDDLSQL branch for operation-code-5 records,
    * `log_miner.go:1075`) and lands as an `Op.Ddl` event whose `after
    * ("sql")` already carries MYSQL dialect — the same shape
    * [[BinlogParser]] emits for QUERY events, so the
    * [[graft.streaming.CdcPipeline]] DDL barrier and
    * [[graft.ddl.DdlProcessor]] apply it unchanged. `segOwner`
    * resolves unqualified DDL names (the redo record's segment owner).
    */
  def toChangeEvents(rows: Iterator[(Long, String, String)], originServerId: String,
                     segOwner: String = ""): Iterator[ChangeEvent] =
    rows.flatMap { case (scn, xid, sql) =>
      parse(sql) match {
        case Some(d) =>
          Some(ChangeEvent(d.schema, d.table, d.op,
            key = d.after.getOrElse("ROWID", d.before.getOrElse("ROWID", "")),
            before = d.before, after = d.after,
            tsMillis = 0L, gtid = xid, seq = scn, lastCommitted = -1L,
            originServerId = originServerId))
        case None if isDdl(sql) =>
          // A DDL statement the converter cannot parse FAILS the batch
          // (reference parseToDataEvent returns the parseDDLSQL error,
          // `log_miner.go:903-907`): silently dropping it would diverge
          // the target schema from the source with no trace.
          graft.ddl.OracleDdlConverter.convert(sql, segOwner) match {
            case Right(c) =>
              Some(ChangeEvent(c.schema, c.table, graft.model.Op.Ddl, key = "",
                before = Map.empty, after = Map("sql" -> c.sql),
                tsMillis = 0L, gtid = xid, seq = scn, lastCommitted = -1L,
                originServerId = originServerId))
            case Left(err) =>
              throw new IllegalArgumentException(
                s"unconvertible redo DDL at scn=$scn: $err; sql=$sql")
          }
        case None if isDmlShaped(sql) =>
          // Starts like DML but didn't parse: the reference's
          // parseDMLSQL would return the error (`log_miner.go:910-913`)
          // — fail loudly rather than lose a row change.
          throw new IllegalArgumentException(
            s"unparseable redo DML at scn=$scn: $sql")
        case None =>
          // Transaction control / internal rows (COMMIT, ROLLBACK, SET
          // TRANSACTION, …): the reference never routes these to
          // parseToDataEvent (only operation codes 1/2/3/5 do,
          // `log_miner.go:898-915`) — skipped, not an error.
          None
      }
    }

  // ---- parsing --------------------------------------------------------

  private case class Cursor(s: String, var i: Int) {
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def expect(kw: String): Unit = {
      skipWs()
      if (!s.regionMatches(true, i, kw, 0, kw.length))
        throw new IllegalArgumentException(s"expected $kw at $i in $s")
      i += kw.length
    }
    def peek(kw: String): Boolean = { skipWs(); s.regionMatches(true, i, kw, 0, kw.length) }
    def eof: Boolean = { skipWs(); i >= s.length || s.charAt(i) == ';' }
  }

  /** Leading-keyword DDL detection — the sandbox stand-in for LogMiner's
    * OPERATION_CODE=5 tag (our rows carry only (scn, xid, sql)). Oracle
    * classifies GRANT/REVOKE/AUDIT as DDL too, so they route to the
    * converter and surface its error rather than vanishing.
    */
  private val ddlKeywords = Set("CREATE", "ALTER", "DROP", "TRUNCATE",
    "RENAME", "COMMENT", "GRANT", "REVOKE", "ANALYZE", "AUDIT", "PURGE",
    "FLASHBACK", "ASSOCIATE", "DISASSOCIATE", "NOAUDIT")

  private def isDdl(sql: String): Boolean = {
    val t = sql.dropWhile(_.isWhitespace)
    val kw = t.takeWhile(ch => !ch.isWhitespace && ch != '(' && ch != ';')
    ddlKeywords.contains(kw.toUpperCase(java.util.Locale.ROOT))
  }

  /** Looks like one of the three DML forms [[parse]] accepts — used to
    * distinguish "malformed DML" (an error) from "not DML at all". */
  private def isDmlShaped(sql: String): Boolean = {
    val lower = sql.trim.toLowerCase
    lower.startsWith("insert into") || lower.startsWith("update") ||
      lower.startsWith("delete from")
  }

  private def parseInsert(sql: String): ParsedDml = {
    val c = Cursor(sql, 0)
    c.expect("insert"); c.expect("into")
    val (sch, tbl) = qualifiedName(c)
    c.expect("(")
    val cols = scala.collection.mutable.ArrayBuffer.empty[String]
    var done = false
    while (!done) {
      cols += ident(c)
      c.skipWs()
      if (c.peek(",")) c.expect(",") else { c.expect(")"); done = true }
    }
    c.expect("values"); c.expect("(")
    val vals = scala.collection.mutable.ArrayBuffer.empty[String]
    done = false
    while (!done) {
      vals += value(c)
      c.skipWs()
      if (c.peek(",")) c.expect(",") else { c.expect(")"); done = true }
    }
    require(cols.length == vals.length, "column/value arity mismatch")
    ParsedDml(sch, tbl, Op.Insert, Map.empty, cols.zip(vals).toMap)
  }

  private def parseUpdate(sql: String): ParsedDml = {
    val c = Cursor(sql, 0)
    c.expect("update")
    val (sch, tbl) = qualifiedName(c)
    c.expect("set")
    val after = scala.collection.mutable.Map.empty[String, String]
    var more = true
    while (more) {
      val col = ident(c); c.expect("="); val v = value(c)
      after(col) = v
      if (c.peek(",")) c.expect(",") else more = false
    }
    val before = if (c.peek("where")) { c.expect("where"); conjuncts(c) } else Map.empty[String, String]
    // columns absent from SET keep their before value (reference merges
    // the where-image into the after row, log_miner.go:1040-1060)
    ParsedDml(sch, tbl, Op.Update, before, before ++ after)
  }

  private def parseDelete(sql: String): ParsedDml = {
    val c = Cursor(sql, 0)
    c.expect("delete"); c.expect("from")
    val (sch, tbl) = qualifiedName(c)
    val before = if (c.peek("where")) { c.expect("where"); conjuncts(c) } else Map.empty[String, String]
    ParsedDml(sch, tbl, Op.Delete, before, Map.empty)
  }

  private def conjuncts(c: Cursor): Map[String, String] = {
    val out = scala.collection.mutable.Map.empty[String, String]
    var more = true
    while (more) {
      val col = ident(c)
      c.skipWs()
      if (c.peek("is")) { // IS NULL
        c.expect("is"); c.expect("null")
        out(col) = null
      } else {
        c.expect("=")
        out(col) = value(c)
      }
      if (c.peek("and")) c.expect("and") else more = false
    }
    out.toMap
  }

  private def qualifiedName(c: Cursor): (String, String) = {
    val first = ident(c)
    c.skipWs()
    if (c.peek(".")) { c.expect("."); (first, ident(c)) } else ("", first)
  }

  private def ident(c: Cursor): String = {
    c.skipWs()
    val s = c.s
    if (c.i < s.length && s.charAt(c.i) == '"') {
      val end = s.indexOf('"', c.i + 1)
      val r = s.substring(c.i + 1, end); c.i = end + 1; r
    } else {
      val start = c.i
      while (c.i < s.length && (s.charAt(c.i).isLetterOrDigit || s.charAt(c.i) == '_' || s.charAt(c.i) == '$')) c.i += 1
      s.substring(start, c.i)
    }
  }

  /** One literal value with the reference's converter set. */
  private def value(c: Cursor): String = {
    c.skipWs()
    val s = c.s
    if (c.peek("null")) { c.expect("null"); null }
    else if (c.peek("to_date") || c.peek("to_timestamp")) {
      // TO_DATE('2021-01-01 10:00:00', 'YYYY-MM-DD HH24:MI:SS') → literal
      while (s.charAt(c.i) != '(') c.i += 1
      c.i += 1
      val lit = quoted(c)
      // skip optional format arg up to closing paren (nesting-free)
      var depth = 1
      while (depth > 0) {
        val ch = s.charAt(c.i)
        if (ch == '(') depth += 1 else if (ch == ')') depth -= 1
        else if (ch == '\'') { c.i += 1; while (s.charAt(c.i) != '\'') c.i += 1 }
        c.i += 1
      }
      lit
    } else if (c.peek("hextoraw")) {
      while (s.charAt(c.i) != '(') c.i += 1
      c.i += 1
      val lit = quoted(c)
      c.skipWs(); c.expect(")")
      lit.toLowerCase
    } else if (c.peek("empty_blob()") || c.peek("empty_clob()")) {
      if (c.peek("empty_blob()")) c.expect("empty_blob()") else c.expect("empty_clob()")
      ""
    } else if (c.peek("unistr")) {
      // UNISTR('\0412\044B') [|| UNISTR('...')]* — national-charset
      // literals, possibly concatenated (reference columnsValueConverter
      // + UnitstrConvert, `sql_parse.go:171-222`): each \XXXX 4-hex
      // escape is one UTF-16 unit, other characters pass through
      val sb = new StringBuilder
      var more = true
      while (more) {
        c.expect("unistr"); c.skipWs()
        require(s.charAt(c.i) == '(', s"expected ( after UNISTR at ${c.i}")
        c.i += 1
        sb.append(unistrDecode(quoted(c)))
        c.skipWs()
        require(s.charAt(c.i) == ')', s"expected ) after UNISTR literal at ${c.i}")
        c.i += 1
        c.skipWs()
        if (c.i + 1 < s.length && s.charAt(c.i) == '|' && s.charAt(c.i + 1) == '|') {
          c.i += 2; c.skipWs()
        } else more = false
      }
      sb.toString
    } else if (c.peek("to_dsinterval") || c.peek("to_yminterval")) {
      // interval constructors carry their literal verbatim (reference
      // strips the function wrapper, `sql_parse.go:168-170`)
      while (s.charAt(c.i) != '(') c.i += 1
      c.i += 1
      val lit = quoted(c)
      c.skipWs(); c.expect(")")
      lit
    } else if (s.charAt(c.i) == '\'') {
      quoted(c)
    } else {
      // bare number (possibly signed/decimal/scientific)
      val start = c.i
      while (c.i < s.length && !",) ;".contains(s.charAt(c.i)) && !s.charAt(c.i).isWhitespace) c.i += 1
      val tok = s.substring(start, c.i)
      // MySQL has no Inf/-Inf/Nan: the reference nulls them
      // (`sql_parse.go:181-189`)
      if (tok == "Inf" || tok == "-Inf" || tok == "Nan") null else tok
    }
  }

  /** UNISTR body decode: `\XXXX` → the UTF-16 unit; doubled
    * backslashes (restored-SQL escaping) normalize first; a malformed
    * trailing escape stops cleanly instead of looping (the reference's
    * index loop would spin on one).
    */
  private def unistrDecode(v0: String): String = {
    val v = v0.replace("\\\\", "\\")
    val sb = new StringBuilder
    var i = 0
    while (i < v.length) {
      if (v.charAt(i) != '\\') { sb.append(v.charAt(i)); i += 1 }
      else if (v.length >= i + 5) {
        sb.append(Integer.parseInt(v.substring(i + 1, i + 5), 16).toChar)
        i += 5
      } else i = v.length
    }
    sb.toString
  }

  private def quoted(c: Cursor): String = {
    c.skipWs()
    val s = c.s
    require(s.charAt(c.i) == '\'', s"expected quote at ${c.i}")
    val sb = new StringBuilder
    c.i += 1
    var done = false
    while (!done) {
      val ch = s.charAt(c.i)
      if (ch == '\'') {
        if (c.i + 1 < s.length && s.charAt(c.i + 1) == '\'') { sb.append('\''); c.i += 2 }
        else { c.i += 1; done = true }
      } else { sb.append(ch); c.i += 1 }
    }
    sb.toString
  }

  /** S9 — Oracle snapshot chunking: `AS OF SCN` flashback query with
    * rownum windows (reference `oracle/extractor/dumper.go:39-60`).
    * Produced as JDBC `dbtable` subqueries, one per partition.
    */
  def snapshotChunks(schema: String, table: String, scn: Long, totalRows: Long, chunk: Int): Seq[String] = {
    val n = math.max(1, math.ceil(totalRows.toDouble / chunk).toInt)
    (0 until n).map { i =>
      val lo = i.toLong * chunk
      val hi = lo + chunk
      s"""(SELECT * FROM (SELECT t.*, ROWNUM rn FROM "$schema"."$table" AS OF SCN $scn t WHERE ROWNUM <= $hi) WHERE rn > $lo)"""
    }
  }
}
