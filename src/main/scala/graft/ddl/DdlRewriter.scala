package graft.ddl

import graft.model.{ReplicationSpec, SchemaSpec}

/** F4/F5/F8 + K5 — DDL classification and rewrite (SURVEY.md §2.3).
  *
  * The reference parses DDL with the TiDB MySQL parser, mutates
  * schema/table identifiers across 14 statement kinds, and restores SQL
  * text (`driver/mysql/binlog/binlog_reader.go:847-957` loadMapping);
  * classification feeds the SqlFilter (`:110-178`) and the skip rules
  * (`:1228-1265`). No MySQL-dialect parser ships with Spark, so this is
  * a driver-side tokenizing rewriter covering the statement surface the
  * reference handles; it runs once per DDL (control path, not data
  * path), so throughput is irrelevant — fidelity is what matters.
  */
object DdlRewriter {

  sealed trait DdlKind
  case object CreateSchema extends DdlKind
  case object DropSchema   extends DdlKind
  case object AlterSchema  extends DdlKind
  case object CreateTable  extends DdlKind
  case object DropTable    extends DdlKind
  case object AlterTable   extends DdlKind
  case object RenameTable  extends DdlKind
  case object Truncate     extends DdlKind
  case object CreateIndex  extends DdlKind
  case object DropIndex    extends DdlKind
  case object FlushTables  extends DdlKind // FLUSH TABLES with a table list
  case object OtherDdl     extends DdlKind
  case object SkippedStmt  extends DdlKind // trigger/event/view — skipped unconditionally
  /** Expand-syntax statements (grants, user admin, procedures/functions,
    * SET PASSWORD, bare FLUSH forms): skipped by DEFAULT but FORWARDED
    * when `ReplicationSpec.expandSyntaxSupport` is set — the reference's
    * opt-in `ExpandSyntaxSupport` gate (`binlog_reader.go:560-567`
    * `skipSql = queryInfo.isExpand || isExpandSyntaxQuery` only when the
    * flag is off; expand cases `:1107-1156`, string-matched procedures
    * `:1251-1263`).
    */
  case object ExpandStmt   extends DdlKind

  private val skipPatterns: Seq[String] = Seq(
    // reference ALWAYS-skip set — regardless of ExpandSyntaxSupport
    // (`binlog_reader.go:561-563` isSkip ∪ isSkipQuery: CreateView /
    // AlterView / DropTrigger resolve isSkip `:1095-1097,1166`, and the
    // trigger/event regexes `:1228-1232,1236-1249`)
    "(?is)^\\s*create\\s+(definer\\s*=\\s*\\S+\\s+)?(trigger|event|view)\\b.*",
    "(?is)^\\s*(alter|drop)\\s+(definer\\s*=\\s*\\S+\\s+)?(trigger|event|view)\\b.*"
  )

  private val expandPatterns: Seq[String] = Seq(
    // reference expand set: RevokeStmt/SetPwdStmt/FlushStmt/procedure
    // admin (`binlog_reader.go:1107-1122`), Create/Grant/Drop/Alter user
    // → routed against mysql.user (`:1151-1156`), plus the
    // string-matched `rename user` / `CREATE DEFINER=… PROCEDURE`
    // (`isExpandSyntaxQuery :1251-1263`). FLUSH TABLES with a table
    // list is NOT here — classify() maps it to FlushTables first.
    "(?is)^\\s*(grant|revoke|flush)\\b.*",
    "(?is)^\\s*(create|alter|drop|rename)\\s+user\\b.*",
    "(?is)^\\s*set\\s+password\\b.*",
    "(?is)^\\s*create\\s+(definer\\s*=\\s*\\S+\\s+)?(function|procedure)\\b.*",
    "(?is)^\\s*(alter|drop)\\s+(definer\\s*=\\s*\\S+\\s+)?(function|procedure)\\b.*"
  )

  def classify(sql: String): DdlKind = {
    val s = sql.trim
    val lower = s.toLowerCase
    // FLUSH TABLES with an explicit table list maps idents (reference
    // FlushStmt branch, `binlog_reader.go:932-941`); every other FLUSH
    // form falls through to the skip patterns
    if (lower.matches("(?s)^flush\\s+(local\\s+|no_write_to_binlog\\s+)?tables\\s+(?!with\\b)[a-z0-9_$`].*"))
      return FlushTables
    if (skipPatterns.exists(s.matches)) return SkippedStmt
    if (expandPatterns.exists(s.matches)) return ExpandStmt
    if (lower.startsWith("create database") || lower.startsWith("create schema")) CreateSchema
    else if (lower.startsWith("drop database") || lower.startsWith("drop schema")) DropSchema
    else if (lower.startsWith("alter database") || lower.startsWith("alter schema")) AlterSchema
    else if (lower.startsWith("create table")) CreateTable
    else if (lower.startsWith("drop table")) DropTable
    else if (lower.startsWith("alter table")) AlterTable
    else if (lower.startsWith("rename table")) RenameTable
    else if (lower.startsWith("truncate")) Truncate
    else if (lower.matches("(?s)^create\\s+(unique\\s+|fulltext\\s+|spatial\\s+)?index\\b.*")) CreateIndex
    else if (lower.startsWith("drop index")) DropIndex
    else OtherDdl
  }

  /** ALTER sub-kind classification for the SqlFilter's five ALTER gates
    * (reference `binlog_reader.go:110-178`: Add/Drop/Modify/Change/Alter
    * column, each independently gateable).
    */
  def alterKind(sql: String): Option[String] = {
    val lower = sql.trim.toLowerCase
    if (!lower.startsWith("alter table")) None
    else if (lower.matches("(?s).*\\badd\\s+(column|\\().*")) Some("AddColumn")
    else if (lower.matches("(?s).*\\bdrop\\s+column\\b.*")) Some("DropColumn")
    else if (lower.matches("(?s).*\\bmodify\\s+(column\\s+)?\\w.*")) Some("ModifyColumn")
    else if (lower.matches("(?s).*\\bchange\\s+(column\\s+)?\\w.*")) Some("ChangeColumn")
    else if (lower.matches("(?s).*\\balter\\s+column\\b.*")) Some("AlterColumn")
    else if (lower.matches("(?s).*\\brename\\b.*")) Some("Rename")
    else Some("Other")
  }

  /** `lower_case_table_names != 0` handling (reference `mayLowerTable`,
    * `binlog_reader.go:1064-1070`): lowercase every schema/table ident
    * — backticked, qualified, and the statement-shaped bare positions
    * (same anchors as the rename pass) — leaving string literals,
    * keywords, and column idents alone. Compose BEFORE [[rewrite]] so
    * rename maps are keyed in lowercase, the same order resolveQuery
    * runs (lower, then loadMapping).
    */
  def lowerIdents(sql: String): String = {
    val segments = tokenize(sql)
    val literals = scala.collection.mutable.ArrayBuffer.empty[String]
    val masked = new StringBuilder
    segments.foreach {
      case Code(c) => masked.append(c)
      case Backtick(b, term) =>
        // Backticked idents pass through unchanged: the reference's
        // mayLowerTable lowers only TableName AST nodes, so a column
        // ident like ADD COLUMN `MyCol` keeps its case. Table positions
        // are lowered below (qualified pairs + the statement-shaped
        // anchors rewriteBarePositions knows, which handle backticks).
        masked.append('`').append(b); if (term) masked.append('`')
      case Str(q, sIn, term) =>
        masked.append('\u0001').append(literals.length).append('\u0001')
        literals += (if (term) s"$q$sIn$q" else s"$q$sIn")
    }
    val qualified = "(`?)([A-Za-z0-9_$]+)\\1(\\s*\\.\\s*)(`?)([A-Za-z0-9_$]+)\\4".r
    val loweredQ = qualified.replaceAllIn(masked.toString(), m =>
      java.util.regex.Matcher.quoteReplacement(
        m.group(1) + m.group(2).toLowerCase + m.group(1) + m.group(3) +
          m.group(4) + m.group(5).toLowerCase + m.group(4)))
    val lowered = rewriteBarePositions(loweredQ,
      raw => if (raw.contains(".")) raw else raw.toLowerCase,
      s => if (s == s.toLowerCase) None else Some(s.toLowerCase))
    literals.zipWithIndex.foldLeft(lowered) { case (s, (lit0, i)) =>
      s.replace(s"\u0001$i\u0001", lit0)
    }
  }

  /** Identifier-aware schema/table rename in DDL text: rewrites
    * `schema`.`table`, schema.table, and the bare table after the
    * statement verb. Backtick-quoted and unquoted forms are both
    * handled; strings and comments are left alone by tokenizing on
    * quotes first.
    */
  def rewrite(sql: String, renameSchema: Map[String, String],
              renameTable: Map[(String, String), (String, String)],
              defaultSchema: String = ""): String = {
    // split into string-literal / backtick / code segments; string
    // literals are swapped for \u0001<i>\u0001 placeholders so the
    // identifier regex can safely run over the reassembled statement
    // (qualified `a`.`b` spans backtick+code segments), then restored.
    val segments = tokenize(sql)
    val literals = scala.collection.mutable.ArrayBuffer.empty[String]
    val masked = new StringBuilder
    segments.foreach {
      case Code(c) => masked.append(c)
      case Backtick(b, term) =>
        // an UNTERMINATED quote renders back without a closing delimiter:
        // "repairing" malformed input would silently alter a statement
        // this rewriter doesn't understand — verbatim is the contract
        masked.append('`').append(b); if (term) masked.append('`')
      case Str(q, sIn, term) =>
        masked.append('\u0001').append(literals.length).append('\u0001')
        literals += (if (term) s"$q$sIn$q" else s"$q$sIn")
    }
    val rewritten = rewriteIdents(masked.toString(), renameSchema, renameTable, defaultSchema)
    literals.zipWithIndex.foldLeft(rewritten) { case (s, (lit, i)) =>
      s.replace(s"\u0001$i\u0001", lit)
    }
  }

  private sealed trait Seg
  private case class Code(s: String) extends Seg
  private case class Backtick(s: String, terminated: Boolean = true) extends Seg
  private case class Str(quote: Char, s: String, terminated: Boolean = true) extends Seg

  private def tokenize(sql: String): Vector[Seg] = {
    val out = Vector.newBuilder[Seg]
    val cur = new StringBuilder
    var i = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '`' =>
          if (cur.nonEmpty) { out += Code(cur.toString); cur.clear() }
          val end = sql.indexOf('`', i + 1)
          val stop = if (end < 0) sql.length else end
          out += Backtick(sql.substring(i + 1, stop), end >= 0); i = stop + 1
        case q @ ('\'' | '"') =>
          if (cur.nonEmpty) { out += Code(cur.toString); cur.clear() }
          var j = i + 1
          while (j < sql.length && (sql.charAt(j) != q || (j + 1 < sql.length && sql.charAt(j + 1) == q && { j += 1; true }))) j += 1
          out += Str(q, sql.substring(i + 1, math.min(j, sql.length)), j < sql.length); i = j + 1
        case c => cur.append(c); i += 1
      }
    }
    if (cur.nonEmpty) out += Code(cur.toString)
    out.result()
  }

  private def ident(s: String) = s.replace("`", "")

  /** One identifier: `x` or x, optionally qualified `s`.`t` / s.t. */
  private val NameP = "(?:`?[A-Za-z0-9_$]+`?\\s*\\.\\s*)?`?[A-Za-z0-9_$]+`?"

  private def rewriteIdents(sql: String, renameSchema: Map[String, String],
                            renameTable: Map[(String, String), (String, String)],
                            defaultSchema: String): String = {
    // pass 1 — qualified schema.table (optionally backticked either side)
    val qualified = "(`?)([A-Za-z0-9_$]+)\\1\\.(`?)([A-Za-z0-9_$]+)\\3".r
    val q = qualified.replaceAllIn(sql, m => {
      val (sch, tbl) = (m.group(2), m.group(4))
      val (ns, nt) = renameTable.getOrElse((sch, tbl),
        (renameSchema.getOrElse(sch, sch), tbl))
      java.util.regex.Matcher.quoteReplacement(s"`$ns`.`$nt`")
    })
    // pass 2 — statement-shaped bare-name positions (reference
    // `loadMapping`, `binlog_reader.go:896-945`: renameAstTableFn
    // resolves a bare table against currentSchema before mapping)
    rewriteBarePositions(q,
      raw => mapBareTable(raw, renameSchema, renameTable, defaultSchema),
      s => {
        val ns = renameSchema.getOrElse(s, s)
        if (ns == s) None else Some(s"`$ns`")
      })
  }

  /** A bare table name resolved the way the reference's
    * `renameAstTableFn` resolves it: schema defaults to `defaultSchema`
    * (the binlog event's current schema), then both maps apply, and the
    * restored text is fully qualified. With NO default schema a bare
    * name can only be table-renamed through an ("", table) map key —
    * unmapped names are left byte-identical (this keeps rewrite() a
    * no-op on statements it has nothing to say about).
    */
  private def mapBareTable(raw: String, renameSchema: Map[String, String],
                           renameTable: Map[(String, String), (String, String)],
                           defaultSchema: String): String = {
    if (raw.contains(".")) raw // qualified: pass 1 already handled it
    else {
      val t = ident(raw.trim)
      if (defaultSchema.isEmpty) {
        renameTable.get(("", t)).map { case (_, nt) => s"`$nt`" }.getOrElse(raw)
      } else {
        val (ns, nt) = renameTable.getOrElse((defaultSchema, t),
          (renameSchema.getOrElse(defaultSchema, defaultSchema), t))
        if (ns == defaultSchema && nt == t) raw else s"`$ns`.`$nt`"
      }
    }
  }

  /** Rewrite the table-name positions of the statement kinds the
    * reference maps (`loadMapping` switch, 13 mapped kinds + skip):
    * multi-table DROP, multi-pair RENAME TABLE, TRUNCATE, CREATE TABLE
    * (incl. LIKE refer-table), ALTER TABLE (incl. RENAME TO target, but
    * NOT RENAME COLUMN/INDEX operands), CREATE/DROP INDEX (the table
    * after ON — never the index ident), FLUSH TABLES lists, and the
    * schema ident of CREATE/DROP/ALTER DATABASE. Generic over the name
    * transforms so renaming ([[rewriteIdents]]) and case normalization
    * ([[lowerIdents]]) share one statement-shape engine:
    * `mapName` maps one (possibly backticked/qualified) table-position
    * token to its replacement text; `mapSchema` maps a bare schema
    * ident to Some(replacement) or None to keep the original spelling.
    */
  private def rewriteBarePositions(sql: String, mapName: String => String,
                                   mapSchema: String => Option[String]): String = {
    def replOne(m: scala.util.matching.Regex.Match): String =
      java.util.regex.Matcher.quoteReplacement(m.group(1) + mapName(m.group(2)))
    // a comma list of names, each item's FIRST token is the name and any
    // trailing words (RESTRICT / WITH READ LOCK / ...) pass through
    def mapList(list: String): String = splitTopLevel(list).map { item =>
      val t = item.trim
      if (t.isEmpty) item
      else {
        val lead = item.takeWhile(_.isWhitespace)
        val nameLen = t.indexWhere(c => c.isWhitespace)
        val (name, rest) = if (nameLen < 0) (t, "") else t.splitAt(nameLen)
        lead + mapName(name) + rest
      }
    }.mkString(",")

    classify(sql) match {
      case DropTable =>
        val re = s"(?is)^(\\s*drop\\s+(?:temporary\\s+)?table\\s+(?:if\\s+exists\\s+)?)(.*)$$".r
        re.replaceAllIn(sql, m => java.util.regex.Matcher.quoteReplacement(
          m.group(1) + mapList(m.group(2))))
      case RenameTable =>
        val re = "(?is)^(\\s*rename\\s+table\\s+)(.*)$".r
        re.replaceAllIn(sql, m => {
          val pairs = splitTopLevel(m.group(2)).map { pair =>
            val p = "(?is)^(\\s*)(" + NameP + ")(\\s+to\\s+)(" + NameP + ")(\\s*)$"
            p.r.replaceAllIn(pair, pm => java.util.regex.Matcher.quoteReplacement(
              pm.group(1) + mapName(pm.group(2)) + pm.group(3) + mapName(pm.group(4)) + pm.group(5)))
          }
          java.util.regex.Matcher.quoteReplacement(m.group(1) + pairs.mkString(","))
        })
      case Truncate =>
        val re = s"(?is)^(\\s*truncate\\s+(?:table\\s+)?)($NameP)".r
        re.replaceAllIn(sql, replOne _)
      case CreateTable =>
        val head = s"(?is)^(\\s*create\\s+(?:temporary\\s+)?table\\s+(?:if\\s+not\\s+exists\\s+)?)($NameP)".r
        val like = s"(?is)(\\blike\\s+)($NameP)".r
        like.replaceAllIn(head.replaceAllIn(sql, replOne _), replOne _)
      case AlterTable =>
        val head = s"(?is)^(\\s*alter\\s+(?:ignore\\s+)?table\\s+)($NameP)".r
        // RENAME [TO|AS] <table>; RENAME COLUMN/INDEX/KEY operands are
        // column/index idents, not tables (reference renames only
        // spec.NewTable, `binlog_reader.go:925-929`)
        val renTo = s"(?is)(\\brename\\s+(?:(?:to|as)\\s+)?)(?!column\\b|index\\b|key\\b|to\\b|as\\b)($NameP)".r
        renTo.replaceAllIn(head.replaceAllIn(sql, replOne _), replOne _)
      case CreateIndex | DropIndex =>
        val re = s"(?is)(\\bon\\s+)($NameP)".r
        re.replaceAllIn(sql, replOne _)
      case FlushTables =>
        val re = "(?is)^(\\s*flush\\s+(?:local\\s+|no_write_to_binlog\\s+)?tables\\s+)(.*)$".r
        re.replaceAllIn(sql, m => java.util.regex.Matcher.quoteReplacement(
          m.group(1) + mapList(m.group(2))))
      case CreateSchema | DropSchema | AlterSchema =>
        val re = ("(?is)^(\\s*(?:create|drop|alter)\\s+(?:database|schema)\\s+" +
          "(?:if\\s+(?:not\\s+)?exists\\s+)?)(`?)([A-Za-z0-9_$]+)\\2").r
        re.replaceAllIn(sql, m => java.util.regex.Matcher.quoteReplacement(
          mapSchema(m.group(3)) match {
            case Some(repl) => m.group(1) + repl
            case None       => m.matched
          }))
      case _ => sql
    }
  }

  /** Column-map pruning of CREATE TABLE text (reference
    * `driver/mysql/base/utils.go:737-750`): keep only mapped columns.
    * Operates on the column-def list between the outer parens.
    */
  def pruneCreateTableColumns(sql: String, keep: Seq[String]): String = {
    val open = sql.indexOf('(')
    val close = sql.lastIndexOf(')')
    if (open < 0 || close <= open) return sql
    val head = sql.substring(0, open + 1)
    val tail = sql.substring(close)
    val body = sql.substring(open + 1, close)
    // split on top-level commas
    val parts = splitTopLevel(body)
    val constraintToks = Set("primary", "unique", "key", "index", "constraint", "foreign", "check")
    def nameOf(p: String): String = ident(p.trim.split("[\\s(]")(0)).toLowerCase
    val (constraints, columnDefs) = parts.partition(p => constraintToks.contains(nameOf(p)))
    // the column map dictates ORDER, not just membership — the
    // reference rebuilds the CREATE with columns in columnMap order
    // (RenameCreateTable, `base/utils.go`; golden `utils_test.go:323`
    // puts `val` before `id` for columnMap [val, id]), because its
    // applier binds row values by that ordinal order downstream
    val byName = columnDefs.map(p => nameOf(p) -> p).toMap
    val kept = keep.map(_.toLowerCase).flatMap(byName.get) ++ constraints
    head + kept.mkString(",") + tail
  }

  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) out += cur.toString
    out.result()
  }

  /** resolveQuery's multi-table DROP filtering (reference
    * `binlog_reader.go:1123-1150`, goldens `binlog_reader_test.go:304`):
    * a `DROP TABLE a.b, skip.c, d` replicating to a target that routes
    * away `skip.*` must apply as `DROP TABLE a.b, d` — dropping a table
    * the route never created would fail the applier. Returns the
    * filtered statement text plus the kept (schema, table) pairs; bare
    * names resolve against `defaultSchema`. When EVERY table is skipped
    * the reference keeps the statement's first table but marks the whole
    * statement skipped — mirrored here by an empty kept list (callers
    * drop the statement). Kept items keep their original spelling; only
    * membership changes (the reference re-renders via AST restore, a
    * formatting difference with identical semantics).
    */
  def filterDropTables(sql: String, defaultSchema: String,
                       skip: (String, String) => Boolean): (String, Seq[(String, String)]) = {
    if (classify(sql) != DropTable) return (sql, Nil)
    val re = "(?is)^(\\s*drop\\s+(?:temporary\\s+)?table\\s+(?:if\\s+exists\\s+)?)(.*?)(\\s*(?:restrict|cascade))?\\s*$".r
    re.findFirstMatchIn(sql) match {
      case None => (sql, Nil)
      case Some(m) =>
        val tail = Option(m.group(3)).getOrElse("")
        val items = splitTopLevel(m.group(2)).map(_.trim).filter(_.nonEmpty)
        def pairOf(item: String): (String, String) = {
          val name = item.split("\\s+")(0)
          name.split("\\.") match {
            case Array(s, t) => (ident(s), ident(t))
            case _           => (defaultSchema, ident(name))
          }
        }
        val kept = items.filterNot { it => val (s, t) = pairOf(it); skip(s, t) }
        if (kept.isEmpty) (m.group(1) + items.headOption.getOrElse("") + tail, Nil)
        else (m.group(1) + kept.mkString(", ") + tail, kept.map(pairOf))
    }
  }

  /** Routing decision for a DDL statement against the replication spec
    * (reference skipQueryDDL, `binlog_reader.go:1200-1226`).
    */
  def shouldApply(sql: String, schema: String, table: String, spec: ReplicationSpec): Boolean = {
    val kind = classify(sql)
    // expand-syntax statements ride the flag alone: the reference routes
    // them against mysql.user and skipQueryDDL admits schema "mysql"
    // exactly when ExpandSyntaxSupport is on (`binlog_reader.go:1202-1208`)
    if (kind == ExpandStmt) return spec.expandSyntaxSupport
    kind != SkippedStmt && {
      // "mysql" opens under the expand flag; sys/information_schema/
      // performance_schema never do (`binlog_reader.go:1202-1210`)
      val sysOk =
        if (schema.equalsIgnoreCase("mysql")) spec.expandSyntaxSupport
        else !graft.operators.Relational.systemSchemas.contains(schema.toLowerCase)
      val included = spec.doDb.isEmpty || spec.doDb.exists { s: SchemaSpec =>
        val sOk = s.schemaRegex.map(schema.matches).getOrElse(s.schema == schema)
        sOk && (s.tables.isEmpty || table.isEmpty || s.tables.exists(t =>
          t.name == table || (t.name.startsWith("^") && table.matches(t.name))))
      }
      val excluded = spec.ignoreDb.exists(ig =>
        ig.schema == schema && (ig.tables.isEmpty || ig.tables.contains(table)))
      sysOk && included && !excluded
    }
  }
}
