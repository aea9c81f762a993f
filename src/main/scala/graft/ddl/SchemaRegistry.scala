package graft.ddl

import org.apache.spark.sql.types._

/** §1.2 + K5 — the MySQL→Spark type matrix and the dynamic schema
  * registry.
  *
  * The reference tracks per-table column lists and replays DDL ASTs so
  * schemas stay current without re-querying the source (sqle inspector,
  * `driver/mysql/sqle/inspector/`; invalidation points
  * `binlog_reader.go:1406-1447`, `applier_incr.go:631-650`). Spark
  * plans are schema-static, so the registry owns the authoritative
  * `StructType` per (db, table); a DDL event updates it and signals a
  * re-plan (restart the affected streaming query with the new schema).
  */
object TypeMapper {

  /** The 25-type MySQL column matrix (reference
    * `driver/mysql/mysqlconfig/types.go:24-57`) → Spark types, with
    * unsigned widening to the next size (`types.go:115-134`).
    */
  def mysqlToSpark(typeText: String): DataType = {
    val t = typeText.trim.toLowerCase
    val unsigned = t.contains("unsigned")
    val base = t.takeWhile(c => c.isLetter)
    def precScale: (Int, Int) = {
      val m = "\\((\\d+)\\s*(?:,\\s*(\\d+))?\\)".r.findFirstMatchIn(t)
      m.map(mm => (mm.group(1).toInt, Option(mm.group(2)).map(_.toInt).getOrElse(0)))
        .getOrElse((10, 0))
    }
    base match {
      case "tinyint" =>
        if (t.startsWith("tinyint(1)")) BooleanType // MySQL bool convention
        else if (unsigned) ShortType else ByteType
      case "smallint"  => if (unsigned) IntegerType else ShortType
      case "mediumint" => IntegerType
      case "int" | "integer" => if (unsigned) LongType else IntegerType
      case "bigint"    => if (unsigned) DecimalType(20, 0) else LongType
      case "float"     => FloatType
      case "double" | "real" => DoubleType
      case "decimal" | "numeric" => val (p, s) = precScale; DecimalType(p, s)
      case "bit"       => if (t.startsWith("bit(1)")) BooleanType else BinaryType
      case "boolean" | "bool" => BooleanType
      case "date"      => DateType
      case "datetime" | "timestamp" => TimestampType
      case "time"      => DayTimeIntervalType() // no TIME type in Spark
      case "year"      => IntegerType
      case "char" | "varchar" | "text" | "tinytext" | "mediumtext" | "longtext" => StringType
      case "enum" | "set" | "json" => StringType
      case "binary" | "varbinary" | "blob" | "tinyblob" | "mediumblob" | "longblob" => BinaryType
      case other => StringType // unknown → lossless text
    }
  }

  /** Labels out of `enum('a','b')` / `set('x','y')` DDL type text
    * (reference parses them for the Debezium C6 conversion,
    * `kafka3.go:1110-1119,1176-1191`).
    */
  def enumSetLabels(typeText: String): Seq[String] =
    "'((?:[^']|'')*)'".r.findAllMatchIn(typeText).map(_.group(1).replace("''", "'")).toSeq
}

object SchemaRegistry {
  /** Restore a registry persisted by [[SchemaRegistry.save]]; a missing
    * file yields an empty registry (first run). `StructType.json` keeps
    * per-column metadata, so the reloaded C9 charset feed is exact.
    */
  def load(path: String): SchemaRegistry = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val reg = new SchemaRegistry
    val p = Paths.get(path)
    if (Files.exists(p)) {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(Files.readString(p))
      Option(root.get("tables")).foreach(_.elements.asScala.foreach { n =>
        val d = n.get("db").asText; val t = n.get("table").asText
        val st = DataType.fromJson(n.get("schema").asText).asInstanceOf[StructType]
        reg.put(d, t, st)
        Option(n.get("default_charset")).foreach(c => reg.tableCharsets((d, t)) = c.asText)
      })
    }
    reg
  }
}

/** Mutable per-job schema registry; thread-safe for the driver-side
  * control path (DDL is serialized by the batch barrier — K5).
  */
class SchemaRegistry {
  private val schemas = scala.collection.concurrent.TrieMap.empty[(String, String), StructType]
  // Table DEFAULT CHARSET, recorded at CREATE time so a later ALTER ADD/MODIFY
  // of a text column with no explicit CHARACTER SET inherits it (the reference
  // reads the effective charset from information_schema, which already folds
  // the table default in).
  private val tableCharsets = scala.collection.concurrent.TrieMap.empty[(String, String), String]

  def get(db: String, table: String): Option[StructType] = schemas.get((db, table))
  def put(db: String, table: String, schema: StructType): Unit = schemas((db, table)) = schema
  def drop(db: String, table: String): Unit = { schemas.remove((db, table)); tableCharsets.remove((db, table)) }
  def tables: Seq[(String, String)] = schemas.keys.toSeq
  def tableDefaultCharset(db: String, table: String): Option[String] = tableCharsets.get((db, table))

  /** Persist the registry (reference keeps table structures in its job
    * store so a restarted applier resumes without re-reading
    * information_schema mid-stream): one JSON file, written atomically
    * (tmp + move) so a crash mid-save never leaves a torn registry.
    * Driver-side control path — called at DDL barriers, not per row.
    */
  def save(path: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    val arr = root.putArray("tables")
    schemas.toSeq.sortBy(_._1).foreach { case ((d, t), st) =>
      val n = arr.addObject()
      n.put("db", d); n.put("table", t); n.put("schema", st.json)
      tableCharsets.get((d, t)).foreach(cs => n.put("default_charset", cs))
    }
    val target = Paths.get(path)
    Option(target.getParent).foreach(Files.createDirectories(_))
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, mapper.writeValueAsString(root))
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** C9 feed — the per-column charset map for a tracked table, read off
    * the StructField metadata captured from DDL text. This is what the
    * reference reads from information_schema into `Column.Charset`
    * (`mysqlconfig/types.go`); hand it straight to
    * [[graft.functions.TypeConversions.transcodeRow]].
    */
  def columnCharsets(db: String, table: String): Map[String, String] =
    get(db, table).map(_.fields.collect {
      case f if f.metadata.contains("charset") => f.name -> f.metadata.getString("charset")
    }.toMap).getOrElse(Map.empty)

  /** Apply a DDL statement to the registry. Returns true when the
    * change affects a tracked (or new) table schema — the signal to
    * re-plan dependent queries (reference invalidates prepared
    * statements and re-reads table meta at the same points).
    */
  def applyDdl(db: String, sql: String): Boolean = {
    import DdlRewriter._
    // All positional/regex parsing below runs on a literal-masked copy
    // (length-preserving, so indexes align with the original): a ')' or
    // charset-looking text inside a COMMENT literal must not steer the
    // parse — `ALTER TABLE t COMMENT 'we convert to character set x'`
    // is a comment, not a conversion.
    val masked = maskLiterals(sql)
    classify(sql) match {
      case CreateTable =>
        parseCreateTable(db, sql).exists { case ((d, t), st) =>
          put(d, t, st)
          val close = masked.lastIndexOf(')')
          // explicit DEFAULT CHARSET records; none clears — a re-CREATE
          // without a charset clause must not inherit a stale default
          // from a previously-dropped namesake
          charsetOf(masked.substring(close + 1)) match {
            case Some(cs) => tableCharsets((d, t)) = cs
            case None     => tableCharsets.remove((d, t))
          }
          true
        }
      case DropTable =>
        // A multi-table `DROP TABLE a, b, c` must untrack EVERY listed
        // table, not just the first — stale entries would feed later
        // replans and columnCharsets, and a re-CREATE of the same name
        // would silently overwrite. filterDropTables with a never-skip
        // predicate is the existing parser for the full list.
        val all = filterDropTables(sql, db, (_, _) => false)._2
        val victims = if (all.nonEmpty) all else tableOf(db, sql).toSeq
        victims.foreach { case (d, t) => drop(d, t) }
        victims.nonEmpty
      case Truncate => false // rows change, schema does not
      case AlterTable =>
        tableOf(db, sql).exists { case (d, t) =>
          val tracked = get(d, t).isDefined
          // ALTER ... DEFAULT CHARSET=x / CONVERT TO CHARACTER SET x
          // updates the recorded table default for later column adds.
          // Tracked tables only — recording for an unknown table would
          // leak a default that poisons a later bare CREATE.
          val newDefault = "(?i)(?:convert\\s+to\\s+character\\s+set|default\\s+(?:character\\s+set|charset))\\s*=?\\s*`?([A-Za-z0-9_]+)`?".r
            .findFirstMatchIn(masked).map(_.group(1).toLowerCase)
          val defaultChanged = tracked && newDefault.exists { cs =>
            val changed = !tableCharsets.get((d, t)).contains(cs)
            tableCharsets((d, t)) = cs
            changed
          }
          // CONVERT TO CHARACTER SET converts EVERY text column (MySQL
          // semantics), so the whole charset feed retags, not just the
          // default for future adds.
          val converted = "(?i)convert\\s+to\\s+character\\s+set\\s+`?([A-Za-z0-9_]+)`?".r
            .findFirstMatchIn(masked).map(_.group(1).toLowerCase).exists { cs =>
              get(d, t).exists { cur =>
                put(d, t, StructType(cur.fields.map(f =>
                  // JSON stays utf8mb4 through a table conversion — MySQL
                  // does not convert JSON column data
                  if (f.dataType == StringType &&
                      !(f.metadata.contains("json") && f.metadata.getBoolean("json")))
                    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
                      .putString("charset", cs).build())
                  else f)))
                true
              }
            }
          val altered = get(d, t) match {
            case Some(cur) =>
              alter(cur, masked, tableCharsets.get((d, t))).exists { st => put(d, t, st); true }
            case None => false
          }
          // a changed default alone is schema state too: it must reach
          // the persisted snapshot or a restart resumes the stale one
          converted || altered || defaultChanged
        }
      case DropSchema =>
        val victims = schemas.keys.filter(_._1 == schemaOf(db, sql)).toSeq
        victims.foreach { case (d, t) => drop(d, t) }
        victims.nonEmpty
      case _ => false
    }
  }

  private def schemaOf(db: String, sql: String): String = {
    val m = "(?i)(?:database|schema)\\s+(?:if\\s+(?:not\\s+)?exists\\s+)?`?([A-Za-z0-9_$]+)`?".r
      .findFirstMatchIn(sql)
    m.map(_.group(1)).getOrElse(db)
  }

  private def tableOf(db: String, sql: String): Option[(String, String)] = {
    val m = "(?i)table\\s+(?:if\\s+(?:not\\s+)?exists\\s+)?(?:`?([A-Za-z0-9_$]+)`?\\.)?`?([A-Za-z0-9_$]+)`?".r
      .findFirstMatchIn(sql)
    m.map(mm => (Option(mm.group(1)).getOrElse(db), mm.group(2)))
  }

  /** Length-preserving literal mask: every char inside a '...' or "..."
    * string literal becomes a space ('' and "" escapes handled), so
    * positional parses (paren indexes) and keyword/charset regexes can
    * run without being steered by literal content, while indexes still
    * align with the original text.
    */
  private def maskLiterals(sql: String): String = {
    val out = sql.toCharArray
    var i = 0
    var quote: Char = 0
    while (i < out.length) {
      val c = out(i)
      if (quote == 0) {
        if (c == '\'' || c == '"') quote = c
      } else {
        if (c == quote) {
          // '' / "" inside a literal is an escaped quote, stay inside
          if (i + 1 < out.length && out(i + 1) == quote) { out(i) = ' '; i += 1; out(i) = ' ' }
          else quote = 0
        } else out(i) = ' '
      }
      i += 1
    }
    new String(out)
  }

  /** `CHARACTER SET x` / `CHARSET x` out of one column's type text. */
  private def charsetOf(typeText: String): Option[String] =
    "(?i)(?:character\\s+set|charset)\\s*=?\\s*`?([A-Za-z0-9_]+)`?".r
      .findFirstMatchIn(typeText).map(_.group(1).toLowerCase)

  /** Attach the effective charset as StructField metadata on text
    * columns (reference fills `Column.Charset` from information_schema
    * the same way: column charset, else the table default). JSON maps
    * to StringType too but is ALWAYS utf8mb4 regardless of the table
    * default — tagging it would make transcodeRow mangle the
    * already-decoded document text, so it never gets a charset.
    */
  private def withCharset(f: StructField, typeText: String,
                          tableDefault: Option[String]): StructField =
    if (f.dataType != StringType) f
    else if (typeText.trim.toLowerCase.startsWith("json"))
      // marker so CONVERT TO CHARACTER SET retags skip it too
      f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
        .putBoolean("json", true).build())
    else charsetOf(typeText).orElse(tableDefault) match {
      case Some(cs) =>
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putString("charset", cs).build())
      case None => f
    }

  /** CREATE TABLE column defs → StructType via [[TypeMapper]], with
    * per-column charsets (column-level, else the table's DEFAULT
    * CHARSET) captured as field metadata for the C9 stage.
    */
  def parseCreateTable(db: String, sql: String): Option[((String, String), StructType)] = {
    // paren positions, charset scans, and NOT NULL detection all read
    // the literal-masked text: a ')' inside COMMENT 'see (notes)' or a
    // DEFAULT 'not null-ish' literal must not steer the parse. Nothing
    // below needs literal CONTENT (types, names, charsets are never
    // quoted strings), so the masked text is parsed throughout.
    val masked = maskLiterals(sql)
    val open = masked.indexOf('(')
    val close = masked.lastIndexOf(')')
    if (open < 0 || close <= open) return None
    tableOf(db, sql).map { case (d, t) =>
      val body = masked.substring(open + 1, close)
      val tableDefault = charsetOf(masked.substring(close + 1))
      val fields = splitTopLevel(body).flatMap { part =>
        val tr = part.trim
        val tok = tr.split("[\\s(]")(0).replace("`", "")
        val isConstraint = Set("primary", "unique", "key", "index", "constraint", "foreign", "check")
          .contains(tok.toLowerCase)
        if (isConstraint || tok.isEmpty) None
        else {
          // parts are top-level-comma split already, so the remainder IS
          // the full type text (inner commas like DECIMAL(10,2) intact)
          val typeText = tr.substring(tr.indexOf(tok) + tok.length).trim
          val nullable = !typeText.toLowerCase.contains("not null")
          Some(withCharset(
            StructField(tok, TypeMapper.mysqlToSpark(typeText), nullable),
            typeText, tableDefault))
        }
      }
      ((d, t), StructType(fields))
    }
  }

  /** `sql` arrives literal-masked from applyDdl. The operation is the
    * first word-bounded ADD/DROP/MODIFY/CHANGE keyword AFTER the table
    * name — a substring test (`contains("add")`) would misdispatch
    * `DROP COLUMN address` into the add branch and silently ignore it,
    * and the prefix strip keeps a table named `add`/`drop` from
    * matching as the operation.
    */
  private def alter(cur: StructType, sql: String,
                    tableDefault: Option[String]): Option[StructType] = {
    val tail = "(?is)^\\s*alter\\s+(?:ignore\\s+)?table\\s+\\S+\\s+(.*)$".r
      .findFirstMatchIn(sql).map(_.group(1)).getOrElse(sql)
    val addCol = "(?i)add\\s+(?:column\\s+)?`?([A-Za-z0-9_$]+)`?\\s+([^,]+)".r
    val dropCol = "(?i)drop\\s+(?:column\\s+)?`?([A-Za-z0-9_$]+)`?".r
    val modCol = "(?i)(?:modify|change)\\s+(?:column\\s+)?`?([A-Za-z0-9_$]+)`?\\s+(?:`?([A-Za-z0-9_$]+)`?\\s+)?([^,]+)".r
    "(?i)\\b(add|drop|modify|change)\\b".r.findFirstMatchIn(tail)
      .map(_.group(1).toLowerCase) match {
      case Some("add") =>
        addCol.findFirstMatchIn(tail).map { m =>
          StructType(cur.fields :+ withCharset(
            StructField(m.group(1), TypeMapper.mysqlToSpark(m.group(2)), nullable = true),
            m.group(2), tableDefault))
        }
      case Some("drop") =>
        dropCol.findFirstMatchIn(tail).map { m =>
          StructType(cur.fields.filterNot(_.name.equalsIgnoreCase(m.group(1))))
        }
      case Some("modify") | Some("change") =>
        modCol.findFirstMatchIn(tail).map { m =>
          val oldName = m.group(1)
          val newName = Option(m.group(2)).getOrElse(oldName)
          val newType = TypeMapper.mysqlToSpark(m.group(3))
          StructType(cur.fields.map(f =>
            if (f.name.equalsIgnoreCase(oldName))
              withCharset(StructField(newName, newType, f.nullable), m.group(3), tableDefault)
            else f))
        }
      case _ => None
    }
  }

  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inQuote = false; val cur = new StringBuilder
    s.foreach {
      case '\'' => inQuote = !inQuote; cur.append('\'')
      case '(' if !inQuote => depth += 1; cur.append('(')
      case ')' if !inQuote => depth -= 1; cur.append(')')
      case ',' if depth == 0 && !inQuote => out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) out += cur.toString
    out.result()
  }
}
