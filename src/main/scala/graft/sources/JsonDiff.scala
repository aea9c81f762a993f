package graft.sources

import java.nio.charset.StandardCharsets
import JsonBinary.{Jv, VArr, VObj}

/** MySQL 8 partial-JSON update diffs (`binlog_row_value_options =
  * PARTIAL_JSON`): instead of the full after-image JSONB, a
  * PARTIAL_UPDATE_ROWS_EVENT carries a sequence of (operation, path,
  * value) patches against the before-image document — public layout
  * `sql/json_diff.cc` (`Json_diff_vector::read_binary`): per diff one
  * operation byte (0 REPLACE, 1 INSERT, 2 REMOVE), a length-encoded
  * path string (`$.member."quoted member"[index]`), and for
  * REPLACE/INSERT a length-encoded full JSONB value (type byte +
  * payload). The reference's go-mysql layer surfaces these raw; a
  * replication source must apply them to reconstruct the row.
  *
  * Apply semantics mirror the server's `apply_json_diff`:
  * REPLACE requires the path to exist; INSERT adds a new object member
  * (must not exist) or splices an array element at the index (past-end
  * appends); REMOVE requires the path to exist. Object members insert
  * at their MySQL storage position — keys sorted by (length, bytes) —
  * so the re-rendered text matches what a full after-image of the same
  * document would have decoded to. Any path miss fails loudly: a
  * silently dropped patch is a silently wrong replica.
  */
object JsonDiff {

  val Replace = 0
  val Insert = 1
  val Remove = 2

  final case class Diff(op: Int, path: String, value: Option[Jv])

  /** Parse the diff sequence of one partial column value. An empty
    * payload is a valid "column unchanged" marker (the server logs it
    * when an UPDATE touched other columns only).
    */
  def readDiffs(payload: Array[Byte]): Seq[Diff] = {
    val r = new BinlogParser.Reader(payload, 0)
    val out = Seq.newBuilder[Diff]
    while (r.remaining > 0) {
      val op = r.u8()
      require(op <= Remove, s"bad JSON diff operation $op")
      val path = new String(r.bytes(r.lenenc().toInt), StandardCharsets.UTF_8)
      val value =
        if (op == Remove) None
        else Some(JsonBinary.decodeTree(r.bytes(r.lenenc().toInt)))
      out += Diff(op, path, value)
    }
    out.result()
  }

  /** One leg of a JSON path: an object member name or an array index. */
  type Leg = Either[String, Int]

  /** `$`, then `.name` / `."quoted name"` / `[N]` legs (the only forms
    * the server emits in diffs — no wildcards or ranges in write
    * paths).
    */
  def parsePath(path: String): List[Leg] = {
    require(path.nonEmpty && path.charAt(0) == '$', s"JSON path must start with $$: $path")
    var i = 1
    val legs = List.newBuilder[Leg]
    while (i < path.length) {
      path.charAt(i) match {
        case '.' =>
          i += 1
          if (i < path.length && path.charAt(i) == '"') {
            // quoted members use JSON string escaping — decode the full
            // escape set, not just \" and \\ (a key like "a\nb" must
            // resolve to the member with a real newline)
            val sb = new java.lang.StringBuilder
            i += 1
            while (path.charAt(i) != '"') {
              if (path.charAt(i) == '\\') {
                i += 1
                path.charAt(i) match {
                  case 'n' => sb.append('\n')
                  case 't' => sb.append('\t')
                  case 'r' => sb.append('\r')
                  case 'b' => sb.append('\b')
                  case 'f' => sb.append('\f')
                  case '/' => sb.append('/')
                  case 'u' =>
                    sb.append(Integer.parseInt(path.substring(i + 1, i + 5), 16).toChar)
                    i += 4
                  case other => sb.append(other) // \" and \\ and anything literal
                }
              } else sb.append(path.charAt(i))
              i += 1
            }
            i += 1
            legs += Left(sb.toString)
          } else {
            val start = i
            while (i < path.length && path.charAt(i) != '.' && path.charAt(i) != '[') i += 1
            require(i > start, s"empty member name in path $path")
            legs += Left(path.substring(start, i))
          }
        case '[' =>
          val end = path.indexOf(']', i)
          require(end > i + 1, s"bad array leg in path $path")
          legs += Right(path.substring(i + 1, end).trim.toInt)
          i = end + 1
        case other =>
          throw new IllegalArgumentException(s"bad JSON path char '$other' in $path")
      }
    }
    legs.result()
  }

  def applyDiffs(doc: Jv, diffs: Seq[Diff]): Jv =
    diffs.foldLeft(doc)((d, diff) => applyOne(d, diff))

  private def applyOne(doc: Jv, diff: Diff): Jv = parsePath(diff.path) match {
    case Nil =>
      require(diff.op == Replace, s"only REPLACE may target the root: $diff")
      diff.value.get
    case legs => modify(doc, legs, diff)
  }

  /** MySQL's canonical object-member order: key length first, then
    * byte order — where an inserted member lands in storage, hence in
    * the rendered text.
    */
  private def insertPos(fields: Vector[(String, Jv)], key: String): Int = {
    val kb = key.getBytes(StandardCharsets.UTF_8)
    def less(a: Array[Byte], b: Array[Byte]): Boolean =
      if (a.length != b.length) a.length < b.length
      else java.util.Arrays.compareUnsigned(a, b) < 0
    var i = 0
    while (i < fields.length &&
      less(fields(i)._1.getBytes(StandardCharsets.UTF_8), kb)) i += 1
    i
  }

  private def modify(node: Jv, legs: List[Leg], diff: Diff): Jv = (legs, node) match {
    case (Left(key) :: Nil, VObj(fields)) =>
      val at = fields.indexWhere(_._1 == key)
      diff.op match {
        case Replace =>
          require(at >= 0, s"REPLACE path miss at member '$key' (${diff.path})")
          VObj(fields.updated(at, (key, diff.value.get)))
        case Insert =>
          require(at < 0, s"INSERT over existing member '$key' (${diff.path})")
          val p = insertPos(fields, key)
          VObj((fields.take(p) :+ (key -> diff.value.get)) ++ fields.drop(p))
        case Remove =>
          require(at >= 0, s"REMOVE path miss at member '$key' (${diff.path})")
          VObj(fields.patch(at, Nil, 1))
      }
    case (Right(idx) :: Nil, VArr(items)) =>
      diff.op match {
        case Replace =>
          require(idx >= 0 && idx < items.length, s"REPLACE index $idx out of range (${diff.path})")
          VArr(items.updated(idx, diff.value.get))
        case Insert =>
          require(idx >= 0, s"negative INSERT index (${diff.path})")
          val p = math.min(idx, items.length) // past-end inserts append
          VArr((items.take(p) :+ diff.value.get) ++ items.drop(p))
        case Remove =>
          require(idx >= 0 && idx < items.length, s"REMOVE index $idx out of range (${diff.path})")
          VArr(items.patch(idx, Nil, 1))
      }
    case (Left(key) :: rest, VObj(fields)) =>
      val at = fields.indexWhere(_._1 == key)
      require(at >= 0, s"path miss at member '$key' (${diff.path})")
      VObj(fields.updated(at, (key, modify(fields(at)._2, rest, diff))))
    case (Right(idx) :: rest, VArr(items)) =>
      require(idx >= 0 && idx < items.length, s"path index $idx out of range (${diff.path})")
      VArr(items.updated(idx, modify(items(idx), rest, diff)))
    case (leg :: _, other) =>
      throw new IllegalArgumentException(
        s"path leg $leg does not match node shape ${other.getClass.getSimpleName} (${diff.path})")
    case (Nil, _) =>
      throw new IllegalStateException("unreachable: empty legs handled at applyOne")
  }
}
