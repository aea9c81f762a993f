package graft.sources

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** S1 wire layer — the MySQL client/server protocol bytes a replica
  * speaks BEFORE the binlog stream starts, from the public protocol
  * layout (MySQL internals: Connection Phase / Replication Protocol).
  * The reference gets all of this from go-mysql's client
  * (`driver/mysql/binlog/binlog_reader.go:282-414` StartSyncGTID);
  * here it is rebuilt from scratch so the only thing missing from S1
  * in this sandbox is the TCP socket itself: handshake decode → auth
  * scramble → HandshakeResponse41 → COM_REGISTER_SLAVE →
  * COM_BINLOG_DUMP_GTID → per-packet event stream into
  * [[BinlogParser]].
  *
  * Everything is pure bytes-in/bytes-out and deterministic, so the
  * whole phase is unit-testable without a server.
  */
object MysqlWire {

  // capability flags (public protocol constants)
  val CLIENT_LONG_PASSWORD = 0x00000001L
  val CLIENT_PROTOCOL_41 = 0x00000200L
  val CLIENT_PLUGIN_AUTH = 0x00080000L
  val CLIENT_SECURE_CONNECTION = 0x00008000L
  val CLIENT_CONNECT_WITH_DB = 0x00000008L

  // command bytes
  val COM_QUERY = 0x03
  val COM_REGISTER_SLAVE = 0x15
  val COM_BINLOG_DUMP_GTID = 0x1e

  /** The protocol's single-packet payload ceiling: a 3-byte length
    * field caps one packet at 0xFFFFFF bytes; larger logical payloads
    * split into consecutive max-length packets closed by a final
    * short (possibly EMPTY) packet.
    */
  val MaxPacketPayload: Int = 0xFFFFFF

  /** MySQL packet framing: 3-byte little-endian length + sequence id,
    * for payloads UNDER the 16 MiB − 1 single-packet ceiling. Larger
    * payloads must go through [[framePayload]] — writing an oversized
    * length into 3 bytes would silently corrupt the stream, so this
    * form now refuses it.
    */
  def framePacket(payload: Array[Byte], seq: Int): Array[Byte] = {
    require(payload.length < MaxPacketPayload,
      s"framePacket: payload ${payload.length} ≥ 0xFFFFFF — use framePayload (multi-packet)")
    val out = new Array[Byte](payload.length + 4)
    out(0) = (payload.length & 0xff).toByte
    out(1) = ((payload.length >> 8) & 0xff).toByte
    out(2) = ((payload.length >> 16) & 0xff).toByte
    out(3) = (seq & 0xff).toByte
    System.arraycopy(payload, 0, out, 4, payload.length)
    out
  }

  /** Frame ONE logical payload of ANY size (the protocol multi-packet
    * rule, MySQL internals "Sending More Than 16Mb"): each 0xFFFFFF
    * chunk is its own packet with an incrementing sequence id, and a
    * run of max-length packets is closed by a final short packet —
    * an EMPTY one when the payload is an exact multiple of 0xFFFFFF
    * (the receiver needs the terminator to know the payload ended).
    */
  def framePayload(payload: Array[Byte], startSeq: Int): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream(payload.length + 16)
    var off = 0; var seq = startSeq
    while (payload.length - off >= MaxPacketPayload) {
      bb.write(Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, (seq & 0xff).toByte))
      bb.write(payload, off, MaxPacketPayload)
      off += MaxPacketPayload; seq += 1
    }
    bb.write(framePacket(java.util.Arrays.copyOfRange(payload, off, payload.length), seq))
    bb.toByteArray
  }

  /** Reassemble [[splitPackets]] frames into LOGICAL payloads: a run
    * of max-length packets concatenates with its (possibly empty)
    * terminator; sequence ids must be consecutive within a run.
    */
  def assemblePayloads(frames: Seq[(Int, Array[Byte])]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    val cur = new java.io.ByteArrayOutputStream()
    var expectSeq = -1
    frames.foreach { case (seq, p) =>
      if (cur.size() > 0) {
        require(seq == expectSeq,
          s"assemblePayloads: continuation seq $seq, expected $expectSeq")
      }
      cur.write(p, 0, p.length)
      if (p.length == MaxPacketPayload) expectSeq = (seq + 1) & 0xff
      else { out += cur.toByteArray; cur.reset(); expectSeq = -1 }
    }
    require(cur.size() == 0, "assemblePayloads: stream ends inside a multi-packet payload")
    out.result()
  }

  /** Split a byte stream into (seq, payload) frames. */
  def splitPackets(bytes: Array[Byte]): Seq[(Int, Array[Byte])] = {
    val out = Seq.newBuilder[(Int, Array[Byte])]
    var pos = 0
    while (pos < bytes.length) {
      require(bytes.length - pos >= 4, s"truncated packet header at $pos")
      val len = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) | ((bytes(pos + 2) & 0xff) << 16)
      val seq = bytes(pos + 3) & 0xff
      require(pos + 4 + len <= bytes.length, s"truncated packet body at $pos (len=$len)")
      out += ((seq, java.util.Arrays.copyOfRange(bytes, pos + 4, pos + 4 + len)))
      pos += 4 + len
    }
    out.result()
  }

  /** Decoded HandshakeV10 (the server greeting). */
  final case class Handshake(serverVersion: String, threadId: Long,
                             scramble: Array[Byte], capabilities: Long,
                             charset: Int, authPlugin: String)

  def parseHandshake(payload: Array[Byte]): Handshake = {
    val r = new BinlogParser.Reader(payload, 0)
    val proto = r.u8()
    require(proto == 10, s"unsupported handshake protocol $proto")
    val sb = new StringBuilder
    while (r.peekU8() != 0) sb.append(r.u8().toChar)
    r.skip(1)
    val serverVersion = sb.toString
    val threadId = r.u32()
    val auth1 = r.bytes(8)
    r.skip(1) // filler
    val capLow = r.u16().toLong
    val charset = r.u8()
    r.skip(2) // status flags
    val capHigh = r.u16().toLong
    val capabilities = capLow | (capHigh << 16)
    val authLen = r.u8()
    r.skip(10) // reserved
    // auth-plugin-data part 2: max(13, authLen - 8), NUL-padded; the
    // usable scramble is 20 bytes total
    val auth2 =
      if ((capabilities & CLIENT_SECURE_CONNECTION) != 0) r.bytes(math.max(13, authLen - 8))
      else Array.emptyByteArray
    val plugin =
      if ((capabilities & CLIENT_PLUGIN_AUTH) != 0) {
        val p = new StringBuilder
        while (r.remaining > 0 && r.peekU8() != 0) p.append(r.u8().toChar)
        p.toString
      } else ""
    val scramble = (auth1 ++ auth2).take(20)
    Handshake(serverVersion, threadId, scramble, capabilities, charset, plugin)
  }

  /** mysql_native_password scramble:
    * `SHA1(password) XOR SHA1(nonce + SHA1(SHA1(password)))`.
    */
  def nativePasswordAuth(password: String, nonce: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    val sha1 = MessageDigest.getInstance("SHA-1")
    val p1 = sha1.digest(password.getBytes(StandardCharsets.UTF_8))
    val p2 = sha1.digest(p1)
    sha1.update(nonce)
    sha1.update(p2)
    val mix = sha1.digest()
    xor(p1, mix)
  }

  /** caching_sha2_password fast-path scramble:
    * `SHA256(password) XOR SHA256(SHA256(SHA256(password)) + nonce)`.
    */
  def cachingSha2Auth(password: String, nonce: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    val sha = MessageDigest.getInstance("SHA-256")
    val p1 = sha.digest(password.getBytes(StandardCharsets.UTF_8))
    val p2 = sha.digest(sha.digest(p1))
    sha.update(p2)
    sha.update(nonce)
    xor(p1, sha.digest())
  }

  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.indices.map(i => (a(i) ^ b(i)).toByte).toArray

  /** HandshakeResponse41: the client login packet. */
  def handshakeResponse(user: String, authResponse: Array[Byte],
                        database: String, authPlugin: String,
                        charset: Int = 45 /* utf8mb4_general_ci */): Array[Byte] = {
    val caps = CLIENT_LONG_PASSWORD | CLIENT_PROTOCOL_41 | CLIENT_PLUGIN_AUTH |
      CLIENT_SECURE_CONNECTION | (if (database.nonEmpty) CLIENT_CONNECT_WITH_DB else 0L)
    val w = new WireWriter
    w.u32(caps)
    w.u32(0xffffff) // max packet
    w.u8(charset)
    w.zeros(23)
    w.strNul(user)
    w.u8(authResponse.length) // length-encoded (fits one byte for SHA1/256)
    w.raw(authResponse)
    if (database.nonEmpty) w.strNul(database)
    w.strNul(authPlugin)
    w.result
  }

  /** COM_QUERY — plain text statement. */
  def comQuery(sql: String): Array[Byte] =
    COM_QUERY.toByte +: sql.getBytes(StandardCharsets.UTF_8)

  /** The session-setup statements a replica issues after login and
    * before COM_REGISTER_SLAVE (same sequence the reference's client
    * library performs): adopt the server's checksum mode, announce the
    * replica uuid, and ask for heartbeats so silence is distinguishable
    * from a dead link.
    */
  def replicaSetupQueries(slaveUuid: String, heartbeatNanos: Long = 30_000_000_000L): Seq[Array[Byte]] = Seq(
    comQuery("SET @master_binlog_checksum = @@global.binlog_checksum"),
    comQuery(s"SET @slave_uuid = '$slaveUuid'"),
    comQuery(s"SET @master_heartbeat_period = $heartbeatNanos"))

  /** COM_REGISTER_SLAVE — announces this client as a replica
    * (reference sends it before the dump command; hostname/user/port
    * are advisory and may be empty).
    */
  def registerSlave(serverId: Long, hostname: String = "", user: String = "",
                    port: Int = 0): Array[Byte] = {
    val w = new WireWriter
    w.u8(COM_REGISTER_SLAVE)
    w.u32(serverId)
    w.u8(hostname.length); w.str(hostname)
    w.u8(user.length); w.str(user)
    w.u8(0) // password (never sent)
    w.u16(port)
    w.u32(0) // replication rank (unused)
    w.u32(0) // master id (0 = let server fill)
    w.result
  }

  /** COM_BINLOG_DUMP_GTID — requests the GTID-based stream the
    * reference uses (`StartSyncGTID`). `gtids` is the executed set the
    * replica already has, per source UUID, encoded in the binary
    * SID-block layout the protocol defines: n_sids, then for each
    * (16-byte sid, n_intervals, [start, end) pairs — end exclusive =
    * hi + 1 of the inclusive interval form [[graft.functions.IntervalSet]]
    * uses).
    */
  def binlogDumpGtid(serverId: Long,
                     gtids: Seq[(String, Seq[(Long, Long)])]): Array[Byte] = {
    val sidBlock = {
      val w = new WireWriter
      w.u64(gtids.length.toLong)
      gtids.foreach { case (uuid, intervals) =>
        w.raw(uuidBytes(uuid))
        w.u64(intervals.length.toLong)
        intervals.foreach { case (lo, hi) => w.u64(lo); w.u64(hi + 1) }
      }
      w.result
    }
    val w = new WireWriter
    w.u8(COM_BINLOG_DUMP_GTID)
    w.u16(0) // flags
    w.u32(serverId)
    w.u32(4) // binlog-filename length (empty name + 4-byte pos contract)
    w.str("") // empty filename = start from GTID set
    w.u64(4L) // binlog position 4 = first event after magic
    w.u32(sidBlock.length.toLong)
    w.raw(sidBlock)
    w.result
  }

  private def uuidBytes(uuid: String): Array[Byte] = {
    val hex = uuid.replace("-", "")
    require(hex.length == 32, s"bad source uuid $uuid")
    Array.tabulate(16)(i => Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte)
  }

  /** Classify a post-command packet from the stream: 0x00 = one binlog
    * event follows (strip the OK byte and re-frame via the event
    * header), 0xff = ERR (code + sql-state + message), 0xfe = EOF.
    */
  sealed trait StreamPacket
  final case class EventPacket(eventBytes: Array[Byte]) extends StreamPacket
  final case class ErrPacket(code: Int, sqlState: String, message: String) extends StreamPacket
  case object EofPacket extends StreamPacket

  def classifyStreamPacket(payload: Array[Byte]): StreamPacket =
    (payload(0) & 0xff) match {
      case 0x00 => EventPacket(java.util.Arrays.copyOfRange(payload, 1, payload.length))
      case 0xfe => EofPacket
      case 0xff =>
        val code = (payload(1) & 0xff) | ((payload(2) & 0xff) << 8)
        // '#' marker + 5-char sql state (CLIENT_PROTOCOL_41 form)
        val (state, msgFrom) =
          if (payload.length > 3 && payload(3) == '#')
            (new String(payload, 4, 5, StandardCharsets.UTF_8), 9)
          else ("", 3)
        ErrPacket(code, state, new String(payload, msgFrom, payload.length - msgFrom,
          StandardCharsets.UTF_8))
      case other => throw new IllegalArgumentException(
        f"unexpected stream packet header 0x$other%02x")
    }

  /** Decode the event bytes of one [[EventPacket]] into a
    * [[BinlogParser.RawEvent]] — the wire form has no file magic and no
    * per-file FDE ordering guarantee beyond the server sending one
    * first, so checksum stripping is governed by the caller-tracked
    * FDE (`checksummed`).
    */
  def parseWireEvent(eventBytes: Array[Byte], checksummed: Boolean): BinlogParser.RawEvent = {
    val r = new BinlogParser.Reader(eventBytes, 0)
    val ts = r.u32()
    val typeCode = r.u8()
    val serverId = r.u32()
    val eventSize = r.u32().toInt
    val logPos = r.u32()
    val flags = r.u16()
    require(eventSize == eventBytes.length, s"event size $eventSize != ${eventBytes.length}")
    val bodyEnd =
      if (checksummed && typeCode != BinlogParser.FORMAT_DESCRIPTION_EVENT) eventBytes.length - 4
      else eventBytes.length
    var body = java.util.Arrays.copyOfRange(eventBytes, 19, bodyEnd)
    if (typeCode == BinlogParser.FORMAT_DESCRIPTION_EVENT) {
      val alg = body.length >= 5 && body(body.length - 5) == 1
      if (alg) body = java.util.Arrays.copyOfRange(body, 0, body.length - 4)
    }
    BinlogParser.RawEvent(typeCode, ts, serverId, logPos, flags, body)
  }

  private final class WireWriter {
    private val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def u8(v: Int): Unit = b += (v & 0xff).toByte
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit = { u16(v.toInt); u16((v >> 16).toInt) }
    def u64(v: Long): Unit = { u32(v); u32(v >>> 32) }
    def raw(bs: Array[Byte]): Unit = b ++= bs
    def str(s: String): Unit = raw(s.getBytes(StandardCharsets.UTF_8))
    def strNul(s: String): Unit = { str(s); u8(0) }
    def zeros(n: Int): Unit = (0 until n).foreach(_ => u8(0))
    def result: Array[Byte] = b.toArray
  }
}
