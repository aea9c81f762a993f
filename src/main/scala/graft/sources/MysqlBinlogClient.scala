package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.net.{InetSocketAddress, Socket}

/** S1's socket loop: drives the [[MysqlWire]] byte layer over a real
  * TCP connection — connect → HandshakeV10 → auth scramble →
  * HandshakeResponse41 → replica session setup → COM_REGISTER_SLAVE →
  * COM_BINLOG_DUMP_GTID → OK-wrapped event packets into
  * [[BinlogParser.RawEvent]]s. This is the loop the reference runs in
  * `driver/mysql/binlog/binlog_reader.go:282-414,959-1036` (via
  * go-mysql's client); here it is rebuilt on `java.net.Socket` so the
  * whole replica dialogue — including ≥16 MiB multi-packet events —
  * runs over a live connection (MysqlLoopbackSpec drives it against an
  * in-JVM server speaking the public protocol).
  *
  * Scale note: one replica connection is inherently a single reader —
  * the parallelism lives downstream (events land in the CdcFileSource
  * frame and fan out through the streaming pipeline), so this loop
  * stays a thin, allocation-light pump.
  */
object MysqlBinlogClient {

  final case class Config(host: String, port: Int, user: String, password: String,
                          serverId: Long, slaveUuid: String,
                          gtids: Seq[(String, Seq[(Long, Long)])] = Nil,
                          connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 60000)

  /** Read exactly n bytes or fail — a short read mid-packet is a torn
    * connection, never a valid protocol state.
    */
  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val k = in.read(buf, off, n - off)
      if (k < 0) throw new EOFException(s"connection closed mid-packet ($off/$n bytes)")
      off += k
    }
    buf
  }

  /** One wire frame: (sequence id, payload). */
  private def readFrame(in: InputStream): (Int, Array[Byte]) = {
    val h = readFully(in, 4)
    val len = (h(0) & 0xff) | ((h(1) & 0xff) << 8) | ((h(2) & 0xff) << 16)
    (h(3) & 0xff, readFully(in, len))
  }

  /** One LOGICAL payload: a run of max-length frames concatenates with
    * its (possibly empty) terminator — the incremental form of
    * [[MysqlWire.assemblePayloads]], reading only as many frames as
    * this payload spans.
    */
  private[sources] def readPayload(in: InputStream): Array[Byte] = {
    val (seq0, first) = readFrame(in)
    if (first.length < MysqlWire.MaxPacketPayload) first
    else {
      val out = new java.io.ByteArrayOutputStream(first.length * 2)
      out.write(first, 0, first.length)
      var last = first
      var expect = (seq0 + 1) & 0xff // every continuation checked, incl. the first
      while (last.length == MysqlWire.MaxPacketPayload) {
        val (seq, p) = readFrame(in)
        require(seq == expect, s"continuation seq $seq, expected $expect")
        expect = (seq + 1) & 0xff
        out.write(p, 0, p.length)
        last = p
      }
      out.toByteArray
    }
  }

  private def send(out: OutputStream, payload: Array[Byte], seq: Int): Unit = {
    out.write(MysqlWire.framePayload(payload, seq))
    out.flush()
  }

  /** Connection-phase reply walk: OK / ERR / auth-switch (0xfe) /
    * auth-more-data (0x01). The fast paths of both supported plugins
    * terminate in a plain OK; caching_sha2's FULL exchange (server asks
    * 0x01 0x04) needs TLS or the server RSA key and is refused loudly.
    */
  private def completeAuth(in: InputStream, out: OutputStream, password: String,
                           seqStart: Int): Unit = {
    var seq = seqStart
    var done = false
    var switches = 0
    while (!done) {
      val p = readPayload(in)
      (p(0) & 0xff) match {
        case 0x00 => done = true // OK
        case 0xff =>
          val e = MysqlWire.classifyStreamPacket(p).asInstanceOf[MysqlWire.ErrPacket]
          throw new IllegalStateException(s"auth failed: ${e.code} ${e.sqlState} ${e.message}")
        case 0xfe => // AuthSwitchRequest: plugin NUL name + fresh nonce
          // real servers send at most ONE switch; an unbounded loop here
          // would let a broken/malicious server spin the client forever
          switches += 1
          require(switches <= 2, s"auth switch requested $switches times — giving up")
          var i = 1
          while (i < p.length && p(i) != 0) i += 1
          val plugin = new String(p, 1, i - 1, java.nio.charset.StandardCharsets.UTF_8)
          // nonce is the rest, minus a trailing NUL if present
          val end = if (p.length > i + 1 && p(p.length - 1) == 0) p.length - 1 else p.length
          val nonce = java.util.Arrays.copyOfRange(p, i + 1, end)
          val resp = plugin match {
            case "mysql_native_password" => MysqlWire.nativePasswordAuth(password, nonce)
            case "caching_sha2_password" => MysqlWire.cachingSha2Auth(password, nonce)
            case other => throw new UnsupportedOperationException(s"auth plugin $other")
          }
          seq += 2 // server reply consumed one seq; our answer takes the next
          send(out, resp, seq)
        case 0x01 => // AuthMoreData
          if (p.length >= 2 && (p(1) & 0xff) == 0x03) () // fast-auth success; OK follows
          else throw new UnsupportedOperationException(
            "caching_sha2_password full authentication needs TLS/RSA — use the fast path or mysql_native_password")
        case other => throw new IllegalStateException(f"unexpected auth reply 0x$other%02x")
      }
    }
  }

  /** Issue one command (sequence restarts at 0 per the protocol) and
    * require a plain OK reply.
    */
  private def commandOk(in: InputStream, out: OutputStream, payload: Array[Byte]): Unit = {
    send(out, payload, 0)
    val p = readPayload(in)
    (p(0) & 0xff) match {
      case 0x00 => ()
      case 0xff =>
        val e = MysqlWire.classifyStreamPacket(p).asInstanceOf[MysqlWire.ErrPacket]
        throw new IllegalStateException(s"command failed: ${e.code} ${e.sqlState} ${e.message}")
      case other => throw new IllegalStateException(f"unexpected command reply 0x$other%02x")
    }
  }

  /** Connect, authenticate, register, start the GTID dump, and pump
    * events into `onEvent` until it returns false, the server sends
    * EOF, or the connection closes. Wire CRCs are verified once the
    * FDE announces CRC32 — same trust boundary as the file reader.
    */
  def stream(cfg: Config)(onEvent: BinlogParser.RawEvent => Boolean): Unit =
    streamRaw(cfg)((ev, _) => onEvent(ev))

  /** [[stream]] plus the UNPARSED wire bytes of each event — the wire
    * form (header + body + CRC) is byte-identical to the binlog FILE
    * event layout, so a relay ([[BinlogRelay]], S10) appends these
    * bytes verbatim and the file replays through
    * [[BinlogParser.readBinlogFile]] with CRC verification on.
    */
  def streamRaw(cfg: Config)(onEvent: (BinlogParser.RawEvent, Array[Byte]) => Boolean): Unit = {
    val sock = new Socket()
    sock.connect(new InetSocketAddress(cfg.host, cfg.port), cfg.connectTimeoutMs)
    sock.setSoTimeout(cfg.readTimeoutMs)
    sock.setTcpNoDelay(true)
    try {
      val in = new BufferedInputStream(sock.getInputStream, 1 << 16)
      val out = new BufferedOutputStream(sock.getOutputStream, 1 << 16)
      val hs = MysqlWire.parseHandshake(readPayload(in))
      val auth = hs.authPlugin match {
        case "" | "mysql_native_password" => MysqlWire.nativePasswordAuth(cfg.password, hs.scramble)
        case "caching_sha2_password" => MysqlWire.cachingSha2Auth(cfg.password, hs.scramble)
        case other => throw new UnsupportedOperationException(s"auth plugin $other")
      }
      send(out, MysqlWire.handshakeResponse(cfg.user, auth, "",
        if (hs.authPlugin.isEmpty) "mysql_native_password" else hs.authPlugin), 1)
      completeAuth(in, out, cfg.password, seqStart = 1)
      MysqlWire.replicaSetupQueries(cfg.slaveUuid).foreach(q => commandOk(in, out, q))
      commandOk(in, out, MysqlWire.registerSlave(cfg.serverId))
      send(out, MysqlWire.binlogDumpGtid(cfg.serverId, cfg.gtids), 0)
      var checksummed = false
      var go = true
      while (go) {
        val payload =
          try readPayload(in)
          catch { case _: EOFException => null } // server closed: stream over
        if (payload == null) go = false
        else MysqlWire.classifyStreamPacket(payload) match {
          case MysqlWire.EventPacket(bytes) =>
            if (checksummed) {
              val crc = new java.util.zip.CRC32()
              crc.update(bytes, 0, bytes.length - 4)
              val want = (bytes(bytes.length - 4) & 0xffL) |
                ((bytes(bytes.length - 3) & 0xffL) << 8) |
                ((bytes(bytes.length - 2) & 0xffL) << 16) |
                ((bytes(bytes.length - 1) & 0xffL) << 24)
              require(crc.getValue == want,
                f"wire event CRC mismatch: got ${crc.getValue}%08x want $want%08x")
            }
            val ev = MysqlWire.parseWireEvent(bytes, checksummed)
            if (ev.typeCode == BinlogParser.FORMAT_DESCRIPTION_EVENT)
              // FDE body ends with its checksum-alg byte (1 = CRC32)
              checksummed = ev.body.nonEmpty && ev.body.last == 1
            go = onEvent(ev, bytes)
          case MysqlWire.EofPacket => go = false
          case e: MysqlWire.ErrPacket =>
            throw new IllegalStateException(s"dump stream error: ${e.code} ${e.sqlState} ${e.message}")
        }
      }
    } finally sock.close()
  }
}
