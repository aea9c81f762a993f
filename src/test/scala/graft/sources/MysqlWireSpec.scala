package graft.sources

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** S1 wire layer: packet framing, handshake decode, auth scrambles
  * (known-answer vectors computed with an independent implementation),
  * replica-registration and dump-command encodings, and the
  * packet→event bridge into [[BinlogParser]].
  */
class MysqlWireSpec extends AnyFunSuite {
  import MysqlWire._

  private def w8(xs: Int*): Array[Byte] = xs.map(x => (x & 0xff).toByte).toArray
  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("packet framing round-trips, rejects truncation") {
    val p1 = "hello".getBytes(StandardCharsets.UTF_8)
    val p2 = Array.fill[Byte](300)(7)
    val stream = framePacket(p1, 0) ++ framePacket(p2, 1)
    val got = splitPackets(stream)
    assert(got.map(_._1) == Seq(0, 1))
    assert(got(0)._2.sameElements(p1) && got(1)._2.sameElements(p2))
    intercept[IllegalArgumentException](splitPackets(stream.dropRight(1)))
  }

  test("multi-packet framing: 16 MiB+ payloads split, reassemble, terminate") {
    // a payload over the 0xFFFFFF single-packet ceiling (exotic configs:
    // huge auth-more-data / COM_QUERY bodies)
    val big = Array.tabulate(MysqlWire.MaxPacketPayload + 1000)(i => (i * 31 + 7).toByte)
    val stream = MysqlWire.framePayload(big, startSeq = 2)
    val frames = MysqlWire.splitPackets(stream)
    assert(frames.map(_._2.length) == Seq(MysqlWire.MaxPacketPayload, 1000))
    assert(frames.map(_._1) == Seq(2, 3)) // consecutive sequence ids
    val back = MysqlWire.assemblePayloads(frames)
    assert(back.length == 1 && java.util.Arrays.equals(back.head, big))
    // exact-multiple payload needs the EMPTY terminator packet
    val exact = Array.fill(MysqlWire.MaxPacketPayload)(0x5a.toByte)
    val exactFrames = MysqlWire.splitPackets(MysqlWire.framePayload(exact, 0))
    assert(exactFrames.map(_._2.length) == Seq(MysqlWire.MaxPacketPayload, 0))
    assert(java.util.Arrays.equals(
      MysqlWire.assemblePayloads(exactFrames).head, exact))
    // small payloads stay single-packet; adjacent ones reassemble 1:1
    val small = MysqlWire.splitPackets(
      MysqlWire.framePayload(Array[Byte](1, 2), 0) ++ MysqlWire.framePayload(Array[Byte](3), 0))
    assert(MysqlWire.assemblePayloads(small).map(_.toSeq) == Seq(Seq(1, 2), Seq(3)))
    // framePacket itself now refuses oversize instead of corrupting
    intercept[IllegalArgumentException](MysqlWire.framePacket(exact, 0))
    // a stream ending mid-payload fails loudly
    intercept[IllegalArgumentException](
      MysqlWire.assemblePayloads(MysqlWire.splitPackets(
        java.util.Arrays.copyOfRange(stream, 0, 4 + MysqlWire.MaxPacketPayload))))
  }

  test("HandshakeV10 decode: version, 20-byte scramble assembly, plugin") {
    val nonce = Array.tabulate[Byte](20)(i => (i + 1).toByte)
    val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
    b += 10 // protocol
    b ++= "8.0.36".getBytes(StandardCharsets.UTF_8); b += 0 // NUL-terminated
    b ++= w8(0x39, 0x05, 0, 0) // thread id 1337
    b ++= nonce.take(8); b += 0 // auth part 1 + filler
    val caps = CLIENT_PROTOCOL_41 | CLIENT_PLUGIN_AUTH | CLIENT_SECURE_CONNECTION
    b ++= w8((caps & 0xff).toInt, ((caps >> 8) & 0xff).toInt) // cap low
    b += 45 // charset
    b ++= w8(2, 0) // status
    b ++= w8(((caps >> 16) & 0xff).toInt, ((caps >> 24) & 0xff).toInt) // cap high
    b += 21 // auth data len
    b ++= Array.fill[Byte](10)(0) // reserved
    b ++= nonce.drop(8); b += 0 // auth part 2 (12 + NUL = 13)
    b ++= "mysql_native_password".getBytes(StandardCharsets.UTF_8); b += 0
    val h = parseHandshake(b.toArray)
    assert(h.serverVersion == "8.0.36")
    assert(h.threadId == 1337L)
    assert(h.scramble.sameElements(nonce))
    assert(h.authPlugin == "mysql_native_password")
    assert((h.capabilities & CLIENT_PLUGIN_AUTH) != 0)
    assert(h.charset == 45)
  }

  test("auth scrambles match independently-computed known-answer vectors") {
    val nonce = Array.tabulate[Byte](20)(i => (i + 1).toByte)
    // vectors computed with an independent implementation (hashlib)
    assert(nativePasswordAuth("s3cret!", nonce).sameElements(
      hex("45bb89c249ad6274b259e62ffa1217f1b20faf2d")))
    assert(cachingSha2Auth("s3cret!", nonce).sameElements(
      hex("ba20e2ef95a81ddd49f48a3fbfeab4fcb7b3d4e716eb5b0212d64b54b8a0b933")))
    assert(nativePasswordAuth("", nonce).isEmpty) // empty password = empty response
  }

  test("HandshakeResponse41 field layout") {
    val auth = hex("45bb89c249ad6274b259e62ffa1217f1b20faf2d")
    val p = handshakeResponse("repl", auth, "shop", "mysql_native_password")
    val r = new BinlogParser.Reader(p, 0)
    val caps = r.u32()
    assert((caps & CLIENT_PROTOCOL_41) != 0 && (caps & CLIENT_CONNECT_WITH_DB) != 0)
    assert(r.u32() == 0xffffff) // max packet
    assert(r.u8() == 45) // charset
    r.skip(23)
    def ntStr(): String = {
      val sb = new StringBuilder
      while (r.peekU8() != 0) sb.append(r.u8().toChar)
      r.skip(1); sb.toString
    }
    assert(ntStr() == "repl")
    val alen = r.u8()
    assert(r.bytes(alen).sameElements(auth))
    assert(ntStr() == "shop")
    assert(ntStr() == "mysql_native_password")
    assert(r.remaining == 0)
  }

  test("replica setup sequence is COM_QUERY statements in protocol order") {
    val qs = replicaSetupQueries("ab" * 16)
    assert(qs.forall(_.head == COM_QUERY.toByte))
    val texts = qs.map(q => new String(q.drop(1), StandardCharsets.UTF_8))
    assert(texts.head.contains("@master_binlog_checksum"))
    assert(texts(1) == s"SET @slave_uuid = '${"ab" * 16}'")
    assert(texts(2).contains("@master_heartbeat_period"))
  }

  test("COM_REGISTER_SLAVE golden bytes") {
    val p = registerSlave(777L, "worker-1", "repl", 3307)
    val r = new BinlogParser.Reader(p, 0)
    assert(r.u8() == COM_REGISTER_SLAVE)
    assert(r.u32() == 777L)
    assert(r.str(r.u8()) == "worker-1")
    assert(r.str(r.u8()) == "repl")
    assert(r.u8() == 0) // password never sent
    assert(r.u16() == 3307)
    assert(r.u32() == 0L && r.u32() == 0L)
    assert(r.remaining == 0)
  }

  test("COM_BINLOG_DUMP_GTID encodes the executed set in the SID-block layout") {
    // the inclusive interval form from the repo's own GtidSet algebra
    val set = graft.functions.IntervalSet.parse("1-5:7")
    val uuid = "01020304-0506-0708-090a-0b0c0d0e0f10"
    val p = binlogDumpGtid(99L, Seq(uuid -> set.intervals))
    val r = new BinlogParser.Reader(p, 0)
    assert(r.u8() == COM_BINLOG_DUMP_GTID)
    assert(r.u16() == 0)
    assert(r.u32() == 99L)
    assert(r.u32() == 4L) // name-length contract for GTID start
    assert(r.i64() == 4L) // position
    val blockLen = r.u32()
    assert(blockLen == r.remaining)
    assert(r.i64() == 1L) // one sid
    assert(r.bytes(16).sameElements(Array.tabulate[Byte](16)(i => (i + 1).toByte)))
    assert(r.i64() == 2L) // two intervals
    assert(r.i64() == 1L && r.i64() == 6L) // [1,5] -> [1,6)
    assert(r.i64() == 7L && r.i64() == 8L) // [7,7] -> [7,8)
    assert(r.remaining == 0)
  }

  test("stream packet classification: OK-wrapped event, ERR with sql state, EOF") {
    val ev = w8(0x00, 1, 2, 3)
    classifyStreamPacket(ev) match {
      case EventPacket(bs) => assert(bs.sameElements(w8(1, 2, 3)))
      case other => fail(other.toString)
    }
    val err = w8(0xff, 0x48, 0x04) ++ "#HY000Lost connection".getBytes(StandardCharsets.UTF_8)
    classifyStreamPacket(err) match {
      case ErrPacket(code, state, msg) =>
        assert(code == 0x0448 && state == "HY000" && msg == "Lost connection")
      case other => fail(other.toString)
    }
    assert(classifyStreamPacket(w8(0xfe)) == EofPacket)
  }

  test("wire event stream decodes identically to the file form") {
    import BinlogBytes._
    import BinlogParser.{GTID_EVENT, QUERY_EVENT, XID_EVENT}
    val sid = Array.tabulate[Byte](16)(i => (i + 1).toByte)
    val fileBytes = file(
      fde(),
      event(GTID_EVENT, gtid(sid, 42L, 7L, 8L), 100),
      event(QUERY_EVENT, query("src", "CREATE TABLE t (id INT)", 45), 110),
      event(XID_EVENT, xid(9L), 120))
    // the same events as a dump stream: one OK-prefixed packet each
    val rawFromFile = BinlogParser.splitEvents(fileBytes, verifyCrc = true)
    val eventSlices = {
      // re-slice the file bytes per event (skip 4-byte magic)
      val sizes = rawFromFile.map(_.body.length) // body is checksum-stripped
      var pos = 4
      val out = Seq.newBuilder[Array[Byte]]
      // recompute sizes from headers to keep slicing independent
      while (pos < fileBytes.length) {
        val size = (fileBytes(pos + 9) & 0xff) | ((fileBytes(pos + 10) & 0xff) << 8) |
          ((fileBytes(pos + 11) & 0xff) << 16) | ((fileBytes(pos + 12) & 0xff) << 24)
        out += java.util.Arrays.copyOfRange(fileBytes, pos, pos + size)
        pos += size
      }
      out.result()
    }
    val packets = eventSlices.map(e => framePacket(0x00.toByte +: e, 1))
    var checksummed = false
    val rawFromWire = splitPackets(packets.reduce(_ ++ _)).map(_._2).map { payload =>
      val EventPacket(bs) = classifyStreamPacket(payload): @unchecked
      val ev = parseWireEvent(bs, checksummed)
      if (ev.typeCode == BinlogParser.FORMAT_DESCRIPTION_EVENT)
        checksummed = true // test FDE declares CRC32
      ev
    }
    assert(rawFromWire.map(_.typeCode) == rawFromFile.map(_.typeCode))
    rawFromWire.zip(rawFromFile).foreach { case (a, b) =>
      assert(a.body.sameElements(b.body), s"body mismatch for type ${a.typeCode}")
      assert(a.logPos == b.logPos && a.serverId == b.serverId)
    }
    // and the decoded ChangeEvents line up end-to-end
    val reg = new graft.ddl.SchemaRegistry
    val fromWire = BinlogParser.toChangeEvents(rawFromWire, reg)
    val fromFile = BinlogParser.toChangeEvents(rawFromFile, reg)
    assert(fromWire == fromFile && fromWire.exists(_.op == graft.model.Op.Ddl))
  }
}
