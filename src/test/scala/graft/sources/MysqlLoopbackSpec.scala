package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{CountDownLatch, TimeUnit}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** S1 end-to-end over a REAL TCP connection: an in-JVM server speaking
  * the public MySQL protocol (HandshakeV10 → auth verify →
  * session-setup OKs → COM_REGISTER_SLAVE → COM_BINLOG_DUMP_GTID →
  * OK-wrapped binlog event packets, multi-packet framing for ≥16 MiB
  * events) drives [[MysqlBinlogClient]] + [[BinlogParser]] + the tx
  * assembly the reference performs in
  * `binlog_reader.go:282-414,959-1036`. Everything the byte-level
  * specs pinned individually here moves through one live socket.
  */
/** Shared in-JVM fake MySQL server for loopback specs — serves the
  * canned handshake, VERIFIES the client's bytes (scramble recomputed
  * from its own password knowledge, SID block decoded and recorded)
  * rather than echoing them, then streams binlog events.
  */
object LoopbackMysql {
  import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream}
  import java.net.ServerSocket
  import java.nio.charset.StandardCharsets
  import java.util.concurrent.CountDownLatch
  import scala.collection.mutable.ArrayBuffer

  val user = "repl"
  val password = "s3cret!"
  val nonce: Array[Byte] = Array.tabulate[Byte](20)(i => (i * 7 + 3).toByte)

  def ok(seq: Int): Array[Byte] =
    MysqlWire.framePacket(Array[Byte](0x00, 0x00, 0x00, 0x02, 0x00, 0x00, 0x00), seq)

  def eof(seq: Int): Array[Byte] =
    MysqlWire.framePacket(Array[Byte](0xfe.toByte, 0x00, 0x00, 0x02, 0x00), seq)

  def handshakeV10(): Array[Byte] = {
    val b = ArrayBuffer.empty[Byte]
    b += 10
    b ++= "8.0.99-loopback".getBytes(StandardCharsets.UTF_8); b += 0
    b ++= Array[Byte](0x2a, 0x00, 0x00, 0x00) // thread id 42
    b ++= nonce.take(8); b += 0
    val caps = MysqlWire.CLIENT_PROTOCOL_41 | MysqlWire.CLIENT_PLUGIN_AUTH |
      MysqlWire.CLIENT_SECURE_CONNECTION | MysqlWire.CLIENT_LONG_PASSWORD
    b += (caps & 0xff).toByte; b += ((caps >> 8) & 0xff).toByte
    b += 45 // charset
    b ++= Array[Byte](0x02, 0x00) // status
    b += ((caps >> 16) & 0xff).toByte; b += ((caps >> 24) & 0xff).toByte
    b += 21 // auth data len
    b ++= Array.fill[Byte](10)(0)
    b ++= nonce.drop(8); b += 0
    b ++= "mysql_native_password".getBytes(StandardCharsets.UTF_8); b += 0
    MysqlWire.framePacket(b.toArray, 0)
  }

  def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n); var off = 0
    while (off < n) {
      val k = in.read(buf, off, n - off)
      if (k < 0) throw new EOFException(s"client closed ($off/$n)")
      off += k
    }
    buf
  }

  def readFrame(in: InputStream): (Int, Array[Byte]) = {
    val h = readFully(in, 4)
    val len = (h(0) & 0xff) | ((h(1) & 0xff) << 8) | ((h(2) & 0xff) << 16)
    (h(3) & 0xff, readFully(in, len))
  }

  /** What the fake server observed — asserted after the run. */
  final class Observed {
    @volatile var authOk = false
    @volatile var slaveServerId = -1L
    @volatile var dumpServerId = -1L
    @volatile var dumpGtids: Seq[(String, Seq[(Long, Long)])] = Nil
    val queries = new java.util.concurrent.CopyOnWriteArrayList[String]()
    @volatile var failure: Throwable = null
  }

  /** One-connection fake MySQL server: serves the canned handshake,
    * verifies the native-password scramble against its own password
    * knowledge, OKs the replica session setup + registration, parses
    * the dump command's SID block, then streams `events` (each an
    * OK-prefixed, possibly multi-packet payload) and closes with EOF.
    */
  def serve(server: ServerSocket, events: Seq[Array[Byte]], obs: Observed,
            ready: CountDownLatch): Thread = {
    val t = new Thread(() => {
      try {
        val sock = server.accept()
        try {
          sock.setTcpNoDelay(true)
          val in = new BufferedInputStream(sock.getInputStream, 1 << 16)
          val out = new BufferedOutputStream(sock.getOutputStream, 1 << 16)
          out.write(handshakeV10()); out.flush()
          // HandshakeResponse41
          val (_, resp) = readFrame(in)
          val r = new BinlogParser.Reader(resp, 0)
          r.u32(); r.u32(); r.u8(); r.skip(23)
          def ntStr(): String = {
            val sb = new StringBuilder
            while (r.peekU8() != 0) sb.append(r.u8().toChar)
            r.skip(1); sb.toString
          }
          val gotUser = ntStr()
          val auth = r.bytes(r.u8())
          val expected = MysqlWire.nativePasswordAuth(password, nonce)
          obs.authOk = gotUser == user && auth.sameElements(expected)
          require(obs.authOk, s"bad credentials from client: user=$gotUser")
          out.write(ok(2)); out.flush()
          // command loop
          var done = false
          while (!done) {
            val (_, cmd) = readFrame(in)
            (cmd(0) & 0xff) match {
              case MysqlWire.COM_QUERY =>
                obs.queries.add(new String(cmd, 1, cmd.length - 1, StandardCharsets.UTF_8))
                out.write(ok(1)); out.flush()
              case MysqlWire.COM_REGISTER_SLAVE =>
                val rr = new BinlogParser.Reader(cmd, 1)
                obs.slaveServerId = rr.u32()
                out.write(ok(1)); out.flush()
              case MysqlWire.COM_BINLOG_DUMP_GTID =>
                // layout: flags u16, server-id u32, name-len u32 (=4
                // under the GTID-start contract, with an EMPTY name),
                // position u64, sid-block-len u32, sid block
                val rr = new BinlogParser.Reader(cmd, 1)
                rr.u16() // flags
                obs.dumpServerId = rr.u32()
                require(rr.u32() == 4L, "GTID-start name-length contract")
                rr.i64() // position
                val blockLen = rr.u32().toInt
                val sids = rr.i64()
                obs.dumpGtids = (0L until sids).map { _ =>
                  val sid = rr.bytes(16).map(b => f"$b%02x").mkString
                  val uuid = s"${sid.substring(0, 8)}-${sid.substring(8, 12)}-${sid.substring(12, 16)}-${sid.substring(16, 20)}-${sid.substring(20)}"
                  val n = rr.i64()
                  uuid -> (0L until n).map(_ => { val lo = rr.i64(); val hi = rr.i64() - 1; (lo, hi) })
                }
                require(blockLen >= 8, "sid block present")
                // stream the binlog: seq continues from 1 across all packets
                var seq = 1
                events.foreach { ev =>
                  val payload = 0x00.toByte +: ev
                  out.write(MysqlWire.framePayload(payload, seq))
                  seq += payload.length / MysqlWire.MaxPacketPayload + 1
                }
                out.write(eof(seq)); out.flush()
                done = true
              case other => throw new IllegalStateException(f"unexpected command 0x$other%02x")
            }
          }
        } finally sock.close()
      } catch { case e: Throwable => obs.failure = e }
    }, "fake-mysql-server")
    t.setDaemon(true)
    ready.countDown()
    t.start()
    t
  }

}

class MysqlLoopbackSpec extends AnyFunSuite {
  import BinlogBytes._
  import LoopbackMysql._

  // ---- the canned binlog stream: FDE + three GTID transactions,
  //      tx2 carrying a >16 MiB LONGBLOB row image ----

  private val sid = Array.tabulate[Byte](16)(i => (i + 1).toByte)
  private val sidUuid = "01020304-0506-0708-090a-0b0c0d0e0f10"

  /** Row image for (id INT, payload LONGBLOB): null bitmap + values. */
  private def blobImg(id: Long, payload: Array[Byte]): Array[Byte] = {
    val w = new W()
    w.u8(0) // null bitmap: both present
    w.u32(id) // INT storage (type 0x03)
    w.u32(payload.length.toLong) // LONGBLOB: 4-byte length (meta=4)
    w.raw(payload)
    w.result
  }

  /** Row image for (id INT, name VARCHAR(32)): 1-byte length form. */
  private def nameImg(id: Long, name: String): Array[Byte] = {
    val w = new W()
    w.u8(0)
    w.u32(id)
    w.u8(name.length); w.str(name)
    w.result
  }

  private def cannedEvents(): (Seq[Array[Byte]], Int) = {
    val big = Array.tabulate[Byte](17 * 1024 * 1024)(i => (i * 131 + 17).toByte) // > 0xFFFFFF
    val evs = Seq(
      fde(),
      // tx 1: two inserts into src.users
      event(BinlogParser.GTID_EVENT, gtid(sid, 11L, 0L, 1L), 100),
      event(BinlogParser.QUERY_EVENT, query("src", "BEGIN", 45), 110),
      event(BinlogParser.TABLE_MAP_EVENT,
        tableMap(23L, "src", "users", Seq(0x03, 0x0f), new W().u16(64).result), 120),
      event(BinlogParser.WRITE_ROWS_V2,
        rows(23L, 2, Seq(nameImg(1, "ada"), nameImg(2, "linus"))), 130),
      event(BinlogParser.XID_EVENT, xid(901L), 140),
      // tx 2: ONE insert whose LONGBLOB pushes the event over the
      // single-packet ceiling — the multi-packet seam under test
      event(BinlogParser.GTID_EVENT, gtid(sid, 12L, 1L, 2L), 200),
      event(BinlogParser.QUERY_EVENT, query("src", "BEGIN", 45), 210),
      event(BinlogParser.TABLE_MAP_EVENT,
        tableMap(24L, "src", "media", Seq(0x03, 0xfc), new W().u8(4).result), 220),
      event(BinlogParser.WRITE_ROWS_V2,
        rows(24L, 2, Seq(blobImg(7, big))), 230),
      event(BinlogParser.XID_EVENT, xid(902L), 240),
      // tx 3: update + delete on users
      event(BinlogParser.GTID_EVENT, gtid(sid, 13L, 2L, 3L), 300),
      event(BinlogParser.QUERY_EVENT, query("src", "BEGIN", 45), 310),
      event(BinlogParser.TABLE_MAP_EVENT,
        tableMap(23L, "src", "users", Seq(0x03, 0x0f), new W().u16(64).result), 320),
      event(BinlogParser.UPDATE_ROWS_V2,
        rowsUpdate(23L, 2, Seq(nameImg(2, "linus"), nameImg(2, "grace"))), 330),
      event(BinlogParser.DELETE_ROWS_V2,
        rows(23L, 2, Seq(nameImg(1, "ada"))), 340),
      event(BinlogParser.XID_EVENT, xid(903L), 350))
    (evs, big.length)
  }

  test("multi-tx GTID stream replicates end-to-end through a real TCP socket") {
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val obs = new Observed
    val ready = new CountDownLatch(1)
    val (events, bigLen) = cannedEvents()
    val thread = serve(server, events, obs, ready)
    assert(ready.await(5, TimeUnit.SECONDS))
    try {
      val got = ArrayBuffer.empty[BinlogParser.RawEvent]
      MysqlBinlogClient.stream(MysqlBinlogClient.Config(
        host = InetAddress.getLoopbackAddress.getHostAddress,
        port = server.getLocalPort,
        user = user, password = password,
        serverId = 4242L, slaveUuid = "de" * 16,
        gtids = Seq(sidUuid -> Seq((1L, 10L))))) { ev => got += ev; true }
      thread.join(10000)
      assert(obs.failure == null, s"server-side failure: ${obs.failure}")

      // the replica dialogue reached the server intact
      assert(obs.authOk, "scramble must verify server-side")
      assert(obs.slaveServerId == 4242L && obs.dumpServerId == 4242L)
      assert(obs.queries.size == 3 &&
        obs.queries.get(0).contains("@master_binlog_checksum") &&
        obs.queries.get(1).contains("de" * 16) &&
        obs.queries.get(2).contains("@master_heartbeat_period"))
      // the executed-GTID set crossed in the SID-block layout, [lo,hi] inclusive
      assert(obs.dumpGtids == Seq(sidUuid -> Seq((1L, 10L))))

      // every canned event arrived, CRC-verified, in order
      assert(got.map(_.typeCode) == Seq(
        BinlogParser.FORMAT_DESCRIPTION_EVENT,
        BinlogParser.GTID_EVENT, BinlogParser.QUERY_EVENT, BinlogParser.TABLE_MAP_EVENT,
        BinlogParser.WRITE_ROWS_V2, BinlogParser.XID_EVENT,
        BinlogParser.GTID_EVENT, BinlogParser.QUERY_EVENT, BinlogParser.TABLE_MAP_EVENT,
        BinlogParser.WRITE_ROWS_V2, BinlogParser.XID_EVENT,
        BinlogParser.GTID_EVENT, BinlogParser.QUERY_EVENT, BinlogParser.TABLE_MAP_EVENT,
        BinlogParser.UPDATE_ROWS_V2, BinlogParser.DELETE_ROWS_V2, BinlogParser.XID_EVENT))
      // the >16 MiB ROWS event crossed the multi-packet seam byte-perfect:
      // its decoded blob value is the full hex of the canned payload
      val bigRows = got.find(e => e.typeCode == BinlogParser.WRITE_ROWS_V2 && e.body.length > (1 << 24)).get
      assert(bigRows.body.length > MysqlWire.MaxPacketPayload)

      // decode to ChangeEvents through the SAME path as the file source
      import org.apache.spark.sql.types._
      val reg = new graft.ddl.SchemaRegistry
      reg.put("src", "users", StructType(Seq(
        StructField("id", IntegerType), StructField("name", StringType))))
      reg.put("src", "media", StructType(Seq(
        StructField("id", IntegerType), StructField("payload", BinaryType))))
      val ces = BinlogParser.toChangeEvents(got.toSeq, reg)
      val commits = ces.filter(_.op == "commit")
      assert(commits.map(_.gtid) == Seq(s"$sidUuid:11", s"$sidUuid:12", s"$sidUuid:13"))
      val dml = ces.filterNot(_.op == "commit")
      assert(dml.map(e => (e.table, e.op, e.key)) == Seq(
        ("users", graft.model.Op.Insert, "1"),
        ("users", graft.model.Op.Insert, "2"),
        ("media", graft.model.Op.Insert, "7"),
        ("users", graft.model.Op.Update, "2"),
        ("users", graft.model.Op.Delete, "1")))
      assert(dml(0).after("name") == "ada" && dml(1).after("name") == "linus")
      assert(dml(3).before("name") == "linus" && dml(3).after("name") == "grace")
      // apply the stream through the sink path (tx order, delete(before)
      // + replace(after) — the reference applier's default form) and
      // check the replica's final state, closing the S1→K loop
      val users = scala.collection.mutable.Map.empty[String, Map[String, String]]
      val tdef = graft.sinks.SqlBuilder.TableDef("dst", "users",
        Seq("id", "name"), Seq("id"))
      assert(graft.sinks.SqlBuilder.replaceInto(tdef, 1)
        .startsWith("REPLACE INTO `dst`.`users`")) // the statements the real sink would run
      dml.filter(_.table == "users").foreach { e =>
        e.op match {
          case graft.model.Op.Insert => users(e.key) = e.after
          case graft.model.Op.Update => users.remove(e.key); users(e.after("id")) = e.after
          case graft.model.Op.Delete => users.remove(e.key)
          case other => fail(s"unexpected op $other")
        }
      }
      assert(users == Map("2" -> Map("id" -> "2", "name" -> "grace")))

      // blob integrity: BLOB decodes as a latin-1 carrier string —
      // every one of the 17 MiB bytes survived the multi-packet seam
      val blob = dml(2).after("payload")
      assert(blob.length == bigLen)
      var i = 0
      var intact = true
      while (intact && i < bigLen) {
        if ((blob.charAt(i) & 0xff) != ((i * 131 + 17) & 0xff)) intact = false
        i += 1
      }
      assert(intact, s"blob corrupted at offset $i")
    } finally server.close()
  }

  test("S10 relay: socket stream → disk relay file → CRC-verified replay, identical events") {
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val obs = new Observed
    val ready = new CountDownLatch(1)
    val (events, _) = cannedEvents()
    val thread = serve(server, events, obs, ready)
    assert(ready.await(5, TimeUnit.SECONDS))
    val relayPath = java.nio.file.Files.createTempDirectory("relay_").resolve("relay-000001.bin").toString
    try {
      // socket → disk, wire bytes verbatim (no re-serialization)
      val n = BinlogRelay.relayFrom(MysqlBinlogClient.Config(
        host = InetAddress.getLoopbackAddress.getHostAddress,
        port = server.getLocalPort, user = user, password = password,
        serverId = 4242L, slaveUuid = "cd" * 16,
        gtids = Seq(sidUuid -> Seq((1L, 10L)))), relayPath)
      thread.join(10000)
      assert(obs.failure == null, s"server-side failure: ${obs.failure}")
      assert(n == events.length.toLong)

      // the relay file replays with CRC verification ON — the master's
      // own checksums survived the socket and the disk hop
      import org.apache.spark.sql.types._
      val reg = new graft.ddl.SchemaRegistry
      reg.put("src", "users", StructType(Seq(
        StructField("id", IntegerType), StructField("name", StringType))))
      reg.put("src", "media", StructType(Seq(
        StructField("id", IntegerType), StructField("payload", BinaryType))))
      val replayed = BinlogParser.readBinlogFile(relayPath, reg, verifyCrc = true)
      assert(replayed.count(_.op == "commit") == 3)
      assert(replayed.filter(_.op == graft.model.Op.Insert)
        .map(e => (e.table, e.key)).toSet == Set(("users", "1"), ("users", "2"), ("media", "7")))
      // a torn tail (crash mid-append) fails loudly on replay, never
      // applies half an event
      val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(relayPath))
      val torn = java.util.Arrays.copyOfRange(raw, 0, raw.length - 7)
      intercept[IllegalArgumentException](
        BinlogParser.splitEvents(torn, verifyCrc = true))
    } finally {
      server.close()
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(relayPath))
    }
  }

  test("caching_sha2 fast path and auth-switch-to-native both negotiate over the socket") {
    // two server personalities: (a) advertises caching_sha2_password,
    // verifies the SHA-256 scramble, answers AuthMoreData 0x03 (fast
    // auth) then OK; (b) advertises caching_sha2 but switches the
    // client to mysql_native_password with a FRESH nonce mid-auth
    for (useSwitch <- Seq(false, true)) {
      val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
      val obs = new Observed
      val switchNonce = Array.tabulate[Byte](20)(i => (i * 11 + 1).toByte)
      val t = new Thread(() => {
        try {
          val sock = server.accept()
          try {
            val in = new BufferedInputStream(sock.getInputStream)
            val out = new BufferedOutputStream(sock.getOutputStream)
            // handshake advertising caching_sha2_password
            val hs = {
              val b = ArrayBuffer.empty[Byte]
              b += 10
              b ++= "8.0.99-sha2".getBytes(StandardCharsets.UTF_8); b += 0
              b ++= Array[Byte](0x2b, 0, 0, 0)
              b ++= nonce.take(8); b += 0
              val caps = MysqlWire.CLIENT_PROTOCOL_41 | MysqlWire.CLIENT_PLUGIN_AUTH |
                MysqlWire.CLIENT_SECURE_CONNECTION
              b += (caps & 0xff).toByte; b += ((caps >> 8) & 0xff).toByte
              b += 45; b ++= Array[Byte](2, 0)
              b += ((caps >> 16) & 0xff).toByte; b += ((caps >> 24) & 0xff).toByte
              b += 21; b ++= Array.fill[Byte](10)(0)
              b ++= nonce.drop(8); b += 0
              b ++= "caching_sha2_password".getBytes(StandardCharsets.UTF_8); b += 0
              MysqlWire.framePacket(b.toArray, 0)
            }
            out.write(hs); out.flush()
            val (_, resp) = readFrame(in)
            val r = new BinlogParser.Reader(resp, 0)
            r.u32(); r.u32(); r.u8(); r.skip(23)
            def ntStr(): String = {
              val sb = new StringBuilder
              while (r.peekU8() != 0) sb.append(r.u8().toChar)
              r.skip(1); sb.toString
            }
            ntStr() // user
            val auth = r.bytes(r.u8())
            if (!useSwitch) {
              require(auth.sameElements(MysqlWire.cachingSha2Auth(password, nonce)),
                "sha2 scramble must verify")
              out.write(MysqlWire.framePacket(Array[Byte](0x01, 0x03), 2)) // fast auth ok
              out.write(ok(3)); out.flush()
            } else {
              // switch to native with a fresh nonce
              val sw = ("mysql_native_password".getBytes(StandardCharsets.UTF_8) :+ 0.toByte) ++
                switchNonce :+ 0.toByte
              out.write(MysqlWire.framePacket(0xfe.toByte +: sw, 2)); out.flush()
              val (_, swResp) = readFrame(in)
              require(swResp.sameElements(MysqlWire.nativePasswordAuth(password, switchNonce)),
                "switched scramble must verify on the NEW nonce")
              out.write(ok(4)); out.flush()
            }
            obs.authOk = true
            // minimal command loop: OK everything, FDE+EOF the dump
            var done = false
            while (!done) {
              val (_, cmd) = readFrame(in)
              if ((cmd(0) & 0xff) == MysqlWire.COM_BINLOG_DUMP_GTID) {
                out.write(MysqlWire.framePacket(0x00.toByte +: fde(), 1))
                out.write(eof(2)); out.flush()
                done = true
              } else { out.write(ok(1)); out.flush() }
            }
          } finally sock.close()
        } catch { case e: Throwable => obs.failure = e }
      })
      t.setDaemon(true); t.start()
      try {
        val got = ArrayBuffer.empty[Int]
        MysqlBinlogClient.stream(MysqlBinlogClient.Config(
          host = InetAddress.getLoopbackAddress.getHostAddress,
          port = server.getLocalPort, user = user, password = password,
          serverId = 9L, slaveUuid = "ef" * 16)) { ev => got += ev.typeCode; true }
        t.join(5000)
        assert(obs.failure == null, s"server failure (switch=$useSwitch): ${obs.failure}")
        assert(obs.authOk, s"auth did not verify (switch=$useSwitch)")
        assert(got.toSeq == Seq(BinlogParser.FORMAT_DESCRIPTION_EVENT),
          s"stream should deliver the FDE after auth (switch=$useSwitch)")
      } finally server.close()
    }
  }

  test("heartbeat events ride the stream without disturbing decode") {
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val obs = new Observed
    val ready = new CountDownLatch(1)
    // FDE, heartbeat (type 0x1b, body = binlog file name), one tx
    val evs = Seq(
      fde(),
      event(0x1b, new W().str("mysql-bin.000042").result, 90),
      event(BinlogParser.GTID_EVENT, gtid(sid, 21L, 0L, 1L), 100),
      event(BinlogParser.QUERY_EVENT, query("src", "BEGIN", 45), 110),
      event(BinlogParser.TABLE_MAP_EVENT,
        tableMap(23L, "src", "users", Seq(0x03, 0x0f), new W().u16(64).result), 120),
      event(BinlogParser.WRITE_ROWS_V2, rows(23L, 2, Seq(nameImg(9, "ida"))), 130),
      event(0x1b, new W().str("mysql-bin.000042").result, 135),
      event(BinlogParser.XID_EVENT, xid(955L), 140))
    val thread = serve(server, evs, obs, ready)
    assert(ready.await(5, TimeUnit.SECONDS))
    try {
      val got = ArrayBuffer.empty[BinlogParser.RawEvent]
      MysqlBinlogClient.stream(MysqlBinlogClient.Config(
        host = InetAddress.getLoopbackAddress.getHostAddress,
        port = server.getLocalPort, user = user, password = password,
        serverId = 5L, slaveUuid = "aa" * 16)) { ev => got += ev; true }
      thread.join(10000)
      assert(obs.failure == null, s"server-side failure: ${obs.failure}")
      assert(got.count(_.typeCode == 0x1b) == 2, "heartbeats must arrive (CRC-checked)")
      import org.apache.spark.sql.types._
      val reg = new graft.ddl.SchemaRegistry
      reg.put("src", "users", StructType(Seq(
        StructField("id", IntegerType), StructField("name", StringType))))
      val ces = BinlogParser.toChangeEvents(got.toSeq, reg)
      assert(ces.map(_.op) == Seq(graft.model.Op.Insert, "commit"),
        "heartbeats must not perturb tx assembly")
      assert(ces.head.after("name") == "ida")
    } finally server.close()
  }

  test("S10 relay rotation: ROTATE events roll files, each independently replayable") {
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val obs = new Observed
    val ready = new CountDownLatch(1)
    // file 1: FDE + tx(gno 41); ROTATE to mysql-bin.000002; file 2's own
    // FDE + tx(gno 42) — the per-file FDE is what makes each relay file
    // self-describing
    val evs = Seq(
      fde(),
      event(BinlogParser.GTID_EVENT, gtid(sid, 41L, 0L, 1L), 100),
      event(BinlogParser.QUERY_EVENT, query("src", "BEGIN", 45), 110),
      event(BinlogParser.TABLE_MAP_EVENT,
        tableMap(23L, "src", "users", Seq(0x03, 0x0f), new W().u16(64).result), 120),
      event(BinlogParser.WRITE_ROWS_V2, rows(23L, 2, Seq(nameImg(4, "dan"))), 130),
      event(BinlogParser.XID_EVENT, xid(41L), 140),
      event(BinlogParser.ROTATE_EVENT,
        new W().i64(4L).str("mysql-bin.000002").result, 150),
      fde(),
      event(BinlogParser.GTID_EVENT, gtid(sid, 42L, 0L, 1L), 100),
      event(BinlogParser.QUERY_EVENT, query("src", "BEGIN", 45), 110),
      event(BinlogParser.TABLE_MAP_EVENT,
        tableMap(23L, "src", "users", Seq(0x03, 0x0f), new W().u16(64).result), 120),
      event(BinlogParser.WRITE_ROWS_V2, rows(23L, 2, Seq(nameImg(5, "eve"))), 130),
      event(BinlogParser.XID_EVENT, xid(42L), 140))
    val thread = serve(server, evs, obs, ready)
    assert(ready.await(5, TimeUnit.SECONDS))
    val dir = java.nio.file.Files.createTempDirectory("relaydir_").toString
    try {
      val files = BinlogRelay.relayDirFrom(MysqlBinlogClient.Config(
        host = InetAddress.getLoopbackAddress.getHostAddress,
        port = server.getLocalPort, user = user, password = password,
        serverId = 8L, slaveUuid = "bb" * 16), dir)
      thread.join(10000)
      assert(obs.failure == null, s"server-side failure: ${obs.failure}")
      assert(files.map(f => java.nio.file.Paths.get(f).getFileName.toString) ==
        Seq("relay-000001", "mysql-bin.000002"))
      import org.apache.spark.sql.types._
      val reg = new graft.ddl.SchemaRegistry
      reg.put("src", "users", StructType(Seq(
        StructField("id", IntegerType), StructField("name", StringType))))
      // each file replays on its own (own FDE, CRC verified)
      val f1 = BinlogParser.readBinlogFile(files(0), reg, verifyCrc = true)
      val f2 = BinlogParser.readBinlogFile(files(1), reg, verifyCrc = true)
      assert(f1.filter(_.op == graft.model.Op.Insert).map(_.after("name")) == Seq("dan"))
      assert(f1.count(_.op == "commit") == 1)
      assert(f2.filter(_.op == graft.model.Op.Insert).map(_.after("name")) == Seq("eve"))
      assert(f2.count(_.op == "commit") == 1)
    } finally {
      server.close()
      val d = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(d).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("server ERR during the dump surfaces as a loud failure, not silence") {
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val obs = new Observed
    val ready = new CountDownLatch(1)
    // a server that ERRs the dump: deliver one FDE then an ERR packet
    val t = new Thread(() => {
      try {
        val sock = server.accept()
        try {
          val in = new BufferedInputStream(sock.getInputStream)
          val out = new BufferedOutputStream(sock.getOutputStream)
          out.write(handshakeV10()); out.flush()
          readFrame(in); out.write(ok(2)); out.flush()
          var done = false
          while (!done) {
            val (_, cmd) = readFrame(in)
            if ((cmd(0) & 0xff) == MysqlWire.COM_BINLOG_DUMP_GTID) {
              out.write(MysqlWire.framePacket(0x00.toByte +: fde(), 1))
              val msg = Array[Byte](0xff.toByte, 0x48, 0x04) ++
                "#HY000could not find first log".getBytes(StandardCharsets.UTF_8)
              out.write(MysqlWire.framePacket(msg, 2)); out.flush()
              done = true
            } else { out.write(ok(1)); out.flush() }
          }
        } finally sock.close()
      } catch { case e: Throwable => obs.failure = e }
    })
    t.setDaemon(true); ready.countDown(); t.start()
    try {
      val e = intercept[IllegalStateException] {
        MysqlBinlogClient.stream(MysqlBinlogClient.Config(
          host = InetAddress.getLoopbackAddress.getHostAddress,
          port = server.getLocalPort, user = user, password = password,
          serverId = 1L, slaveUuid = "ab" * 16)) { _ => true }
      }
      assert(e.getMessage.contains("1096") || e.getMessage.contains("could not find first log"))
    } finally server.close()
  }
}
