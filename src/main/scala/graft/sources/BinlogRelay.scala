package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths}

/** S10 — the binlog disk relay: the reference's relay mode caches the
  * master's event stream in local binlog-format files before applying
  * (`SURVEY.md` S10; the streaming checkpoint supersedes it as the
  * durability mechanism here, but the FILE itself is still the useful
  * artifact — an offline replay/audit trail, and the bridge into
  * [[BinlogParser.readBinlogFile]] / [[CdcFileSource]]).
  *
  * The writer is deliberately dumb: wire event bytes (header + body +
  * CRC, exactly what [[MysqlBinlogClient.streamRaw]] hands over) are
  * byte-identical to the file event layout, so relaying is magic +
  * verbatim appends — no re-serialization, and the master's own CRCs
  * survive into the file, where replay re-verifies them.
  *
  * Durability contract: [[close]] fsyncs before closing, and
  * [[append]] leaves no internal buffering gaps on crash beyond the
  * OS page cache — the same contract a relay restart needs: replaying
  * a torn tail fails the CRC check loudly instead of applying half an
  * event.
  */
final class BinlogRelay private (path: String, out: BufferedOutputStream,
                                 fd: FileOutputStream) {
  private var eventCount = 0L

  def append(eventBytes: Array[Byte]): Unit = {
    out.write(eventBytes)
    eventCount += 1
  }

  def events: Long = eventCount

  /** Flush + fsync + close — after this returns, the file replays. */
  def close(): Unit = {
    out.flush()
    fd.getFD.sync()
    out.close()
  }
}

object BinlogRelay {
  /** Open a fresh relay file (magic written immediately). */
  def create(path: String): BinlogRelay = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val fd = new FileOutputStream(path)
    val out = new BufferedOutputStream(fd, 1 << 16)
    out.write(Array[Byte](0xfe.toByte, 'b', 'i', 'n'))
    new BinlogRelay(path, out, fd)
  }

  /** Pump a live dump connection into a relay file: connect, stream,
    * append every event's wire bytes verbatim, stop after `maxEvents`
    * (or server EOF), fsync, return the event count. The one-call
    * socket→disk form of S1+S10; replay with
    * [[BinlogParser.readBinlogFile]].
    */
  def relayFrom(cfg: MysqlBinlogClient.Config, path: String,
                maxEvents: Long = Long.MaxValue): Long = {
    val relay = create(path)
    try {
      MysqlBinlogClient.streamRaw(cfg) { (_, bytes) =>
        relay.append(bytes)
        relay.events < maxEvents
      }
      relay.events
    } finally relay.close()
  }

  /** Directory form with FILE ROTATION — the reference's relay layout:
    * one local file per master binlog file, switched on ROTATE events
    * (the server opens every dump with a fake ROTATE naming the
    * current file, and emits a real one at each file boundary, each
    * followed by that file's own FDE — so every relay file is
    * self-describing and replays independently). ROTATE events
    * themselves are control-plane framing and are NOT written (a
    * replayed file would otherwise end with a pointer to a file the
    * relay names differently). Returns the files written, in order,
    * each CRC-replayable via [[BinlogParser.readBinlogFile]].
    */
  def relayDirFrom(cfg: MysqlBinlogClient.Config, dir: String,
                   maxEvents: Long = Long.MaxValue): Seq[String] = {
    val written = Seq.newBuilder[String]
    var current: BinlogRelay = null
    var total = 0L
    def roll(name: String): Unit = {
      if (current != null) current.close()
      val p = Paths.get(dir, name).toString
      current = create(p)
      written += p
    }
    try {
      MysqlBinlogClient.streamRaw(cfg) { (ev, bytes) =>
        total += 1
        if (ev.typeCode == BinlogParser.ROTATE_EVENT) {
          val (_, nextFile) = BinlogParser.parseRotate(ev.body)
          roll(nextFile)
        } else {
          if (current == null) roll("relay-000001") // no leading fake ROTATE
          current.append(bytes)
        }
        total < maxEvents
      }
      written.result()
    } finally if (current != null) current.close()
  }
}
