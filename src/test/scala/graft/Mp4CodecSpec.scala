package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.multimodal.Mp4Codec
import graft.operators.multimodal.Mp4Codec.TrackSpec

/** ISO-BMFF container codec: encoder↔parser round-trips (multi-track,
  * multi-run stts, stss subsets), sample/sync lookup, hand-crafted v1
  * full boxes and `largesize` framing, and loud failures on malformed
  * files — the spec the file's doc comment promises.
  */
class Mp4CodecSpec extends AnyFunSuite {

  private def vide(id: Int, deltas: Seq[Int], ts: Int = 1000,
      sync: Seq[Int] = Nil): TrackSpec =
    TrackSpec(id, "vide", "avc1", ts, deltas,
      deltas.indices.map(j => Array.tabulate[Byte](3 + j % 4)(k => (id * 17 + j * 5 + k).toByte)),
      sync)

  test("two-track round-trip: ids, handlers, codecs, timing, sizes, offsets") {
    val v = vide(1, Seq(100, 100, 100, 200, 200, 300), ts = 1000, sync = Seq(1, 4))
    val a = TrackSpec(2, "soun", "mp4a", 8000, Seq(640, 640, 640, 640),
      (0 until 4).map(j => Array.fill[Byte](10 + j)(j.toByte)))
    val bytes = Mp4Codec.encode(Seq(v, a), brand = "isom")
    val info = Mp4Codec.parse(bytes)
    assert(info.brand == "isom")
    assert(info.tracks.map(_.trackId) == Seq(1, 2))
    val tv = info.tracks.head
    assert(tv.handler == "vide" && tv.codec == "avc1" && tv.timescale == 1000)
    assert(tv.sampleCount == 6)
    // multi-run stts re-expands to per-sample start times
    assert(tv.sampleTsMs == Seq(0L, 100L, 200L, 300L, 500L, 700L))
    assert(tv.durationMs == 1000L)
    assert(tv.syncSamples == Seq(1, 4))
    assert(tv.sampleSizes == Seq(3L, 4L, 5L, 6L, 3L, 4L))
    val ta = info.tracks(1)
    assert(ta.handler == "soun" && ta.codec == "mp4a" && ta.timescale == 8000)
    assert(ta.durationMs == 2560L * 1000 / 8000)
    assert(ta.syncSamples == (1 to 4)) // stss absent → every sample is sync
    // movie duration = max track duration (ms timescale)
    assert(info.movieTimescale == 1000L && info.durationMs == 1000L)
    // every sample extractable byte-exactly via the offset table
    v.samples.indices.foreach { j =>
      val (ix, payload) = Mp4Codec.sampleAt(bytes, tv, tv.sampleTsMs(j))
      assert(ix == j + 1)
      assert(payload.sameElements(v.samples(j)))
    }
  }

  test("sampleAt floors to the covering sample; syncSampleAt walks back to stss") {
    val v = vide(3, Seq(100, 100, 200), sync = Seq(1, 3))
    val bytes = Mp4Codec.encode(Seq(v))
    val t = Mp4Codec.parse(bytes).tracks.head
    assert(Mp4Codec.sampleAt(bytes, t, 150)._1 == 2)   // ts 100 covers [100,200)
    assert(Mp4Codec.sampleAt(bytes, t, 0)._1 == 1)
    assert(Mp4Codec.sampleAt(bytes, t, -5)._1 == 1)    // clamped
    assert(Mp4Codec.sampleAt(bytes, t, 9999)._1 == 3)  // clamped to last
    assert(Mp4Codec.syncSampleAt(t, 250) == 3)         // sample 3 starts at 200
    assert(Mp4Codec.syncSampleAt(t, 150) == 1)         // back past non-sync 2
    assert(Mp4Codec.syncSampleAt(t, 0) == 1)
  }

  // ---- hand-built v1 boxes + largesize framing (the encoder emits v0;
  // the parser must accept both per ISO/IEC 14496-12) ----

  private class B {
    val o = new java.io.ByteArrayOutputStream()
    def u8(v: Int): B = { o.write(v & 0xff); this }
    def u16(v: Int): B = { u8(v >> 8); u8(v) }
    def u32(v: Long): B = { u16((v >> 16).toInt); u16(v.toInt) }
    def u64(v: Long): B = { u32(v >>> 32); u32(v & 0xffffffffL) }
    def tag(s: String): B = { o.write(s.getBytes("US-ASCII")); this }
    def raw(b: Array[Byte]): B = { o.write(b); this }
    def bytes: Array[Byte] = o.toByteArray
  }
  private def box(t: String, body: Array[Byte]): Array[Byte] =
    new B().u32(body.length + 8L).tag(t).raw(body).bytes
  private def full1(t: String, body: Array[Byte]): Array[Byte] =
    box(t, new B().u8(1).u8(0).u16(0).raw(body).bytes) // version=1, flags=0

  test("version-1 mvhd/tkhd/mdhd parse (64-bit times)") {
    val ftyp = box("ftyp", new B().tag("iso6").u32(0x200L).tag("iso6").bytes)
    val mvhd = full1("mvhd", new B()
      .u64(0).u64(0)            // creation, modification (u64 in v1)
      .u32(1000).u64(2500)      // timescale u32, duration u64
      .u32(0x00010000L).u16(0x0100).u16(0)
      .raw(new Array[Byte](8 + 36 + 24)).u32(2).bytes)
    val tkhd = full1("tkhd", new B()
      .u64(0).u64(0)            // creation, modification
      .u32(7).u32(0).u64(2500)  // track_ID, reserved, duration u64
      .raw(new Array[Byte](8 + 8 + 36 + 8)).bytes)
    val mdhd = full1("mdhd", new B()
      .u64(0).u64(0)            // creation, modification
      .u32(500).u64(1250)       // timescale u32, duration u64
      .u16(0x55c4).u16(0).bytes)
    val hdlr = box("hdlr", new B().u8(0).u8(0).u16(0)
      .u32(0).tag("vide").raw(new Array[Byte](12)).u8(0).bytes)
    val stsd = box("stsd", new B().u8(0).u8(0).u16(0).u32(1)
      .raw(box("avc1", new B().raw(new Array[Byte](6)).u16(1).bytes)).bytes)
    def full0(t: String, body: Array[Byte]): Array[Byte] =
      box(t, new B().u8(0).u8(0).u16(0).raw(body).bytes)
    val stts = full0("stts", new B().u32(1).u32(2).u32(625).bytes) // 2 samples x 625
    val stsc = full0("stsc", new B().u32(1).u32(1).u32(2).u32(1).bytes)
    val stsz = full0("stsz", new B().u32(0).u32(2).u32(4).u32(4).bytes)
    val stco = full0("stco", new B().u32(1).u32(0).bytes)
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val minf = box("minf", stbl)
    val trak = box("trak", tkhd ++ box("mdia", mdhd ++ hdlr ++ minf))
    val moov = box("moov", mvhd ++ trak)
    val info = Mp4Codec.parse(ftyp ++ moov ++ box("mdat", new Array[Byte](8)))
    assert(info.movieTimescale == 1000L && info.durationMs == 2500L)
    val t = info.tracks.head
    assert(t.trackId == 7)
    assert(t.timescale == 500 && t.durationMs == 1250L * 1000 / 500)
    assert(t.sampleCount == 2 && t.sampleTsMs == Seq(0L, 1250L))
  }

  test("largesize (size==1 + u64) and size==0 (to EOF) box framing") {
    val base = Mp4Codec.encode(Seq(vide(5, Seq(100, 100))))
    // locate the trailing mdat and re-frame it with largesize
    val r = java.nio.ByteBuffer.wrap(base)
    var pos = 0
    var mdatAt = -1
    while (pos < base.length) {
      val size = r.getInt(pos)
      val tag = new String(base, pos + 4, 4, "US-ASCII")
      if (tag == "mdat") mdatAt = pos
      pos += size
    }
    assert(mdatAt >= 0)
    val head = java.util.Arrays.copyOfRange(base, 0, mdatAt)
    val mdatBody = java.util.Arrays.copyOfRange(base, mdatAt + 8, base.length)
    val large = new B().u32(1).tag("mdat").u64(mdatBody.length + 16L).raw(mdatBody).bytes
    val infoLarge = Mp4Codec.parse(head ++ large)
    assert(infoLarge.tracks.head.sampleCount == 2)
    // size==0: box runs to end of file
    val toEof = new B().u32(0).tag("mdat").raw(mdatBody).bytes
    val infoEof = Mp4Codec.parse(head ++ toEof)
    assert(infoEof.tracks.head.sampleCount == 2)
  }

  test("malformed files fail loudly") {
    val good = Mp4Codec.encode(Seq(vide(9, Seq(100, 100, 100))))
    intercept[IllegalArgumentException](Mp4Codec.parse(good.dropRight(good.length - 6))) // torn header
    intercept[IllegalArgumentException](Mp4Codec.parse(
      box("ftyp", new B().tag("isom").u32(0x200L).tag("isom").bytes))) // no moov
    // a box claiming to overrun the file
    val overrun = good.clone()
    overrun(0) = 0x7f.toByte // ftyp size becomes enormous
    intercept[IllegalArgumentException](Mp4Codec.parse(overrun))
    // encoder input validation
    intercept[IllegalArgumentException](Mp4Codec.encode(Nil))
    intercept[IllegalArgumentException](Mp4Codec.encode(Seq(
      TrackSpec(1, "vide", "avc1", 1000, Seq(100), Nil)))) // samples/deltas mismatch
  }
}
