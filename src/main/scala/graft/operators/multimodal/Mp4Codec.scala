package graft.operators.multimodal

/** ISO-BMFF (MP4) CONTAINER codec — from scratch, big-endian box walk
  * per the public ISO/IEC 14496-12 layout. This is the container half
  * of the "modern video" gap: at 100 TB the training-data operations on
  * video are METADATA and SAMPLE operations — duration, track census,
  * codec census, keyframe indexing, sample extraction at a timestamp —
  * all of which live in `moov` and need no pixel decoding. The H.264
  * bitstream inside each sample stays an opaque byte payload
  * ([[Multimodal.FakeCodec]] still stubs pixel decode, honestly
  * labeled); everything the container ACTUALLY encodes is parsed for
  * real here, round-trip tested against the encoder and structural
  * variants (v0/v1 full boxes, multi-run stts, stss subsets).
  *
  * Box layout: `u32 size + 4cc type (+ u64 largesize when size==1)`,
  * nested; full boxes carry `u8 version + u24 flags`. Unlike the AVI
  * RIFF walk (little-endian), everything here is big-endian.
  */
object Mp4Codec extends Serializable {

  /** One track to encode: per-sample payloads + timing. `syncSamples`
    * is 1-based (the stss convention); empty means every sample is a
    * sync sample and stss is omitted (the spec's default reading).
    */
  case class TrackSpec(trackId: Int, handler: String, codec: String,
                       timescale: Int, sampleDeltas: Seq[Int],
                       samples: Seq[Array[Byte]], syncSamples: Seq[Int] = Nil)

  case class TrackInfo(trackId: Int, handler: String, codec: String,
                       timescale: Int, durationMs: Long, sampleCount: Int,
                       syncSamples: Seq[Int], sampleSizes: Seq[Long],
                       sampleOffsets: Seq[Long], sampleTsMs: Seq[Long])

  case class Mp4Info(brand: String, movieTimescale: Long, durationMs: Long,
                     tracks: Seq[TrackInfo])

  // ---- encode -------------------------------------------------------------

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

  private def box(tpe: String, body: Array[Byte]): Array[Byte] =
    new B().u32(body.length + 8L).tag(tpe).raw(body).bytes

  private def full(tpe: String, version: Int, body: Array[Byte]): Array[Byte] =
    box(tpe, new B().u8(version).u8(0).u16(0).raw(body).bytes)

  private def trackDurMs(t: TrackSpec): Long =
    t.sampleDeltas.map(_.toLong).sum * 1000L / t.timescale

  /** Encode one file: ftyp + moov + one mdat with each track's samples
    * laid out as a single chunk (stsc one run, stco one offset). The
    * moov is built twice — once to learn its size, once with the real
    * chunk offsets — the standard fixed-width-offset trick.
    */
  def encode(tracks: Seq[TrackSpec], brand: String = "isom"): Array[Byte] = {
    require(tracks.nonEmpty, "mp4 needs ≥ 1 track")
    tracks.foreach { t =>
      require(t.samples.nonEmpty && t.samples.size == t.sampleDeltas.size,
        s"track ${t.trackId}: samples/deltas mismatch")
      require(t.handler.length == 4 && t.codec.length == 4, "4cc handler/codec")
    }
    val ftyp = box("ftyp", new B().tag(brand).u32(0x200L).tag(brand).tag("mp41").bytes)
    val movieTs = 1000L
    val movieDur = tracks.map(trackDurMs).max

    def moovBytes(chunkOffsets: Map[Int, Long]): Array[Byte] = {
      val mvhd = full("mvhd", 0, new B()
        .u32(0).u32(0)                       // creation, modification
        .u32(movieTs).u32(movieDur)
        .u32(0x00010000L).u16(0x0100).u16(0) // rate 1.0, volume 1.0
        .raw(new Array[Byte](8))             // reserved
        .raw(identityMatrix)
        .raw(new Array[Byte](24))            // pre_defined
        .u32(tracks.map(_.trackId).max + 1L) // next_track_ID
        .bytes)
      val traks = tracks.map { t =>
        val durMs = trackDurMs(t)
        val tkhd = full("tkhd", 0, new B()
          .u32(0).u32(0).u32(t.trackId.toLong).u32(0).u32(durMs)
          .raw(new Array[Byte](8)).u16(0).u16(0).u16(0).u16(0)
          .raw(identityMatrix).u32(0).u32(0).bytes)
        val mdhd = full("mdhd", 0, new B()
          .u32(0).u32(0).u32(t.timescale.toLong)
          .u32(t.sampleDeltas.map(_.toLong).sum)
          .u16(0x55c4).u16(0)                // language 'und'
          .bytes)
        val hdlr = full("hdlr", 0, new B()
          .u32(0).tag(t.handler).raw(new Array[Byte](12)).u8(0).bytes)
        // minimal sample entry: 6 reserved + u16 data_reference_index,
        // the codec 4cc as the entry type — enough for a codec census;
        // real avcC/esds configuration is bitstream territory (stubbed)
        val entry = box(t.codec, new B().raw(new Array[Byte](6)).u16(1).bytes)
        val stsd = full("stsd", 0, new B().u32(1).raw(entry).bytes)
        val sttsRuns = runLength(t.sampleDeltas)
        val stts = full("stts", 0, new B().u32(sttsRuns.size.toLong)
          .raw(sttsRuns.flatMap { case (n, d) =>
            new B().u32(n.toLong).u32(d.toLong).bytes }.toArray).bytes)
        val stsc = full("stsc", 0,
          new B().u32(1).u32(1).u32(t.samples.size.toLong).u32(1).bytes)
        val stsz = full("stsz", 0, new B().u32(0).u32(t.samples.size.toLong)
          .raw(t.samples.flatMap(s => new B().u32(s.length.toLong).bytes).toArray).bytes)
        val stco = full("stco", 0,
          new B().u32(1).u32(chunkOffsets.getOrElse(t.trackId, 0L)).bytes)
        val stss = if (t.syncSamples.isEmpty) Array.emptyByteArray
          else full("stss", 0, new B().u32(t.syncSamples.size.toLong)
            .raw(t.syncSamples.flatMap(s => new B().u32(s.toLong).bytes).toArray).bytes)
        val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco ++ stss)
        val header = if (t.handler == "vide")
          full("vmhd", 0, new B().u16(0).u16(0).u16(0).u16(0).bytes)
        else full("smhd", 0, new B().u16(0).u16(0).bytes)
        val dref = full("dref", 0,
          new B().u32(1).raw(full("url ", 0, Array.emptyByteArray)).bytes)
        // 'url ' with flags=1 means self-contained; rewrite the flags byte
        val drefFixed = { val d = dref.clone(); d(d.length - 1) = 1; d }
        val minf = box("minf", header ++ box("dinf", drefFixed) ++ stbl)
        box("trak", tkhd ++ box("mdia", mdhd ++ hdlr ++ minf))
      }
      box("moov", mvhd ++ traks.flatten.toArray)
    }

    val moovSize = moovBytes(Map.empty).length
    var cursor = ftyp.length.toLong + moovSize + 8 // + mdat header
    val offsets = tracks.map { t =>
      val off = t.trackId -> cursor
      cursor += t.samples.map(_.length.toLong).sum
      off
    }.toMap
    val mdatBody = tracks.flatMap(_.samples).flatten.toArray
    ftyp ++ moovBytes(offsets) ++ box("mdat", mdatBody)
  }

  private val identityMatrix: Array[Byte] = new B()
    .u32(0x00010000L).u32(0).u32(0)
    .u32(0).u32(0x00010000L).u32(0)
    .u32(0).u32(0).u32(0x40000000L).bytes

  private def runLength(xs: Seq[Int]): Seq[(Int, Int)] =
    xs.foldLeft(List.empty[(Int, Int)]) {
      case ((n, v) :: tail, x) if v == x => (n + 1, v) :: tail
      case (acc, x) => (1, x) :: acc
    }.reverse

  // ---- parse ----------------------------------------------------------------

  private class R(val p: Array[Byte]) {
    def u8(at: Int): Int = p(at) & 0xff
    def u16(at: Int): Int = (u8(at) << 8) | u8(at + 1)
    def u32(at: Int): Long = (u16(at).toLong << 16) | u16(at + 2)
    def u64(at: Int): Long = (u32(at) << 32) | u32(at + 4)
    def tag(at: Int): String = new String(p, at, 4, "US-ASCII")
  }

  /** (type, bodyStart, bodyEnd) for each box in [from, until). */
  private def boxes(r: R, from: Int, until: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var pos = from
    while (pos < until) {
      require(pos + 8 <= until, s"truncated box header at $pos")
      val size32 = r.u32(pos)
      val tpe = r.tag(pos + 4)
      val (bodyStart, end) =
        if (size32 == 1) (pos + 16, pos + r.u64(pos + 8))
        else if (size32 == 0) (pos + 8, until.toLong) // to end of file
        else (pos + 8, pos + size32)
      require(end <= until && end > pos, s"box $tpe at $pos overruns ($end > $until)")
      out += ((tpe, bodyStart, end.toInt))
      pos = end.toInt
    }
    out.result()
  }

  private def child(r: R, bs: Seq[(String, Int, Int)], tpe: String): (Int, Int) =
    bs.collectFirst { case (`tpe`, s, e) => (s, e) }
      .getOrElse(throw new IllegalArgumentException(s"missing required box $tpe"))

  def parse(payload: Array[Byte]): Mp4Info = {
    val r = new R(payload)
    val top = boxes(r, 0, payload.length)
    val brand = top.collectFirst { case ("ftyp", s, _) => r.tag(s) }
      .getOrElse(throw new IllegalArgumentException("no ftyp box"))
    val (moovS, moovE) = child(r, top, "moov")
    val moov = boxes(r, moovS, moovE)
    val (mvhdS, _) = child(r, moov, "mvhd")
    val mvhdV = r.u8(mvhdS)
    val (movieTs, movieDur) =
      if (mvhdV == 1) (r.u32(mvhdS + 4 + 16), r.u64(mvhdS + 4 + 20))
      else (r.u32(mvhdS + 4 + 8), r.u32(mvhdS + 4 + 12))
    val tracks = moov.collect { case ("trak", s, e) =>
      val trak = boxes(r, s, e)
      val (tkhdS, _) = child(r, trak, "tkhd")
      val tkhdV = r.u8(tkhdS)
      val trackId =
        if (tkhdV == 1) r.u32(tkhdS + 4 + 16) else r.u32(tkhdS + 4 + 8)
      val (mdiaS, mdiaE) = child(r, trak, "mdia")
      val mdia = boxes(r, mdiaS, mdiaE)
      val (mdhdS, _) = child(r, mdia, "mdhd")
      val mdhdV = r.u8(mdhdS)
      val (trackTs, trackDur) =
        if (mdhdV == 1) (r.u32(mdhdS + 4 + 16), r.u64(mdhdS + 4 + 20))
        else (r.u32(mdhdS + 4 + 8), r.u32(mdhdS + 4 + 12))
      val (hdlrS, _) = child(r, mdia, "hdlr")
      val handler = r.tag(hdlrS + 8)
      val (minfS, minfE) = child(r, mdia, "minf")
      val (stblS, stblE) = child(r, boxes(r, minfS, minfE), "stbl")
      val stbl = boxes(r, stblS, stblE)
      val (stsdS, _) = child(r, stbl, "stsd")
      require(r.u32(stsdS + 4) >= 1, "empty stsd")
      val codec = r.tag(stsdS + 12)
      // stts → per-sample deltas
      val (sttsS, _) = child(r, stbl, "stts")
      val deltas = (0 until r.u32(sttsS + 4).toInt).flatMap { i =>
        val n = r.u32(sttsS + 8 + i * 8).toInt
        val d = r.u32(sttsS + 12 + i * 8)
        Seq.fill(n)(d)
      }
      // stsz → sizes
      val (stszS, _) = child(r, stbl, "stsz")
      val fixedSize = r.u32(stszS + 4)
      val nSamples = r.u32(stszS + 8).toInt
      val sizes =
        if (fixedSize != 0) Seq.fill(nSamples)(fixedSize)
        else (0 until nSamples).map(i => r.u32(stszS + 12 + i * 4))
      require(deltas.size == nSamples, s"stts covers ${deltas.size} of $nSamples samples")
      // stsc runs + stco offsets → per-sample absolute offsets
      val (stscS, _) = child(r, stbl, "stsc")
      val scRuns = (0 until r.u32(stscS + 4).toInt).map { i =>
        (r.u32(stscS + 8 + i * 12).toInt, r.u32(stscS + 12 + i * 12).toInt)
      } // (first_chunk 1-based, samples_per_chunk)
      val (stcoS, _) = child(r, stbl, "stco")
      val chunkOffs = (0 until r.u32(stcoS + 4).toInt)
        .map(i => r.u32(stcoS + 8 + i * 4))
      val perChunk = (0 until chunkOffs.size).map { c =>
        scRuns.reverse.collectFirst { case (first, n) if first <= c + 1 => n }
          .getOrElse(throw new IllegalArgumentException("stsc covers no chunks"))
      }
      val offsets = Seq.newBuilder[Long]
      var si = 0
      perChunk.zip(chunkOffs).foreach { case (n, base) =>
        var off = base
        (0 until n).foreach { _ =>
          if (si < nSamples) { offsets += off; off += sizes(si); si += 1 }
        }
      }
      require(si == nSamples, s"chunk map covers $si of $nSamples samples")
      // stss (absent = every sample is sync)
      val sync = stbl.collectFirst { case ("stss", ss, _) =>
        (0 until r.u32(ss + 4).toInt).map(i => r.u32(ss + 8 + i * 4).toInt)
      }.getOrElse(1 to nSamples)
      // cumulative deltas → per-sample ts (start times)
      val ts = deltas.scanLeft(0L)(_ + _).dropRight(1)
        .map(_ * 1000L / trackTs)
      TrackInfo(trackId.toInt, handler, codec, trackTs.toInt,
        trackDur * 1000L / trackTs, nSamples, sync.toSeq, sizes,
        offsets.result(), ts)
    }
    require(tracks.nonEmpty, "moov has no trak")
    Mp4Info(brand, movieTs, movieDur * 1000L / movieTs, tracks)
  }

  /** The sample whose time span covers `tsMs` (floor; clamped), as
    * (1-based index, payload bytes) — training-pipeline frame/sample
    * extraction with zero bitstream decoding.
    */
  def sampleAt(payload: Array[Byte], info: TrackInfo, tsMs: Long): (Int, Array[Byte]) = {
    val idx0 = info.sampleTsMs.lastIndexWhere(_ <= math.max(0L, tsMs)) max 0
    val off = info.sampleOffsets(idx0)
    val sz = info.sampleSizes(idx0)
    (idx0 + 1, java.util.Arrays.copyOfRange(payload, off.toInt, (off + sz).toInt))
  }

  /** The nearest SYNC sample at or before `tsMs` — where a real player
    * (or frame extractor) starts decoding; 1-based like stss.
    */
  def syncSampleAt(info: TrackInfo, tsMs: Long): Int = {
    val idx0 = info.sampleTsMs.lastIndexWhere(_ <= math.max(0L, tsMs)) max 0
    info.syncSamples.filter(_ <= idx0 + 1).lastOption.getOrElse(info.syncSamples.head)
  }
}
