package graft.operators.multimodal

/** REAL FLAC codec (subset), pure JVM and from scratch — the lossless
  * audio container of archival/speech corpora. Implemented coverage:
  *
  *   - container: `fLaC` magic + STREAMINFO metadata block (incl. the
  *     spec's MD5 of the unencoded audio, verified on decode);
  *   - frames: fixed-blocksize strategy, UTF-8-coded frame numbers,
  *     16-bit samples, mono/stereo with ALL four stereo layouts —
  *     independent, left/side, right/side, mid/side (per-frame
  *     assignment, side channel at 17 bits, chosen by exact bit cost
  *     on encode when `decorrelate` is on) — CRC-8 header and CRC-16
  *     frame checks (verified on decode, loud on mismatch);
  *     wasted-bits subframes (shared trailing zero bits) encode
  *     narrower and decode exactly;
  *   - subframes: CONSTANT, VERBATIM, FIXED predictors order 0–4
  *     (the k-th-difference polynomial predictors), and LPC order
  *     1–32 (quantized linear prediction: coefficient precision,
  *     shift, and coefficients all read from the bitstream — decode
  *     needs no tables, and the integer predictor is exact), all with
  *     Rice-coded residuals (4-bit parameter, zigzag folding,
  *     escape-to-raw supported on decode). The encoder's LPC path
  *     ([[encode]]'s `lpcOrder`) estimates coefficients by
  *     Levinson–Durbin over the block's autocorrelation, quantizes
  *     them, and enters the candidate in the same exact-bit-cost
  *     contest as FIXED/VERBATIM — floats touch only the coefficient
  *     SEARCH; the emitted residuals and the decode are pure integer
  *     arithmetic, so round-trips are bit-exact regardless of
  *     estimation quality.
  *
  * Everything on the wire is exact integer arithmetic — no magic
  * tables beyond the two published CRC polynomials (0x07, 0x8005) —
  * so encode→decode round-trips are bit-exact and oracle-checkable
  * (`mm_flac_decode`/`mm_flac_lpc` re-derive every decoded sample
  * from the generator formula in SQL). >2 channels, variable
  * blocksize streams, and negative LPC shifts are out of subset scope
  * (decode fails loudly, never silently).
  *
  * Reference behavior: dtle ships typed column codecs for every wire
  * format it replicates (e.g. `drivers/mysql/binlog` value decoders);
  * this is the same completeness contract applied to the multimodal
  * column family.
  */
object FlacCodec extends Multimodal.MediaCodec {

  // ---------------------------------------------------------------- bits

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream(1 << 14)
    private var cur = 0
    private var n = 0
    private var nBits = 0L
    def bitCount: Long = nBits
    def writeBits(value: Long, bits: Int): Unit = {
      nBits += bits
      var i = bits - 1
      while (i >= 0) {
        cur = (cur << 1) | ((value >>> i) & 1L).toInt
        n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }
        i -= 1
      }
    }
    def writeUnary(q: Long): Unit = {
      var i = 0L
      while (i < q) { writeBits(0, 1); i += 1 }
      writeBits(1, 1)
    }
    def align(): Unit = if (n != 0) writeBits(0, 8 - n)
    def isAligned: Boolean = n == 0
    def bytes: Array[Byte] = { require(n == 0, "unaligned"); out.toByteArray }
    def size: Int = out.size()
  }

  private final class BitReader(bytes: Array[Byte], startByte: Int) {
    private var bitPos = startByte.toLong * 8
    def bytePos: Int = {
      require((bitPos & 7) == 0, "unaligned")
      (bitPos >> 3).toInt
    }
    def readBits(bits: Int): Long = {
      var v = 0L
      var i = 0
      while (i < bits) {
        val b = (bitPos >> 3).toInt
        require(b < bytes.length, "FLAC: truncated stream")
        v = (v << 1) | ((bytes(b) >> (7 - (bitPos & 7)).toInt) & 1).toLong
        bitPos += 1
        i += 1
      }
      v
    }
    def readSigned(bits: Int): Long = {
      val v = readBits(bits)
      if ((v & (1L << (bits - 1))) != 0) v - (1L << bits) else v
    }
    def readUnary(): Long = {
      var q = 0L
      while (readBits(1) == 0) q += 1
      q
    }
    def align(): Unit = bitPos = (bitPos + 7) & ~7L
  }

  // ---------------------------------------------------------------- crc

  /** CRC-8, polynomial x⁸+x²+x+1 (0x07), init 0 — the FLAC frame
    * header check.
    */
  def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial 0x8005, init 0 — the FLAC whole-frame check. */
  def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
        else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------- frame numbers

  /** FLAC's UTF-8-style variable-length code for frame numbers. */
  private def writeUtf8Number(w: BitWriter, v: Long): Unit = {
    require(v >= 0, "negative frame number")
    if (v < 0x80) w.writeBits(v, 8)
    else {
      // count payload bits → byte count
      var bytes = 2
      while (bytes < 7 && v >= (1L << (bytes * 5 + 1))) bytes += 1
      val lead = (0xff << (8 - bytes)) & 0xfe // bytes ones then a zero
      w.writeBits(lead | ((v >> ((bytes - 1) * 6)) & ((1 << (7 - bytes)) - 1)), 8)
      var i = bytes - 2
      while (i >= 0) {
        w.writeBits(0x80L | ((v >> (i * 6)) & 0x3f), 8)
        i -= 1
      }
    }
  }

  private def readUtf8Number(r: BitReader): Long = {
    val b0 = r.readBits(8).toInt
    if ((b0 & 0x80) == 0) b0.toLong
    else {
      var bytes = 0
      var mask = 0x80
      while ((b0 & mask) != 0) { bytes += 1; mask >>= 1 }
      require(bytes >= 2 && bytes <= 7, s"FLAC: bad UTF-8 lead byte $b0")
      var v = (b0 & (mask - 1)).toLong
      var i = 1
      while (i < bytes) {
        val c = r.readBits(8).toInt
        require((c & 0xc0) == 0x80, "FLAC: bad UTF-8 continuation")
        v = (v << 6) | (c & 0x3f)
        i += 1
      }
      v
    }
  }

  // ------------------------------------------------------------- predict

  /** k-th order fixed-predictor residuals (k-th differences). */
  private def residuals(s: Array[Long], order: Int): Array[Long] = {
    val out = new Array[Long](s.length - order)
    var i = order
    while (i < s.length) {
      out(i - order) = order match {
        case 0 => s(i)
        case 1 => s(i) - s(i - 1)
        case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
        case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
        case _ => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) + s(i - 4)
      }
      i += 1
    }
    out
  }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(u: Long): Long = (u >>> 1) ^ -(u & 1)

  /** Exact Rice size in bits for parameter k over folded residuals. */
  private def riceBits(folded: Array[Long], k: Int): Long = {
    var bits = 0L
    var i = 0
    while (i < folded.length) { bits += (folded(i) >>> k) + 1 + k; i += 1 }
    bits
  }

  // -------------------------------------------------------------- encode

  /** Levinson–Durbin: prediction coefficients a(1..order) minimizing
    * the least-squares error of x̂[i] = Σ a(j)·x[i−j] given the
    * block's autocorrelation. Returns None when the block can't
    * support the order (too short, all-zero, or the recursion loses
    * positive-definiteness) — the caller just skips the LPC candidate.
    * Textbook recursion; doubles are fine HERE because the
    * coefficients only steer compression — exactness lives in the
    * quantized-integer residual path.
    */
  private def levinsonDurbin(s: Array[Long], order: Int): Option[Array[Double]] = {
    val n = s.length
    if (n <= order) return None
    // Welch window before autocorrelation: the rectangular window's
    // edge bias scales with where the waveform happens to START (a
    // block opening on a peak skews r(lag) by whole percent), which
    // can make the estimated predictor worse than FIXED on exactly the
    // tonal signals LPC exists for — tapering the edges is the
    // standard cure (reference encoders window here too)
    val ws = new Array[Double](n)
    val half = (n - 1) / 2.0
    var t = 0
    while (t < n) {
      val x = (t - half) / (half + 1.0)
      ws(t) = s(t).toDouble * (1.0 - x * x)
      t += 1
    }
    val r = new Array[Double](order + 1)
    var lag = 0
    while (lag <= order) {
      var acc = 0.0
      var i = lag
      while (i < n) { acc += ws(i) * ws(i - lag); i += 1 }
      r(lag) = acc
      lag += 1
    }
    if (r(0) <= 0.0) return None // silence: CONSTANT/FIXED handle it
    val a = new Array[Double](order + 1)
    var err = r(0)
    var m = 1
    // err hitting ~0 mid-recursion is CONVERGENCE, not failure: the
    // signal is perfectly predicted at order m (a pure sinusoid
    // converges at 2) and the remaining coefficients stay 0 — bailing
    // out instead would drop the LPC candidate precisely on the
    // signals it models best
    var converged = false
    while (m <= order && !converged) {
      var acc = r(m)
      var j = 1
      while (j < m) { acc -= a(j) * r(m - j); j += 1 }
      val k = acc / err
      if (!java.lang.Double.isFinite(k)) converged = true
      else {
        val prev = java.util.Arrays.copyOf(a, order + 1)
        a(m) = k
        j = 1
        while (j < m) { a(j) = prev(j) - k * prev(m - j); j += 1 }
        err *= (1 - k * k)
        if (err <= r(0) * 1e-12) converged = true
        m += 1
      }
    }
    Some(java.util.Arrays.copyOfRange(a, 1, order + 1))
  }

  /** Quantize LPC coefficients to `precision`-bit integers with a
    * shared left-shift: the largest shift in [0, 15] that keeps every
    * rounded coefficient inside the signed `precision`-bit range.
    */
  private def quantizeLpc(coeffs: Array[Double], precision: Int): Option[(Array[Long], Int)] = {
    val cmax = coeffs.map(math.abs).max
    if (cmax == 0.0 || !java.lang.Double.isFinite(cmax)) return None
    val lim = (1L << (precision - 1)) - 1
    var shift = precision - 1 - (math.getExponent(cmax) + 1)
    if (shift > 15) shift = 15
    if (shift < 0) return None // coefficients too large for the subset's shift range
    val q = coeffs.map(c => math.max(-lim - 1, math.min(lim, math.round(c * (1L << shift)))))
    if (q.forall(_ == 0L)) None else Some((q, shift))
  }

  /** Exact integer LPC residuals: e[i] = s[i] − ((Σ q(j)·s[i−1−j]) >>
    * shift) — the decoder inverts this with the same arithmetic, so
    * the round trip is bit-exact for ANY (q, shift).
    */
  private def lpcResiduals(s: Array[Long], q: Array[Long], shift: Int): Array[Long] = {
    val order = q.length
    val out = new Array[Long](s.length - order)
    var i = order
    while (i < s.length) {
      var acc = 0L
      var j = 0
      while (j < order) { acc += q(j) * s(i - 1 - j); j += 1 }
      out(i - order) = s(i) - (acc >> shift)
      i += 1
    }
    out
  }

  /** Encode 16-bit PCM (interleaved when stereo) into a FLAC stream.
    * Per frame and channel the cheapest of CONSTANT / best FIXED
    * order / VERBATIM — plus, when `lpcOrder` ≥ 1, a quantized-LPC
    * candidate of that order (precision 14, Levinson–Durbin
    * coefficients) — is chosen by exact bit cost; subframes whose
    * samples share trailing zero bits use the spec's wasted-bits
    * header and encode narrower. With `decorrelate = true` each
    * STEREO frame additionally contests the four channel
    * representations (independent, left/side, right/side, mid/side —
    * the side channel at 17 bits per the spec) on exact subframe bit
    * cost, the way real encoders exploit inter-channel redundancy.
    */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short],
      blockSize: Int = 4096, lpcOrder: Int = 0,
      decorrelate: Boolean = false): Array[Byte] = {
    require(lpcOrder >= 0 && lpcOrder <= 32, s"lpcOrder $lpcOrder out of [0, 32]")
    require(channels == 1 || channels == 2, "subset: mono or stereo")
    require(sampleRate > 0 && sampleRate < (1 << 20), "bad sample rate")
    require(samples.length % channels == 0, "ragged interleave")
    // the spec's valid blocksize range: below 16 is reserved, above
    // 65535 won't fit the 16-bit (bs−1) header field — a larger
    // request would silently truncate and emit an undecodable archive
    require(blockSize >= 16 && blockSize <= 65535,
      s"blockSize $blockSize out of the spec range [16, 65535]")
    val nSamples = samples.length / channels
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val le = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(le.putShort)
    md5.update(le.array())

    val frames = new java.io.ByteArrayOutputStream(1 << 16)
    var frameIx = 0L
    var off = 0
    var minFrame = Int.MaxValue
    var maxFrame = 0
    while (off < nSamples) {
      val bs = math.min(blockSize, nSamples - off)
      val w = new BitWriter
      w.writeBits(0x3ffe, 14) // sync
      w.writeBits(0, 1) // reserved
      w.writeBits(0, 1) // fixed-blocksize strategy → frame number below
      // per-frame channel layout: independent by default; a stereo
      // frame under `decorrelate` picks the cheapest of the four
      // spec representations by exact subframe bit cost
      val perCh = Array.tabulate(channels) { ch =>
        val s = new Array[Long](bs)
        var i = 0
        while (i < bs) { s(i) = samples((off + i) * channels + ch); i += 1 }
        s
      }
      val (chAssign, subframes): (Int, Seq[(Array[Long], Int)]) =
        if (channels == 2 && decorrelate) {
          val l = perCh(0); val r = perCh(1)
          val side = Array.tabulate(bs)(i => l(i) - r(i)) // 17-bit
          val mid = Array.tabulate(bs)(i => (l(i) + r(i)) >> 1)
          // four DISTINCT subframe costs, computed once each (the four
          // layouts share them pairwise — re-encoding per candidate
          // would double the contest's CPU for identical output)
          val cL = subframeBits(l, lpcOrder, 16)
          val cR = subframeBits(r, lpcOrder, 16)
          val cS = subframeBits(side, lpcOrder, 17)
          val cM = subframeBits(mid, lpcOrder, 16)
          val candidates = Seq(
            (1, cL + cR, Seq((l, 16), (r, 16))), // independent
            (8, cL + cS, Seq((l, 16), (side, 17))), // left/side
            (9, cS + cR, Seq((side, 17), (r, 16))), // right/side
            (10, cM + cS, Seq((mid, 16), (side, 17)))) // mid/side
          val best = candidates.minBy(_._2)
          (best._1, best._3)
        } else (channels - 1, perCh.toSeq.map(s => (s, 16)))
      w.writeBits(0x7, 4) // blocksize: 16-bit field at header end
      w.writeBits(0x0, 4) // sample rate: from STREAMINFO
      w.writeBits(chAssign, 4)
      w.writeBits(0x4, 3) // 16-bit samples
      w.writeBits(0, 1) // reserved
      writeUtf8Number(w, frameIx)
      w.writeBits(bs - 1, 16)
      require(w.isAligned, "header must be byte-aligned")
      // CRC-8 over the header bytes written so far
      val headerCopy = w.bytes
      w.writeBits(crc8(headerCopy, 0, headerCopy.length), 8)
      subframes.foreach { case (s, bps) => writeSubframe(w, s, lpcOrder, bps) }
      w.align()
      val body = w.bytes // byte-aligned by construction; CRC-16 is two
      val crc = crc16(body, 0, body.length) // whole bytes — append directly
      frames.write(body)
      frames.write((crc >> 8) & 0xff)
      frames.write(crc & 0xff)
      val frameLen = body.length + 2
      if (frameLen < minFrame) minFrame = frameLen
      if (frameLen > maxFrame) maxFrame = frameLen
      off += bs
      frameIx += 1
    }
    if (nSamples == 0) { minFrame = 0; maxFrame = 0 }

    val head = new BitWriter
    head.writeBits('f', 8); head.writeBits('L', 8)
    head.writeBits('a', 8); head.writeBits('C', 8)
    head.writeBits(1, 1) // last metadata block
    head.writeBits(0, 7) // STREAMINFO
    head.writeBits(34, 24)
    head.writeBits(blockSize, 16) // min/max block size (all frames but the last)
    head.writeBits(blockSize, 16)
    head.writeBits(minFrame, 24)
    head.writeBits(maxFrame, 24)
    head.writeBits(sampleRate, 20)
    head.writeBits(channels - 1, 3)
    head.writeBits(15, 5) // bps − 1
    head.writeBits(nSamples.toLong, 36)
    md5.digest().foreach(b => head.writeBits(b & 0xffL, 8))
    val out = new java.io.ByteArrayOutputStream(frames.size() + 64)
    out.write(head.bytes)
    frames.writeTo(out)
    out.toByteArray
  }

  private val LpcPrecision = 14 // stored as precision−1 in the 4-bit field

  /** Exact bit size of [[writeSubframe]] for `s` — encodes into a
    * scratch writer; used by the stereo-decorrelation contest where
    * four channel representations compete on true cost.
    */
  private def subframeBits(s: Array[Long], lpcOrder: Int, bps: Int): Long = {
    val scratch = new BitWriter
    writeSubframe(scratch, s, lpcOrder, bps)
    scratch.bitCount
  }

  private def writeSubframe(w: BitWriter, s: Array[Long], lpcOrder: Int,
      bps: Int = 16): Unit = {
    val bs = s.length
    val constant = bs > 0 && s.forall(_ == s(0))
    if (constant) {
      w.writeBits(0, 1); w.writeBits(0, 6); w.writeBits(0, 1)
      w.writeBits(s(0) & ((1L << bps) - 1), bps)
      return
    }
    // wasted bits: samples sharing w trailing zero bits encode at
    // bps−w with the spec's flag+unary(w−1) header — near-silence and
    // upscaled audio compress materially better, and the decode path
    // gets exercised by round trips instead of only hand-built streams
    val orAll = s.foldLeft(0L)(_ | _)
    val wasted = math.min(java.lang.Long.numberOfTrailingZeros(orAll), bps - 1)
    if (wasted > 0) {
      val shifted = s.map(_ >> wasted)
      writeSubframeBody(w, shifted, lpcOrder, bps - wasted, wasted)
      return
    }
    writeSubframeBody(w, s, lpcOrder, bps, 0)
  }

  private def writeSubframeBody(w: BitWriter, s: Array[Long], lpcOrder: Int,
      bps: Int, wasted: Int): Unit = {
    val bs = s.length
    def bestRice(folded: Array[Long]): (Int, Long) = {
      var bk = 0; var bb = Long.MaxValue
      var k = 0
      while (k <= 14) {
        val bits = riceBits(folded, k)
        if (bits < bb) { bb = bits; bk = k }
        k += 1
      }
      (bk, bb)
    }
    // best fixed order by exact cost; verbatim as the ceiling
    var bestOrder = -1
    var bestK = 0
    var bestBits = bps.toLong * bs // verbatim cost
    var order = 0
    while (order <= math.min(4, bs - 1)) {
      val folded = residuals(s, order).map(zigzag)
      val (k, rb) = bestRice(folded)
      val bits = bps.toLong * order + 2 + 4 + 4 + rb
      if (bits < bestBits) { bestBits = bits; bestOrder = order; bestK = k }
      order += 1
    }
    // the LPC candidate: Levinson–Durbin coefficients, quantized, entered
    // in the same exact-bit-cost contest (header size included)
    val lpc =
      if (lpcOrder < 1 || bs <= lpcOrder) None
      else levinsonDurbin(s, lpcOrder).flatMap(quantizeLpc(_, LpcPrecision)).flatMap {
        case (q, shift) =>
          val folded = lpcResiduals(s, q, shift).map(zigzag)
          val (k, rb) = bestRice(folded)
          val bits = bps.toLong * lpcOrder + 4 + 5 + lpcOrder.toLong * LpcPrecision + 2 + 4 + 4 + rb
          if (bits < bestBits) Some((q, shift, k, bits)) else None
      }
    def writeResiduals(res: Array[Long], k: Int): Unit = {
      w.writeBits(0, 2) // residual method: 4-bit Rice
      w.writeBits(0, 4) // partition order 0
      w.writeBits(k, 4)
      res.foreach { r =>
        val u = zigzag(r)
        w.writeUnary(u >>> k)
        if (k > 0) w.writeBits(u & ((1L << k) - 1), k)
      }
    }
    def writeWasted(): Unit =
      if (wasted == 0) w.writeBits(0, 1)
      else { w.writeBits(1, 1); w.writeUnary(wasted - 1) } // k wasted → k−1 zeros, 1
    val mask = (1L << bps) - 1
    lpc match {
      case Some((q, shift, k, _)) =>
        w.writeBits(0, 1)
        w.writeBits(0x20 | (lpcOrder - 1), 6) // LPC, 0b1xxxxx
        writeWasted()
        var i = 0
        while (i < lpcOrder) { w.writeBits(s(i) & mask, bps); i += 1 }
        w.writeBits(LpcPrecision - 1, 4)
        w.writeBits(shift, 5) // non-negative by construction
        q.foreach(c => w.writeBits(c & ((1L << LpcPrecision) - 1), LpcPrecision))
        writeResiduals(lpcResiduals(s, q, shift), k)
      case None if bestOrder < 0 =>
        w.writeBits(0, 1); w.writeBits(1, 6) // VERBATIM
        writeWasted()
        s.foreach(v => w.writeBits(v & mask, bps))
      case None =>
        w.writeBits(0, 1)
        w.writeBits(8 | bestOrder, 6) // FIXED, 0b001xxx
        writeWasted()
        var i = 0
        while (i < bestOrder) { w.writeBits(s(i) & mask, bps); i += 1 }
        writeResiduals(residuals(s, bestOrder), bestK)
    }
  }

  // -------------------------------------------------------------- decode

  /** Decode a (subset) FLAC stream: `(sampleRate, channels,
    * interleaved 16-bit samples)`. Verifies the magic, CRC-8 per
    * frame header, CRC-16 per frame, and the STREAMINFO MD5 of the
    * decoded audio — any mismatch fails loudly.
    */
  def decode(payload: Array[Byte]): (Int, Int, Array[Short]) = {
    require(payload.length >= 42 &&
      payload(0) == 'f' && payload(1) == 'L' && payload(2) == 'a' && payload(3) == 'C',
      "not a fLaC stream")
    var pos = 4
    var rate = -1; var channels = -1; var total = -1L
    var md5Expect: Array[Byte] = null
    var last = false
    while (!last) {
      val h = payload(pos) & 0xff
      last = (h & 0x80) != 0
      val btype = h & 0x7f
      val len = ((payload(pos + 1) & 0xff) << 16) | ((payload(pos + 2) & 0xff) << 8) |
        (payload(pos + 3) & 0xff)
      if (btype == 0) {
        val r = new BitReader(payload, pos + 4)
        r.readBits(16); r.readBits(16); r.readBits(24); r.readBits(24)
        rate = r.readBits(20).toInt
        channels = r.readBits(3).toInt + 1
        val bps = r.readBits(5).toInt + 1
        require(bps == 16, s"subset: 16-bit only, stream has $bps")
        total = r.readBits(36)
        md5Expect = java.util.Arrays.copyOfRange(payload, pos + 4 + 18, pos + 4 + 34)
      }
      pos += 4 + len
    }
    require(rate > 0 && channels >= 1, "FLAC: missing STREAMINFO")
    require(channels <= 2, "subset: mono or stereo")
    val out = new Array[Short]((total * channels).toInt)
    var filled = 0L
    while (filled < total) {
      val frameStart = pos
      val r = new BitReader(payload, pos)
      require(r.readBits(14) == 0x3ffe, "FLAC: lost frame sync")
      r.readBits(1)
      val blockingStrategy = r.readBits(1)
      val bsCode = r.readBits(4).toInt
      val srCode = r.readBits(4).toInt
      val chAssign = r.readBits(4).toInt
      Option(assignLog.get).foreach(_ += chAssign)
      // 0..7 = independent (count−1); 8/9/10 = stereo decorrelation
      // (left/side, right/side, mid/side — side at bps+1)
      val decor = chAssign match {
        case c if c <= 7 => require(c == channels - 1,
          s"FLAC: frame has ${c + 1} channels, STREAMINFO says $channels"); 0
        case c if c <= 10 => require(channels == 2,
          s"FLAC: stereo decorrelation in a $channels-channel stream"); c - 7
        case c => sys.error(s"FLAC: reserved channel assignment $c")
      }
      val ssCode = r.readBits(3).toInt
      require(ssCode == 4, s"subset: 16-bit frames only, code $ssCode")
      r.readBits(1)
      readUtf8Number(r) // frame number (fixed) or sample number
      require(blockingStrategy == 0, "subset: fixed blocksize streams")
      val bs = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.readBits(8).toInt + 1
        case 7 => r.readBits(16).toInt + 1
        case c if c >= 8 => 256 << (c - 8)
        case c => sys.error(s"FLAC: reserved blocksize code $c")
      }
      srCode match {
        case 0 => ()
        case 12 => r.readBits(8)
        case 13 | 14 => r.readBits(16)
        case c if c < 12 => () // table-coded rates carry no extra bytes
        case c => sys.error(s"FLAC: bad sample-rate code $c")
      }
      val headerEnd = r.bytePos
      val crcRead = r.readBits(8).toInt
      require(crcRead == crc8(payload, frameStart, headerEnd),
        "FLAC: frame header CRC-8 mismatch")
      val chans = Array.ofDim[Long](channels, bs)
      var ch = 0
      while (ch < channels) {
        // the side channel of a decorrelated pair carries one extra bit
        val bps = decor match {
          case 1 if ch == 1 => 17 // left/side
          case 2 if ch == 0 => 17 // right(side first)/side
          case 3 if ch == 1 => 17 // mid/side
          case _ => 16
        }
        readSubframe(r, chans(ch), bs, bps)
        ch += 1
      }
      // undo inter-channel decorrelation — exact integer inverses
      if (decor != 0) {
        var i = 0
        while (i < bs) {
          decor match {
            case 1 => chans(1)(i) = chans(0)(i) - chans(1)(i) // R = L − side
            case 2 => chans(0)(i) = chans(1)(i) + chans(0)(i) // L = R + side
            case _ => // mid/side: (L+R) parity rides in side's low bit
              val side = chans(1)(i)
              val m2 = (chans(0)(i) << 1) | (side & 1L)
              chans(0)(i) = (m2 + side) >> 1
              chans(1)(i) = (m2 - side) >> 1
          }
          i += 1
        }
      }
      r.align()
      val bodyEnd = r.bytePos
      val crc16Read = r.readBits(16).toInt
      require(crc16Read == crc16(payload, frameStart, bodyEnd),
        "FLAC: frame CRC-16 mismatch")
      pos = bodyEnd + 2
      var i = 0
      while (i < bs) {
        var c = 0
        while (c < channels) {
          out(((filled + i) * channels + c).toInt) = chans(c)(i).toShort
          c += 1
        }
        i += 1
      }
      filled += bs
    }
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val le = java.nio.ByteBuffer.allocate(out.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.foreach(le.putShort)
    md5.update(le.array())
    require(java.util.Arrays.equals(md5.digest(), md5Expect),
      "FLAC: decoded audio MD5 does not match STREAMINFO")
    (rate, channels, out)
  }

  /** Per-frame channel-assignment codes of a stereo stream — test
    * hook for pinning which layout the encode contest chose (a suite
    * that never checks this could leave a decorrelated decode branch
    * unexercised while staying green on round trips that all picked
    * independent). Decodes the stream fully, recording each frame's
    * 4-bit assignment field.
    */
  private[graft] def frameChannelAssignments(payload: Array[Byte]): Seq[Int] = {
    assignLog.set(scala.collection.mutable.ArrayBuffer.empty[Int])
    try { decode(payload); assignLog.get.toSeq }
    finally assignLog.remove()
  }

  private val assignLog =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[Int]]

  private def readSubframe(r: BitReader, dst: Array[Long], bs: Int,
      frameBps: Int = 16): Unit = {
    require(r.readBits(1) == 0, "FLAC: subframe padding bit set")
    val ty = r.readBits(6).toInt
    // wasted bits: flag, then unary (k−1 zeros and a 1) — samples are
    // coded k bits narrower and shift back up after reconstruction
    val wasted = if (r.readBits(1) == 0) 0 else (r.readUnary() + 1).toInt
    require(wasted < frameBps, s"FLAC: $wasted wasted bits of $frameBps")
    val bps = frameBps - wasted
    if (ty == 0) { // CONSTANT
      val v = r.readSigned(bps)
      java.util.Arrays.fill(dst, v)
    } else if (ty == 1) { // VERBATIM
      var i = 0
      while (i < bs) { dst(i) = r.readSigned(bps); i += 1 }
    } else if ((ty & 0x38) == 0x08) { // FIXED
      val order = ty & 0x7
      require(order <= 4, s"FLAC: bad fixed order $order")
      var i = 0
      while (i < order) { dst(i) = r.readSigned(bps); i += 1 }
      readResiduals(r, dst, bs, order)
      // undo the prediction
      i = order
      while (i < bs) {
        dst(i) = order match {
          case 0 => dst(i)
          case 1 => dst(i) + dst(i - 1)
          case 2 => dst(i) + 2 * dst(i - 1) - dst(i - 2)
          case 3 => dst(i) + 3 * dst(i - 1) - 3 * dst(i - 2) + dst(i - 3)
          case _ => dst(i) + 4 * dst(i - 1) - 6 * dst(i - 2) + 4 * dst(i - 3) - dst(i - 4)
        }
        i += 1
      }
    } else if ((ty & 0x20) == 0x20) { // LPC, order 1..32
      val order = (ty & 0x1f) + 1
      require(bs > order, s"FLAC: LPC order $order needs more than $order samples")
      var i = 0
      while (i < order) { dst(i) = r.readSigned(bps); i += 1 }
      val precRaw = r.readBits(4).toInt
      require(precRaw != 15, "FLAC: invalid LPC coefficient precision 1111")
      val precision = precRaw + 1
      val shift = r.readSigned(5)
      // the spec field is signed but a negative shift never occurs in
      // practice (reference encoders clamp at 0) — fail loudly rather
      // than guess left-shift semantics
      require(shift >= 0, s"subset: negative LPC shift $shift unsupported")
      val coef = new Array[Long](order)
      i = 0
      while (i < order) { coef(i) = r.readSigned(precision); i += 1 }
      readResiduals(r, dst, bs, order)
      // undo the prediction — exact integer arithmetic: coef(j) applies
      // to the j-th most recent reconstructed sample, the accumulated
      // product arithmetic-shifts right by `shift`
      i = order
      while (i < bs) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coef(j) * dst(i - 1 - j); j += 1 }
        dst(i) += acc >> shift.toInt
        i += 1
      }
    } else sys.error(s"subset: unsupported subframe type $ty")
    if (wasted > 0) {
      var i = 0
      while (i < bs) { dst(i) = dst(i) << wasted; i += 1 }
    }
  }

  /** Rice-partitioned residual block (shared by FIXED and LPC): 2-bit
    * method (4-bit Rice only in subset), 4-bit partition order, per
    * partition a 4-bit parameter with k=15 escaping to raw n-bit
    * residuals.
    */
  private def readResiduals(r: BitReader, dst: Array[Long], bs: Int, order: Int): Unit = {
    require(r.readBits(2) == 0, "subset: 4-bit Rice residual only")
    val partOrder = r.readBits(4).toInt
    val nParts = 1 << partOrder
    require(bs % nParts == 0, "FLAC: partition size not integral")
    var part = 0
    var idx = order
    while (part < nParts) {
      val k = r.readBits(4).toInt
      val count = (bs >> partOrder) - (if (part == 0) order else 0)
      if (k == 15) { // escape: raw n-bit residuals
        val raw = r.readBits(5).toInt
        var j = 0
        while (j < count) { dst(idx) = r.readSigned(raw); idx += 1; j += 1 }
      } else {
        var j = 0
        while (j < count) {
          val u = (r.readUnary() << k) | (if (k > 0) r.readBits(k) else 0L)
          dst(idx) = unzigzag(u)
          idx += 1; j += 1
        }
      }
      part += 1
    }
  }

  // ----------------------------------------------------- MediaCodec glue

  /** Same `dim`-cell RMS grid as the WAV path — FLAC and WAV payloads
    * of the same audio produce identical features.
    */
  override def decodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val (_, _, s) = decode(payload)
    val n = math.max(1, s.length)
    val sums = new Array[Long](dim); val counts = new Array[Long](dim)
    var i = 0
    while (i < s.length) {
      val cell = (i.toLong * dim / n).toInt
      sums(cell) += s(i).toLong * s(i); counts(cell) += 1
      i += 1
    }
    Array.tabulate(dim)(i =>
      if (counts(i) == 0) 0f
      else math.sqrt(sums(i).toDouble / counts(i)).toFloat)
  }

  /** Resample to `w*h` FRAMES (per-channel nearest-frame — stereo
    * stays channel-true and the interleave stays integral), re-encoded
    * as FLAC.
    */
  override def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val (rate, ch, s) = decode(payload)
    val nFrames = s.length / ch
    val target = math.max(1, w * h)
    val out = new Array[Short](target * ch)
    var i = 0
    while (i < target) {
      val src = if (nFrames == 0) 0 else math.min(nFrames - 1, (i.toLong * nFrames / target).toInt)
      var c = 0
      while (c < ch) { out(i * ch + c) = s(src * ch + c); c += 1 }
      i += 1
    }
    if (nFrames == 0) encode(rate, ch, Array.empty[Short])
    else encode(rate, ch, out)
  }
}
