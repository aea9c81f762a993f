package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.multimodal.{FlacCodec, Multimodal}

/** From-scratch FLAC subset: bit-exact round trips across subframe
  * types, CRC enforcement, and feature parity with the WAV path.
  */
class FlacCodecSpec extends AnyFunSuite {

  private def roundTrip(rate: Int, ch: Int, s: Array[Short], bs: Int = 4096,
      lpcOrder: Int = 0): Unit = {
    val enc = FlacCodec.encode(rate, ch, s, bs, lpcOrder)
    val (r2, c2, s2) = FlacCodec.decode(enc)
    assert(r2 == rate && c2 == ch)
    assert(java.util.Arrays.equals(s, s2),
      s"round trip lost samples (n=${s.length}, bs=$bs, lpcOrder=$lpcOrder)")
  }

  // sampled sinusoid: a 16-point integer sine table — exactly the shape
  // LPC models (two poles on the unit circle) and polynomial FIXED
  // predictors cannot (their residual keeps the sine's amplitude scale)
  private val Sine16 = Array(0, 383, 707, 924, 1000, 924, 707, 383,
    0, -383, -707, -924, -1000, -924, -707, -383)
  private def tonal(n: Int, freq: Int = 1, amp: Int = 1): Array[Short] =
    Array.tabulate(n)(t => (Sine16((t * freq) % 16) * amp).toShort)

  test("LPC subframes round-trip bit-exactly and WIN the cost contest on tonal audio") {
    // round trips at several orders, block sizes, frequencies, amplitudes
    roundTrip(8000, 1, tonal(2000), lpcOrder = 2)
    roundTrip(8000, 1, tonal(2000, freq = 3, amp = 4), lpcOrder = 8)
    roundTrip(8000, 1, tonal(1537, freq = 5, amp = 2), bs = 192, lpcOrder = 12)
    roundTrip(8000, 1, tonal(700).zipWithIndex.map { case (v, i) => // tonal + drift
      (v + i / 10).toShort }, bs = 256, lpcOrder = 8)
    // stereo: per-channel independent LPC subframes
    roundTrip(8000, 2, Array.tabulate(2400)(i =>
      (Sine16((i / 2 * (1 + i % 2 * 2)) % 16) * (1 + i % 2)).toShort), lpcOrder = 4)
    // a two-pole sinusoid is near-perfectly linearly predictable: the
    // LPC stream must be MUCH smaller than the best FIXED encoding
    // (residual ~quantization noise vs ~7.6% of amplitude) — this
    // proves the cost contest actually selected LPC subframes
    val s = tonal(4000, freq = 1, amp = 4)
    val fixedOnly = FlacCodec.encode(8000, 1, s, 4096, lpcOrder = 0)
    val withLpc = FlacCodec.encode(8000, 1, s, 4096, lpcOrder = 2)
    assert(withLpc.length < fixedOnly.length * 3 / 4,
      s"LPC did not win on a sinusoid: ${withLpc.length} vs ${fixedOnly.length}")
    assert(java.util.Arrays.equals(FlacCodec.decode(withLpc)._3, s))
    // lpcOrder = 0 stays byte-identical to the historical encoder
    assert(java.util.Arrays.equals(FlacCodec.encode(8000, 1, s, 4096),
      FlacCodec.encode(8000, 1, s, 4096, lpcOrder = 0)))
  }

  test("stereo decorrelation: all four channel layouts round-trip; correlated audio shrinks") {
    // R tracks L with a small offset → the side channel is tiny and a
    // decorrelated layout must win the per-frame contest
    val n = 3000
    val inter = new Array[Short](2 * n)
    for (t <- 0 until n) {
      val l = Sine16(t % 16) * 3
      inter(2 * t) = l.toShort
      inter(2 * t + 1) = (l - ((t % 7) - 3)).toShort
    }
    val indep = FlacCodec.encode(8000, 2, inter, 512, lpcOrder = 2)
    val decor = FlacCodec.encode(8000, 2, inter, 512, lpcOrder = 2, decorrelate = true)
    assert(decor.length < indep.length,
      s"decorrelation must pay on correlated stereo: ${decor.length} vs ${indep.length}")
    assert(java.util.Arrays.equals(FlacCodec.decode(decor)._3, inter))
    assert(java.util.Arrays.equals(FlacCodec.decode(indep)._3, inter))
    // the winning layout is PINNED per signal shape (via the frame
    // header's assignment code), so every decorrelated decode branch
    // is provably exercised — a suite asserting only round trips could
    // go green while the contest quietly picked independent everywhere
    val decorAssigns = FlacCodec.frameChannelAssignments(decor)
    assert(decorAssigns.forall(Set(8, 9, 10)),
      s"correlated stereo must pick a decorrelated layout: $decorAssigns")
    assert(FlacCodec.frameChannelAssignments(indep).forall(_ == 1))

    // anticorrelated loud channels (R = −L, amp ~30k): side = 2L NEEDS
    // the 17th bit ON THE WIRE (|side| up to 60004) and mid collapses
    // to near-silence → mid/side must win, and a masking bug in the
    // 17-bit warm-up/verbatim path cannot hide
    val anti = new Array[Short](2 * n)
    for (t <- 0 until n) {
      val l = Sine16((t * 3) % 16) * 30 + (t % 3)
      anti(2 * t) = l.toShort
      anti(2 * t + 1) = (-l).toShort
    }
    assert((0 until n).map(t => math.abs(anti(2 * t) - anti(2 * t + 1))).max > 32768,
      "the anti signal must actually need 17-bit side samples")
    val a = FlacCodec.encode(8000, 2, anti, 512, lpcOrder = 2, decorrelate = true)
    assert(java.util.Arrays.equals(FlacCodec.decode(a)._3, anti))
    val antiAssigns = FlacCodec.frameChannelAssignments(a)
    assert(antiAssigns.forall(_ == 10),
      s"mid/side must win on anticorrelated audio: $antiAssigns")
    // decorrelation never loses: the independent layout is in the contest
    assert(a.length <= FlacCodec.encode(8000, 2, anti, 512, lpcOrder = 2).length)

    // asymmetric noise: the noisy channel is shared, the tonal add-on
    // sits on ONE side — side = ±tonal is the cheap subframe, and the
    // pure-noise channel is cheaper than the noise+tonal one, so
    // left/side wins when L is the quiet one and right/side when R is:
    // both remaining decode branches run against real bitstreams
    var x = 7L
    def noise(): Int = {
      x = (x * 1103515245L + 12345L) & 0x7fffffffL; ((x % 8000) - 4000).toInt
    }
    val m = 1000
    val rsSig = new Array[Short](2 * m) // L carries the tonal → R/S
    x = 7L
    for (t <- 0 until m) {
      val nz = noise()
      rsSig(2 * t) = (nz + Sine16(t % 16) * 8).toShort
      rsSig(2 * t + 1) = nz.toShort
    }
    val rs = FlacCodec.encode(8000, 2, rsSig, 4096, lpcOrder = 8, decorrelate = true)
    assert(java.util.Arrays.equals(FlacCodec.decode(rs)._3, rsSig))
    val rsAssigns = FlacCodec.frameChannelAssignments(rs)
    assert(rsAssigns == Seq(9),
      s"right/side must win when R is the cheap channel: $rsAssigns")
    val lsSig = new Array[Short](2 * m) // R carries the tonal → L/S
    x = 7L
    for (t <- 0 until m) {
      val nz = noise()
      lsSig(2 * t) = nz.toShort
      lsSig(2 * t + 1) = (nz + Sine16(t % 16) * 8).toShort
    }
    val ls = FlacCodec.encode(8000, 2, lsSig, 4096, lpcOrder = 8, decorrelate = true)
    assert(java.util.Arrays.equals(FlacCodec.decode(ls)._3, lsSig))
    val lsAssigns = FlacCodec.frameChannelAssignments(ls)
    assert(lsAssigns == Seq(8),
      s"left/side must win when L is the cheap channel: $lsAssigns")
  }

  test("the 17-bit side BOUNDARY (±65535) rides the wire through a decorrelated frame") {
    // L pinned near +32767 and R near −32768 (and mirrored): their sum
    // is the CONSTANT −1 (mid = −1 every sample) while side = ±65535 ∓
    // 2a(t) sweeps the extreme of the 17-bit range — mid/side wins by
    // construction, so the warm-up/verbatim/Rice paths carry true
    // boundary side samples, where a 16-bit mask bug would corrupt
    for (mirror <- Seq(false, true)) {
      val n = 1200
      val inter = new Array[Short](2 * n)
      var sideMax = 0L
      for (t <- 0 until n) {
        val a = (Sine16(t % 16) + 1000) / 2 // 0..1000, hits 0 at t%16==12
        val (l, r) = if (mirror) (-32768 + a, 32767 - a) else (32767 - a, -32768 + a)
        inter(2 * t) = l.toShort
        inter(2 * t + 1) = r.toShort
        sideMax = math.max(sideMax, math.abs(l.toLong - r))
      }
      assert(sideMax == 65535L, s"fixture drift: max |side| $sideMax")
      val e = FlacCodec.encode(8000, 2, inter, 256, lpcOrder = 2, decorrelate = true)
      assert(java.util.Arrays.equals(FlacCodec.decode(e)._3, inter),
        s"boundary side samples corrupted (mirror=$mirror)")
      val assigns = FlacCodec.frameChannelAssignments(e)
      assert(assigns.forall(_ == 10),
        s"mid/side must win on the boundary fixture (mirror=$mirror): $assigns")
    }
  }

  test("wasted bits: shared trailing zeros encode narrower and decode exactly") {
    val base = tonal(900, freq = 3, amp = 1)
    val scaled = base.map(v => (v * 8).toShort) // 3 shared trailing zero bits
    roundTrip(8000, 1, scaled, bs = 300)
    roundTrip(8000, 1, scaled, bs = 300, lpcOrder = 4)
    // ×8 costs ~3 extra bits/sample under plain Rice; wasted-bits
    // coding shaves them — the scaled stream must stay within header
    // pennies of the unscaled one instead of ~340 bytes above it
    val lenBase = FlacCodec.encode(8000, 1, base, 300).length
    val lenScaled = FlacCodec.encode(8000, 1, scaled, 300).length
    assert(lenScaled <= lenBase + 16,
      s"wasted-bits coding missing: $lenScaled vs $lenBase")
    // mixed: one channel scaled, one not, under decorrelation
    val mix = new Array[Short](1200)
    for (t <- 0 until 600) {
      mix(2 * t) = (Sine16(t % 16) * 4).toShort
      mix(2 * t + 1) = (t % 3 - 1).toShort
    }
    val m = FlacCodec.encode(8000, 2, mix, 200, lpcOrder = 2, decorrelate = true)
    assert(java.util.Arrays.equals(FlacCodec.decode(m)._3, mix))
  }

  test("LPC on noise never loses: the contest falls back when LPC doesn't pay") {
    var x = 99L
    val noise = Array.fill(1200) {
      x = (x * 1103515245L + 12345L) & 0x7fffffffL; ((x % 50000) - 25000).toShort
    }
    // correctness is unconditional on the chosen subframe type
    roundTrip(48000, 1, noise, lpcOrder = 8)
    // and enabling LPC can only ever shrink-or-match the stream
    assert(FlacCodec.encode(48000, 1, noise, 4096, lpcOrder = 8).length <=
      FlacCodec.encode(48000, 1, noise, 4096).length)
  }

  test("malformed LPC streams fail loudly: negative shift, precision 1111, truncation") {
    val good = FlacCodec.encode(8000, 1, tonal(300), 4096, lpcOrder = 2)
    assert(java.util.Arrays.equals(FlacCodec.decode(good)._3, tonal(300)))
    // stream layout (pinned): fLaC+STREAMINFO = 42 bytes, frame header
    // 4 + utf8 frameno 1 + 16-bit blocksize 2 + crc8 1 = 8, so the
    // subframe header byte sits at 50 (0b0_100001_0: LPC order 2) and
    // the precision/shift byte at 55 (1101 = precision−1, 01100 =
    // shift 12 → 0xD6 with the shift's sign bit at mask 0x08)
    assert(good(50) == 0x42.toByte, f"layout drift: subframe byte ${good(50)}%02x")
    assert(good(55) == 0xD6.toByte, f"layout drift: precision/shift byte ${good(55)}%02x")
    val negShift = good.clone(); negShift(55) = (negShift(55) | 0x08).toByte
    val e1 = intercept[IllegalArgumentException] { FlacCodec.decode(negShift) }
    assert(e1.getMessage.contains("negative LPC shift"), e1.getMessage)
    val badPrec = good.clone(); badPrec(55) = (badPrec(55) | 0xF0).toByte
    val e2 = intercept[IllegalArgumentException] { FlacCodec.decode(badPrec) }
    assert(e2.getMessage.contains("precision"), e2.getMessage)
    intercept[IllegalArgumentException] {
      FlacCodec.decode(good.take(60)) // truncated inside the LPC frame
    }
  }

  test("round trips: constant, ramp, curved, pseudo-noise, negatives, stereo") {
    roundTrip(44100, 1, Array.fill(500)(1234.toShort)) // CONSTANT subframes
    roundTrip(22050, 1, Array.tabulate(777)(i => (i - 300).toShort)) // order-1 wins
    roundTrip(16000, 1, Array.tabulate(1000)(i => ((i * i) % 2800 - 1400).toShort)) // curvature
    // LCG noise: verbatim-or-high-k territory
    val noise = {
      var x = 12345L
      Array.fill(900) { x = (x * 1103515245L + 12345L) & 0x7fffffffL; ((x % 60000) - 30000).toShort }
    }
    roundTrip(48000, 1, noise)
    roundTrip(8000, 2, Array.tabulate(1200)(i =>
      (if (i % 2 == 0) i % 5000 - 2500 else -(i % 3000)).toShort)) // stereo interleave
  }

  test("multi-frame streams and UTF-8 frame numbers past one byte") {
    // 200 frames of 64 samples → frame numbers cross the 128 boundary
    val s = Array.tabulate(12800)(i => ((i * 7) % 9001 - 4500).toShort)
    roundTrip(32000, 1, s, bs = 64)
    // ragged tail frame
    roundTrip(32000, 1, s.take(12801 - 64 + 13), bs = 64)
  }

  test("tiny and empty signals") {
    roundTrip(8000, 1, Array[Short](42))
    roundTrip(8000, 1, Array.tabulate(3)(i => (i * 100).toShort)) // bs > n, order capped
    roundTrip(8000, 1, Array.empty[Short])
  }

  test("corruption fails loudly: header CRC-8, frame CRC-16, MD5, truncation") {
    val s = Array.tabulate(600)(i => ((i * 13) % 4001 - 2000).toShort)
    val enc = FlacCodec.encode(44100, 1, s, 256)
    // STREAMINFO is 4 (magic) + 4 (block header) + 34 bytes; frames follow
    val frameStart = 42
    val headerHit = enc.clone
    headerHit(frameStart + 4) = (headerHit(frameStart + 4) ^ 0x01).toByte // inside frame header
    intercept[Exception](FlacCodec.decode(headerHit))
    val bodyHit = enc.clone
    bodyHit(frameStart + 20) = (bodyHit(frameStart + 20) ^ 0x40).toByte // inside subframe data
    intercept[Exception](FlacCodec.decode(bodyHit))
    // damaging the stored md5 must be caught by the end-of-decode check
    val md5FieldHit = enc.clone
    md5FieldHit(8 + 18 + 3) = (md5FieldHit(8 + 18 + 3) ^ 0x01).toByte
    intercept[Exception](FlacCodec.decode(md5FieldHit))
    intercept[Exception](FlacCodec.decode(java.util.Arrays.copyOf(enc, enc.length - 3)))
    intercept[Exception](FlacCodec.decode("not flac at all".getBytes("US-ASCII")))
  }

  test("feature parity with the WAV path on identical audio") {
    val s = Array.tabulate(2000)(i => ((i * 31) % 12000 - 6000).toShort)
    val viaFlac = FlacCodec.decodeFeatures(FlacCodec.encode(16000, 1, s), 16)
    val viaWav = Multimodal.WavCodec.decodeFeatures(
      Multimodal.WavCodec.encodeWav(16000, 1, s), 16)
    assert(viaFlac.toSeq == viaWav.toSeq)
  }

  test("compression actually happens on smooth signals") {
    val smooth = Array.tabulate(8000)(i => ((i % 1000) - 500).toShort) // sawtooth
    val enc = FlacCodec.encode(44100, 1, smooth)
    assert(enc.length < smooth.length * 2 / 2, // < 50% of raw PCM bytes
      s"fixed predictors should beat PCM on a sawtooth: ${enc.length} vs ${smooth.length * 2}")
  }

  test("resize re-encodes through the codec contract") {
    val s = Array.tabulate(1000)(i => ((i * 3) % 2001 - 1000).toShort)
    val resized = FlacCodec.resize(FlacCodec.encode(8000, 1, s), 10, 10)
    val (_, _, s2) = FlacCodec.decode(resized)
    assert(s2.length == 100)
    assert(s2(0) == s(0) && s2(99) == s(990))
    // stereo + odd target grid: per-channel resample, channels stay true
    val st = Array.tabulate(600)(i => (if (i % 2 == 0) 1000 + i else -(2000 + i)).toShort)
    val r2 = FlacCodec.resize(FlacCodec.encode(8000, 2, st), 3, 3)
    val (_, c2, s3) = FlacCodec.decode(r2)
    assert(c2 == 2 && s3.length == 18)
    assert(s3.zipWithIndex.forall { case (v, i) => if (i % 2 == 0) v > 0 else v < 0 },
      "left/right samples must not cross channels")
    // oversized blockSize is rejected at write time, not decode time
    intercept[IllegalArgumentException](FlacCodec.encode(8000, 1, st, blockSize = 100000))
  }
}
