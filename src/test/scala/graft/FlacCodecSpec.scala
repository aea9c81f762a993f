package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.multimodal.{FlacCodec, Multimodal}

/** From-scratch FLAC subset: bit-exact round trips across subframe
  * types, CRC enforcement, and feature parity with the WAV path.
  */
class FlacCodecSpec extends AnyFunSuite {

  private def roundTrip(rate: Int, ch: Int, s: Array[Short], bs: Int = 4096): Unit = {
    val enc = FlacCodec.encode(rate, ch, s, bs)
    val (r2, c2, s2) = FlacCodec.decode(enc)
    assert(r2 == rate && c2 == ch)
    assert(java.util.Arrays.equals(s, s2), s"round trip lost samples (n=${s.length}, bs=$bs)")
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
