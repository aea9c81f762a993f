package graft

import graft.operators.multimodal.Multimodal.{BmpCodec, GifCodec, JpegCodec, PngCodec}
import org.scalatest.funsuite.AnyFunSuite

/** INDEPENDENT-IMPLEMENTATION interop: the from-scratch PNG/BMP/GIF
  * codecs cross-checked against the JDK's own `javax.imageio` readers
  * and writers — a self-round-trip can hide a symmetric bug (a flipped
  * row order or bad filter that encode and decode both share cancels
  * out); a second implementation can't. Plus the JPEG lossy contract:
  * bounded error on smooth content, deterministic decode.
  */
class CodecInteropSpec extends AnyFunSuite {

  private def rgbOf(img: java.awt.image.BufferedImage): (Int, Int, Array[Byte]) =
    JpegCodec.imageToRgb(img)

  private def read(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO failed to read the payload")
    img
  }

  private def write(fmt: String, w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w * h).foreach { p =>
      img.setRGB(p % w, p / w, ((rgb(p * 3) & 0xff) << 16) |
        ((rgb(p * 3 + 1) & 0xff) << 8) | (rgb(p * 3 + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"ImageIO can't write $fmt")
    bos.toByteArray
  }

  private val w = 13; private val h = 9
  private val rgb = Array.tabulate[Byte](w * h * 3)(i => ((i * 41 + 17) % 256).toByte)

  test("PNG: our bytes decode identically under the JDK reader, and vice versa") {
    // our encoder (filters y % 5) → JDK reader
    val (iw, ih, viaJdk) = rgbOf(read(PngCodec.encode(w, h, rgb)))
    assert(iw == w && ih == h && viaJdk.toSeq == rgb.toSeq)
    // JDK writer → our decoder
    val (ow, oh, viaOurs) = PngCodec.decode(write("png", w, h, rgb))
    assert(ow == w && oh == h && viaOurs.toSeq == rgb.toSeq)
  }

  test("BMP: our bytes decode identically under the JDK reader, and vice versa") {
    val (iw, ih, viaJdk) = rgbOf(read(BmpCodec.encode(w, h, rgb)))
    assert(iw == w && ih == h && viaJdk.toSeq == rgb.toSeq)
    val jdkBmp = write("bmp", w, h, rgb)
    val (ow, oh, viaOurs) = BmpCodec.decode(jdkBmp)
    assert(ow == w && oh == h && viaOurs.toSeq == rgb.toSeq)
  }

  test("GIF: our LZW stream decodes identically under the JDK reader, and vice versa") {
    val palette = Array.tabulate[Byte](768)(i => ((i * 7 + 3) % 256).toByte)
    val idx = Array.tabulate[Byte](w * h)(i => ((i * 29 + 11) % 256).toByte)
    val ourGif = GifCodec.encode(w, h, palette, idx)
    val (iw, ih, viaJdk) = rgbOf(read(ourGif))
    val (_, _, viaOurs) = GifCodec.decodeRgb(ourGif)
    assert(iw == w && ih == h && viaJdk.toSeq == viaOurs.toSeq,
      "JDK reader disagrees with our GIF decoder on our own stream")
    // JDK GIF writer quantizes to its own palette — compare RESOLVED
    // pixels (the writer keeps exact colors when the image has ≤256)
    val src = GifCodec.decodeRgb(ourGif)._3
    val jdkGif = write("gif", w, h, src)
    val (gw, gh, backOurs) = GifCodec.decodeRgb(jdkGif)
    val (_, _, backJdk) = rgbOf(read(jdkGif))
    assert(gw == w && gh == h)
    assert(backOurs.toSeq == backJdk.toSeq,
      "our decoder disagrees with the JDK reader on a JDK-written GIF")
  }

  test("GIF encodeWith: local-table + interlace + small palettes round-trip " +
      "and match the JDK reader (property fuzz)") {
    val rnd = new scala.util.Random(421)
    for (trial <- 0 until 24) {
      val tw = 1 + rnd.nextInt(40)
      val th = 1 + rnd.nextInt(24)
      val bits = 2 + rnd.nextInt(7) // 2..8
      val entries = 1 << bits
      val pal = Array.tabulate[Byte](3 * entries)(i => ((i * 37 + trial * 5 + 13) % 256).toByte)
      val idx = Array.tabulate[Byte](tw * th)(_ => rnd.nextInt(entries).toByte)
      val local = rnd.nextBoolean()
      val inter = rnd.nextBoolean()
      val bytes = GifCodec.encodeWith(tw, th, pal, idx,
        tableBits = bits, localTable = local, interlaced = inter)
      // self round-trip: exact palette + exact indices in raster order
      val (dw, dh, dpal, didx) = GifCodec.decode(bytes)
      assert(dw == tw && dh == th, s"trial $trial size")
      assert(dpal.toSeq == pal.toSeq, s"trial $trial palette (local=$local)")
      assert(didx.toSeq == idx.toSeq,
        s"trial $trial indices (local=$local interlaced=$inter ${tw}x$th bits=$bits)")
      // independent implementation: the JDK reader resolves the same
      // RGB. Exception measured and excluded: for INTERLACED images
      // with h < 5 (some passes empty) the JDK's GIFImageReader drops
      // rows past the first (leaves them background) — its pass
      // advance mishandles degenerate passes; our decoder follows the
      // spec mapping, which is the identity there. h >= 5 always
      // cross-checks, non-interlaced always cross-checks.
      if (!inter || th >= 5) {
        val (jw, jh, viaJdk) = rgbOf(read(bytes))
        assert(jw == tw && jh == th)
        assert(viaJdk.toSeq == GifCodec.decodeRgb(bytes)._3.toSeq,
          s"trial $trial JDK disagreement (local=$local interlaced=$inter bits=$bits ${tw}x$th)")
      }
    }
  }

  test("GIF encodeWith: dictionary-full reset path (>4096 codes) round-trips and matches the JDK") {
    // a high-entropy 128x64 frame at 256 colors grows the LZW dict past
    // 4096 → the clear-code emit + codeSize reset path runs (the fuzz
    // test's ≤960-pixel frames never reach it); verify both our decoder
    // and the JDK's independent reader resolve the exact pixels
    val (tw, th) = (128, 64)
    val rnd = new scala.util.Random(97)
    val pal = Array.tabulate[Byte](768)(i => ((i * 37 + 13) % 256).toByte)
    val idx = Array.tabulate[Byte](tw * th)(_ => rnd.nextInt(256).toByte)
    val bytes = GifCodec.encodeWith(tw, th, pal, idx, tableBits = 8)
    val (dw, dh, dpal, didx) = GifCodec.decode(bytes)
    assert(dw == tw && dh == th && dpal.toSeq == pal.toSeq)
    assert(didx.toSeq == idx.toSeq, "dict-reset stream corrupts on our own decoder")
    val (jw, jh, viaJdk) = rgbOf(read(bytes))
    assert(jw == tw && jh == th)
    assert(viaJdk.toSeq == GifCodec.decodeRgb(bytes)._3.toSeq,
      "JDK reader disagrees across the dictionary reset")
  }

  test("GIF encodeWith refuses zero-area and over-65535 dimensions") {
    val pal = Array.tabulate[Byte](768)(i => (i % 256).toByte)
    intercept[IllegalArgumentException](
      GifCodec.encodeWith(0, 0, pal, Array.emptyByteArray))
    intercept[IllegalArgumentException](
      GifCodec.encodeWith(0x10000, 1, pal, new Array[Byte](0x10000)))
  }

  test("GIF encodeWith defaults reproduce encode's byte layout semantics") {
    // encode() keeps its original GCT-256 progressive layout; the new
    // writer at the same settings must decode to the same image (byte
    // layouts differ only in the color-resolution bits)
    val palette = Array.tabulate[Byte](768)(i => ((i * 7 + 3) % 256).toByte)
    val idx = Array.tabulate[Byte](w * h)(i => ((i * 29 + 11) % 256).toByte)
    val a = GifCodec.decode(GifCodec.encode(w, h, palette, idx))
    val b = GifCodec.decode(GifCodec.encodeWith(w, h, palette, idx))
    assert(a._3.toSeq == b._3.toSeq && a._4.toSeq == b._4.toSeq)
  }

  test("PNG color type 3 (paletted): JDK-written indexed PNGs decode exactly") {
    // an indexed BufferedImage makes ImageIO emit a REAL paletted PNG
    // (PLTE + 1-byte indices) — the common web form for logos/icons
    val pal = (0 until 16).map(i => (i * 16, 255 - i * 16, (i * 37) % 256))
    val cm = new java.awt.image.IndexColorModel(4, 16,
      pal.map(_._1.toByte).toArray, pal.map(_._2.toByte).toArray, pal.map(_._3.toByte).toArray)
    val img = new java.awt.image.BufferedImage(10, 6,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    (0 until 60).foreach { p =>
      val (r, g, b) = pal(p % 16)
      img.setRGB(p % 10, p / 10, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val bytes = bos.toByteArray
    // only proceed if the JDK actually wrote color type 3 at depth 8
    // (it may choose 4-bit for tiny palettes — then our 8-bit-only
    // decoder must refuse loudly rather than misread)
    val ihdrColorType = bytes(8 + 4 + 4 + 9) & 0xff
    val ihdrDepth = bytes(8 + 4 + 4 + 8) & 0xff
    if (ihdrColorType == 3 && ihdrDepth == 8) {
      val (w, h, rgb) = PngCodec.decode(bytes)
      val (_, _, viaJdk) = rgbOf(read(bytes))
      assert(w == 10 && h == 6 && rgb.toSeq == viaJdk.toSeq)
    } else intercept[IllegalArgumentException](PngCodec.decode(bytes))
  }

  test("GIF local color table overrides the global one") {
    val gct = Array.fill[Byte](768)(0) // poisoned global palette
    val lct = Array.tabulate[Byte](768)(i => ((i * 11 + 2) % 256).toByte)
    val idx = Array.tabulate[Byte](6 * 4)(i => (i % 256).toByte)
    // rebuild our encoder's output with the palette moved into a LOCAL
    // table: [header, GCT][0x2C desc(10)][minCode][data...] →
    // [header no-GCT][desc + LCT flag][LCT][minCode][data...]
    val base = GifCodec.encode(6, 4, lct, idx)
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 10)
    out.write(base(10) & 0x7f) // clear GCT flag
    out.write(base, 11, 2)     // background + aspect
    out.write(base, 13 + 768, 9) // image descriptor up to packed byte
    out.write(0x80 | 7)          // LCT present, 256 entries
    out.write(lct, 0, 768)
    out.write(base, 13 + 768 + 10, base.length - (13 + 768 + 10))
    val (w, h, pal, back) = GifCodec.decode(out.toByteArray)
    assert(w == 6 && h == 4)
    assert(pal.toSeq == lct.toSeq, "local table must override the global")
    assert(back.toSeq == idx.toSeq)
    // the JDK reader agrees on the same bytes
    val (_, _, viaJdk) = rgbOf(read(out.toByteArray))
    assert(viaJdk.toSeq == GifCodec.decodeRgb(out.toByteArray)._3.toSeq)
  }

  test("WAV: our PCM16 bytes decode identically under javax.sound.sampled") {
    import graft.operators.multimodal.Multimodal.WavCodec
    val samples = Array.tabulate[Short](500)(i => ((i * 131 - 250) % 32768).toShort)
    val wav = WavCodec.encodeWav(16000, 1, samples)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 16000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16)
    val raw = ais.readAllBytes()
    assert(raw.length == samples.length * 2)
    val viaJdk = Array.tabulate[Short](samples.length) { i =>
      (((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort)
    }
    assert(viaJdk.toSeq == samples.toSeq,
      "JDK audio reader disagrees with our WAV encoder")
    // and our decoder agrees with itself on the same bytes
    assert(WavCodec.decodeWav(wav)._3.toSeq == samples.toSeq)
  }

  test("JPEG (JDK codec): bounded loss on smooth content, deterministic decode") {
    // smooth gradient: JPEG's DCT is near-transparent at q=0.92
    val grad = Array.tabulate[Byte](32 * 24 * 3) { i =>
      val p = i / 3; ((p % 32) * 4 + (p / 32) * 3 + i % 3 * 5).toByte
    }
    val jpg = JpegCodec.encode(32, 24, grad)
    val (dw, dh, back) = JpegCodec.decode(jpg)
    assert(dw == 32 && dh == 24)
    val maxErr = back.indices.map(i => math.abs((back(i) & 0xff) - (grad(i) & 0xff))).max
    assert(maxErr <= 24, s"JPEG error too large on smooth content: $maxErr")
    // deterministic: same bytes decode to the same pixels
    assert(JpegCodec.decode(jpg)._3.toSeq == back.toSeq)
    // dHash survives the recompression (the lossy near-dup use case)
    import graft.operators.multimodal.Multimodal.PpmCodec
    val hOrig = PpmCodec.dHash(PpmCodec.encode(32, 24, grad))
    val hJpeg = JpegCodec.dHash(jpg)
    assert(java.lang.Long.bitCount(hOrig ^ hJpeg) <= 6,
      s"dHash drifted ${java.lang.Long.bitCount(hOrig ^ hJpeg)} bits under JPEG")
    // loud failure on garbage
    intercept[IllegalArgumentException](JpegCodec.decode("not a jpeg".getBytes))
    // the MediaCodec contract: real luminance features + real resize
    val feats = JpegCodec.decodeFeatures(jpg, 16)
    assert(feats.length == 16 && feats.forall(f => f >= 0f && f <= 255f))
    val (rw, rh, _) = JpegCodec.decode(JpegCodec.resize(jpg, 8, 6))
    assert(rw == 8 && rh == 6)
  }
}
