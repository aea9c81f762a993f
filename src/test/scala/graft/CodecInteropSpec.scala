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
