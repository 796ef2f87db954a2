package graft.codec

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** PNG/JPEG encode/decode on top of the JDK's javax.imageio (no external
  * image libraries exist in this sandbox; the JDK codecs are sufficient
  * for the PSNR>=40dB-vs-bit-exact oracle split).
  *
  * Pixels travel as packed 0xRRGGBB Int arrays, row-major.
  */
object ImageCodec {
  // imageio needs headless AWT inside executor threads.
  System.setProperty("java.awt.headless", "true")

  final case class Decoded(pixels: Array[Int], w: Int, h: Int)

  def encode(pixels: Array[Int], w: Int, h: Int, fmt: String): Array[Byte] = {
    require(pixels.length == w * h, s"pixel count ${pixels.length} != ${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, pixels, 0, w)
    val baos = new ByteArrayOutputStream()
    fmt.toLowerCase match {
      case "png" =>
        ImageIO.write(img, "png", baos)
      case "jpeg" | "jpg" =>
        // Fixed high quality so the synthetic-data PSNR stays >= 40 dB.
        val writer = ImageIO.getImageWritersByFormatName("jpg").next()
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(0.98f)
        val mos = new MemoryCacheImageOutputStream(baos)
        writer.setOutput(mos)
        writer.write(null, new IIOImage(img, null, null), param)
        mos.flush()
        writer.dispose()
      case other => throw new IllegalArgumentException(s"unsupported fmt: $other")
    }
    baos.toByteArray
  }

  def decode(bytes: Array[Byte]): Decoded = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "imageio could not decode bytes")
    val w = img.getWidth
    val h = img.getHeight
    val px = new Array[Int](w * h)
    img.getRGB(0, 0, w, h, px, 0, w)
    // mask off alpha so TYPE variations compare equal
    var i = 0
    while (i < px.length) { px(i) &= 0xffffff; i += 1 }
    Decoded(px, w, h)
  }
}

/** Peak signal-to-noise ratio between two encoded images.
  * Identical byte arrays (the copy-through maintenance path) short-circuit
  * to +Infinity without decoding. */
object Psnr {

  def ofBytes(a: Array[Byte], b: Array[Byte]): Double = {
    if (java.util.Arrays.equals(a, b)) return Double.PositiveInfinity
    val da = ImageCodec.decode(a)
    val db = ImageCodec.decode(b)
    ofPixels(da.pixels, db.pixels)
  }

  def ofPixels(a: Array[Int], b: Array[Int]): Double = {
    require(a.length == b.length, s"pixel count mismatch ${a.length} vs ${b.length}")
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val pa = a(i); val pb = b(i)
      val dr = ((pa >> 16) & 0xff) - ((pb >> 16) & 0xff)
      val dg = ((pa >> 8) & 0xff) - ((pb >> 8) & 0xff)
      val dbl = (pa & 0xff) - (pb & 0xff)
      se += dr * dr + dg * dg + dbl * dbl
      i += 1
    }
    val mse = se / (a.length.toDouble * 3.0)
    if (mse == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / mse)
  }
}

/** 64-bit DCT perceptual hash (classic pHash construction: downscale to
  * 32x32 luma, 2-D DCT-II, threshold the low-frequency 8x8 block —
  * excluding DC — against its median).
  */
object PHash {
  private final val N = 32

  // Separable DCT-II basis, precomputed: basis(k)(n) = cos(pi/N * (n+0.5) * k)
  private val basis: Array[Array[Double]] = Array.tabulate(N, N) { (k, n) =>
    math.cos(math.Pi / N * (n + 0.5) * k)
  }

  def fromBytes(bytes: Array[Byte]): Long = {
    val d = ImageCodec.decode(bytes)
    fromPixels(d.pixels, d.w, d.h)
  }

  def fromPixels(pixels: Array[Int], w: Int, h: Int): Long = {
    // area-average downscale to 32x32 grayscale
    val g = new Array[Double](N * N)
    var gy = 0
    while (gy < N) {
      val y0 = gy * h / N
      val y1 = math.max(y0 + 1, (gy + 1) * h / N)
      var gx = 0
      while (gx < N) {
        val x0 = gx * w / N
        val x1 = math.max(x0 + 1, (gx + 1) * w / N)
        var s = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = pixels(y * w + x)
            s += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
            x += 1
          }
          y += 1
        }
        g(gy * N + gx) = s / ((y1 - y0) * (x1 - x0))
        gx += 1
      }
      gy += 1
    }
    // separable 2-D DCT-II: rows then columns
    val tmp = new Array[Double](N * N)
    var r = 0
    while (r < N) {
      var k = 0
      while (k < N) {
        var s = 0.0
        var n = 0
        while (n < N) { s += g(r * N + n) * basis(k)(n); n += 1 }
        tmp(r * N + k) = s
        k += 1
      }
      r += 1
    }
    val dct = new Array[Double](8 * 8)
    var kc = 0
    while (kc < 8) {
      var kr = 0
      while (kr < 8) {
        var s = 0.0
        var n = 0
        while (n < N) { s += tmp(n * N + kc) * basis(kr)(n); n += 1 }
        dct(kr * 8 + kc) = s
        kr += 1
      }
      kc += 1
    }
    // median of the 8x8 block excluding DC
    val ac = dct.drop(1).sorted
    val median = (ac(ac.length / 2 - 1) + ac(ac.length / 2)) / 2.0
    var bits = 0L
    var i = 1
    while (i < 64) {
      if (dct(i) > median) bits |= 1L << (i - 1)
      i += 1
    }
    // bit 63 from DC sign keeps the full 64-bit domain populated
    if (dct(0) > 0) bits |= 1L << 63
    bits
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
