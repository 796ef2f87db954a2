package graft.functions

import graft.codec.{ImageCodec, PHash, Psnr}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Multimodal column operators: the image `bytes` column is opaque binary
  * with typed metadata (w, h, fmt); these decode / feature-extract /
  * downscale it executor-side via the JDK's imageio (no Python, no
  * external libs — the Spark-side plumbing and the codec are both real
  * and tested).
  *
  * All are Scala UDFs by design: pixel work is opaque to Catalyst, so a
  * custom Expression would buy nothing (SURVEY §2.9) — the filter/project
  * AROUND them still optimizes normally.
  */
object ImageFunctions {

  /** (w, h) decoded from the actual bytes — validates stored metadata. */
  val decodeDims = udf { bytes: Array[Byte] =>
    val d = ImageCodec.decode(bytes)
    (d.w, d.h)
  }

  /** Downscale to n x n (area average) and re-encode as PNG — the
    * thumbnail/resize stage of a training-data pipeline. */
  val thumbnail = udf { (bytes: Array[Byte], n: Int) =>
    val d = ImageCodec.decode(bytes)
    val out = new Array[Int](n * n)
    var gy = 0
    while (gy < n) {
      val y0 = gy * d.h / n; val y1 = math.max(y0 + 1, (gy + 1) * d.h / n)
      var gx = 0
      while (gx < n) {
        val x0 = gx * d.w / n; val x1 = math.max(x0 + 1, (gx + 1) * d.w / n)
        var r = 0L; var g = 0L; var b = 0L; var c = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = d.pixels(y * d.w + x)
            r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff; c += 1
            x += 1
          }
          y += 1
        }
        out(gy * n + gx) = (((r / c).toInt) << 16) | (((g / c).toInt) << 8) | (b / c).toInt
        gx += 1
      }
      gy += 1
    }
    ImageCodec.encode(out, n, n, "png")
  }

  /** Mean RGB feature vector (a stand-in for an embedding extractor:
    * same signature/shape a real model-based featurizer would have). */
  val meanRgb = udf { bytes: Array[Byte] =>
    val d = ImageCodec.decode(bytes)
    var r = 0.0; var g = 0.0; var b = 0.0
    d.pixels.foreach { p =>
      r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
    }
    val n = d.pixels.length.toDouble
    Array(r / n, g / n, b / n)
  }

  /** Recompute the 64-bit DCT pHash from pixels (dedup fingerprint). */
  val phashOf = udf { bytes: Array[Byte] => PHash.fromBytes(bytes) }

  /** PSNR between two encoded images (the scan-equivalence kernel). */
  val psnrOf = udf { (a: Array[Byte], b: Array[Byte]) =>
    val p = Psnr.ofBytes(a, b)
    if (p.isPosInfinity) 999.0 else p
  }

  def decode_dims(c: Column): Column = decodeDims(c)
  def mean_rgb(c: Column): Column = meanRgb(c)
}
