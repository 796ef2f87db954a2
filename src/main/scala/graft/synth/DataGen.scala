package graft.synth

import graft.codec.{ImageCodec, PHash}
import graft.model.ImageRow
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Deterministic synthetic image+caption generator (seeded, no wall
  * clock — deliberately unlike the reference's `datetime.now()` test
  * inputs, `eodhd_processor.py:53`).
  *
  * Skew design: ~25% of images are near-duplicates drawn from 16 base
  * patterns, and base pattern 0 alone owns ~10% of all rows. Near-dups
  * share phash values almost exactly, so clustering by zkey without a
  * tiebreaker would hotspot one range partition — this is the skew the
  * salted repartitionByRange in ClusterJob has to defuse.
  */
object DataGen {

  final val Sizes = Array(32, 48, 64)
  final val BasePatterns = 16

  // --- deterministic PRNG (splitmix64, public-domain algorithm) ---
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val words = Array(
    "amber", "bridge", "crane", "delta", "ember", "forest", "glacier",
    "harbor", "island", "jungle", "kernel", "lantern", "meadow", "nebula",
    "orchid", "prairie", "quartz", "river", "summit", "tundra", "umbra",
    "valley", "willow", "zenith", "canyon", "drift", "echo", "fjord")

  def caption(i: Long, seed: Long): String = {
    val r0 = mix(seed ^ (i * 31 + 7))
    val n = 5 + (mix(r0) % 11).toInt.abs // 5..15 words
    val sb = new StringBuilder
    var k = 0
    var r = r0
    while (k < n) {
      r = mix(r)
      if (k > 0) sb.append(' ')
      sb.append(words(((r % words.length) + words.length).toInt % words.length))
      k += 1
    }
    sb.toString
  }

  /** Base-pattern index for row i: 0 = heavy hitter. Returns -1 for
    * unique (non-duplicate) images. */
  def clusterOf(i: Long, seed: Long): Int = {
    val r = mix(seed ^ i) & Long.MaxValue
    val m = r % 100
    if (m < 10) 0 // 10% heavy-hitter cluster
    else if (m < 25) (1 + (mix(r) & Long.MaxValue) % (BasePatterns - 1)).toInt
    else -1
  }

  private def clamp8(d: Double): Int = math.max(0, math.min(255, d.toInt))

  /** Deterministic RGB pixel field: smooth 2-D gradients parameterized by
    * the pattern id, plus a few per-image noise pixels for near-dups (so
    * duplicates are near- but not bit-identical). */
  def pixels(i: Long, seed: Long, w: Int, h: Int): Array[Int] = {
    val cluster = clusterOf(i, seed)
    val patternSeed = if (cluster >= 0) seed ^ (0xabcdef123L + cluster) else seed ^ mix(i)
    val p1 = mix(patternSeed)
    val p2 = mix(p1)
    val fx = 1.0 + ((p1 & 0xff) % 5)
    val fy = 1.0 + ((p2 & 0xff) % 5)
    val ph = ((p1 >>> 8) & 0xff) / 255.0 * math.Pi
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val u = x.toDouble / w
        val v = y.toDouble / h
        // luma-dominant mixed-frequency field: populates low AND mid DCT
        // bins (stable pHash AC bits) while keeping chroma slow-varying so
        // JPEG 4:2:0 subsampling stays above the 40 dB oracle
        val base = 127.5 + 80.0 * math.sin(2 * math.Pi * fx * u + ph) *
          math.cos(2 * math.Pi * fy * v) +
          30.0 * math.sin(2 * math.Pi * (fx * u + fy * v))
        val tint = 18.0 * math.sin(2 * math.Pi * (u + v) / 2.0)
        val rC = clamp8(base + tint)
        val gC = clamp8(base)
        val bC = clamp8(base - tint)
        px(y * w + x) = (rC << 16) | (gC << 8) | bC
        x += 1
      }
      y += 1
    }
    // per-image gentle noise: 8 pixels perturbed — near-dups stay near,
    // never bit-identical
    var k = 0
    var r = mix(seed ^ (i * 1315423911L))
    while (k < 8) {
      r = mix(r)
      val pos = ((r & Long.MaxValue) % (w * h)).toInt
      px(pos) ^= 0x030303
      k += 1
    }
    px
  }

  def imageRow(i: Long, seed: Long): ImageRow = imageRow(i, seed, Sizes)

  def imageRow(i: Long, seed: Long, sizes: Array[Int]): ImageRow = {
    val r = mix(seed ^ (i * 2654435761L))
    val cluster = clusterOf(i, seed)
    // near-dup cluster members share dimensions (the pattern dictates the
    // frame); unique images draw sizes independently
    val (w, h) = if (cluster >= 0) {
      val cr = mix(seed ^ (0x51edL + cluster))
      (sizes(((cr & Long.MaxValue) % sizes.length).toInt),
        sizes(((mix(cr) & Long.MaxValue) % sizes.length).toInt))
    } else {
      (sizes(((r & Long.MaxValue) % sizes.length).toInt),
        sizes(((mix(r) & Long.MaxValue) % sizes.length).toInt))
    }
    val fmt = if ((mix(r + 1) & 1L) == 0L) "png" else "jpeg"
    val px = pixels(i, seed, w, h)
    val bytes = ImageCodec.encode(px, w, h, fmt)
    // phash from the *decoded* bytes so lossy jpeg loss is baked in
    val phash = PHash.fromBytes(bytes)
    ImageRow(f"img$i%012d", bytes, w, h, fmt, caption(i, seed), phash)
  }

  /** Distributed generation: executor-side row synthesis, no driver loop. */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L,
      parallelism: Int = 0, sizes: Array[Int] = Sizes): Dataset[ImageRow] = {
    import spark.implicits._
    val p = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, p).map(i => imageRow(i, seed, sizes))
  }

  /** MERGE fixture: ~1% caption corrections for existing ids plus
    * `inserts` brand-new full rows (ids beyond the base range). */
  def corrections(spark: SparkSession, n: Long, seed: Long = 42L,
      inserts: Int = 5): Dataset[ImageRow] = {
    import spark.implicits._
    val updates = spark.range(0, n, 1, math.max(1, (n / 5000).toInt))
      .filter(i => (mix(seed ^ (i + 77)) & Long.MaxValue) % 100 == 0)
      .map { i =>
        val base = imageRow(i, seed)
        base.copy(caption = "corrected: " + caption(i, seed ^ 0x5eedL))
      }
    val fresh = spark.range(n, n + inserts, 1, 1).map(i => imageRow(i, seed))
    updates.union(fresh)
  }

  def correctionsDF(spark: SparkSession, n: Long, seed: Long = 42L,
      inserts: Int = 5): DataFrame = corrections(spark, n, seed, inserts).toDF()
}
