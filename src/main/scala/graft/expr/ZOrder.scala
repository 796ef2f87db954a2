package graft.expr

/** Bit-twiddling kernels for Z-order (Morton) and Hilbert curve keys.
  *
  * Static methods so generated code (whole-stage codegen) can call them
  * directly, the same pattern Spark's own hash expressions use with XXH64.
  * All inputs are 21-bit values (0..2097151); three of them interleave
  * into one 63-bit non-negative Long.
  */
object ZOrder {

  final val Bits = 21
  final val Max21: Long = (1L << Bits) - 1 // 2097151

  /** Driver-side mirror of [[zfunctions.str_prefix_long]]: the same
    * 7-byte big-endian order-preserving prefix, over manifest stat
    * strings (sort-column range bounds, analyze overlap spans). */
  def strPrefixLong(s: String): Long = {
    var v = 0L
    var i = 0
    while (i < 7) {
      val b = if (s != null && i < s.length) math.min(s.charAt(i).toInt, 255) else 0
      v |= b.toLong << (8 * (6 - i))
      i += 1
    }
    v
  }

  /** Spread the low 21 bits of x so bit i lands at bit 3*i (Morton magic
    * masks — public-domain bit trick, cf. "Bit Twiddling Hacks"). */
  def spread3(xIn: Long): Long = {
    var x = xIn & Max21
    x = (x | (x << 32)) & 0x1f00000000ffffL
    x = (x | (x << 16)) & 0x1f0000ff0000ffL
    x = (x | (x << 8)) & 0x100f00f00f00f00fL
    x = (x | (x << 4)) & 0x10c30c30c30c30c3L
    x = (x | (x << 2)) & 0x1249249249249249L
    x
  }

  /** Interleave three 21-bit values: output bit 3*i+0 = bit i of a,
    * 3*i+1 = bit i of b, 3*i+2 = bit i of c. Result in [0, 2^63). */
  def interleave3(a: Long, b: Long, c: Long): Long =
    spread3(a) | (spread3(b) << 1) | (spread3(c) << 2)

  /** Reference (naive) implementation, used as the oracle in tests. */
  def interleave3Naive(a: Long, b: Long, c: Long): Long = {
    var r = 0L
    var i = 0
    while (i < Bits) {
      r |= ((a >>> i) & 1L) << (3 * i)
      r |= ((b >>> i) & 1L) << (3 * i + 1)
      r |= ((c >>> i) & 1L) << (3 * i + 2)
      i += 1
    }
    r
  }

  /** Top 21 bits of a signed 64-bit hash, order-preserved as unsigned:
    * flip the sign bit then logical-shift. Used to normalize phash /
    * xxhash64 values (uniform in 64 bits) down to the 21-bit key domain
    * while keeping most-significant-bit locality. */
  def normHash21(v: Long): Long = (v ^ Long.MinValue) >>> (64 - Bits)

  /** Range-scale v in [lo, hi] to [0, Max21], clamping outliers. */
  def normRange21(v: Long, lo: Long, hi: Long): Long = {
    if (hi <= lo) return 0L
    val c = math.min(math.max(v, lo), hi)
    // Use double math to avoid overflow on wide ranges; Max21 fits easily.
    ((c - lo).toDouble * Max21 / (hi - lo).toDouble).toLong
  }

  /** 3-D Hilbert index at `bits` bits/axis via Skilling's transform
    * (John Skilling, "Programming the Hilbert curve", AIP Conf. Proc.
    * 707, 2004 — public algorithm). Returns the transposed coordinates
    * gathered into a single index, MSB-interleaved x,y,z. */
  def hilbert3(xIn: Long, yIn: Long, zIn: Long, bits: Int): Long = {
    val X = Array(xIn & ((1L << bits) - 1), yIn & ((1L << bits) - 1), zIn & ((1L << bits) - 1))
    // Inverse undo of excess work
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < 3) {
        if ((X(i) & q) != 0) X(0) ^= p
        else {
          val t = (X(0) ^ X(i)) & p
          X(0) ^= t
          X(i) ^= t
        }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    X(1) ^= X(0)
    X(2) ^= X(1)
    var t = 0L
    q = 2
    while (q != (1L << bits)) {
      if ((X(2) & q) != 0) t ^= q - 1
      q <<= 1
    }
    X(0) ^= t
    X(1) ^= t
    X(2) ^= t
    // Gather transposed bits: bit b of X(i) -> output bit 3*b + (2-i),
    // so X(0) carries the most significant position of each triple.
    gather3(X(0), X(1), X(2), bits)
  }

  private def gather3(x0: Long, x1: Long, x2: Long, bits: Int): Long = {
    var r = 0L
    var b = 0
    while (b < bits) {
      r |= ((x0 >>> b) & 1L) << (3 * b + 2)
      r |= ((x1 >>> b) & 1L) << (3 * b + 1)
      r |= ((x2 >>> b) & 1L) << (3 * b)
      b += 1
    }
    r
  }

  /** 21-bit/axis Hilbert key (63-bit result), the drop-in alternative to
    * interleave3 for clustering. */
  def hilbert3_21(a: Long, b: Long, c: Long): Long = hilbert3(a, b, c, Bits)
}
