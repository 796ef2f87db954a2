package graft.jobs

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Shuffle planning helper: repartition a DataFrame into EXACTLY n
  * partitions where each row's target partition is a precomputed bin id —
  * without the extra sampling job `repartitionByRange` runs.
  *
  * Why: Spark's RangePartitioning launches a separate job over the child
  * plan to sample range boundaries. The child here is a scan of fat
  * image-byte rows, so the sample pass decodes the ENTIRE group a second
  * time (~2x the cluster-rewrite scan cost). The engine already knows the
  * distribution it wants (quantiles of the clustering key from a cheap
  * column-pruned key-only scan), so it assigns bins itself and needs only
  * a plain hash shuffle.
  *
  * Trick: hash repartitioning places a row by `pmod(murmur3(col), n)`.
  * For each target partition p we precompute (driver-side, microseconds)
  * a sentinel int v_p with `pmod(murmur3(v_p), n) == p`, then remap
  * bin -> sentinel and hash-repartition on the sentinel: every bin lands
  * in exactly its own partition — no collisions, no empties, one shuffle.
  */
object ExactShuffle {

  /** Sentinel ints: sentinels(n)(p) hashes to partition p under Spark's
    * HashPartitioning (murmur3 seed 42). Expected probes ~ n ln n. */
  def sentinels(n: Int): Array[Int] = {
    require(n >= 1)
    val out = new Array[Int](n)
    val found = new Array[Boolean](n)
    var remaining = n
    var v = 0
    while (remaining > 0) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(v, 42)
      val p = ((h % n) + n) % n
      if (!found(p)) { found(p) = true; out(p) = v; remaining -= 1 }
      v += 1
    }
    out
  }

  /** Repartition into exactly n partitions by `bin` (int in [0, n)).
    * The explicit numPartitions disables AQE coalescing, so the output
    * file count stays the planned one. */
  def repartitionByBin(df: DataFrame, n: Int, bin: Column): DataFrame = {
    val sentinel = element_at(lit(sentinels(n)), bin.cast("int") + 1)
    df.withColumn("__exact_part", sentinel)
      .repartition(n, col("__exact_part"))
      .drop("__exact_part")
  }

  /** Ascending-bin expression from sorted upper boundaries: rows with
    * key <= bounds(i) (and > bounds(i-1)) get bin i; above all bounds get
    * bin bounds.length. Linear when-chain — codegen-friendly, boundary
    * counts here are file counts per group (small). */
  def binByBounds(key: Column, bounds: Seq[Long]): Column = {
    val base: Column = lit(bounds.length)
    bounds.zipWithIndex.foldRight(base) { case ((b, i), elseCol) =>
      when(key <= lit(b), lit(i)).otherwise(elseCol)
    }
  }
}
