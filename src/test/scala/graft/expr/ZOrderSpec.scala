package graft.expr

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {

  // seeded property sampling (no scalatestplus bridge in the offline cache)
  private val rnd = new scala.util.Random(42)
  private def s21(): Long = (rnd.nextLong() & Long.MaxValue) % (ZOrder.Max21 + 1)

  test("known vectors") {
    assert(ZOrder.interleave3(0, 0, 0) == 0L)
    assert(ZOrder.interleave3(1, 0, 0) == 1L)
    assert(ZOrder.interleave3(0, 1, 0) == 2L)
    assert(ZOrder.interleave3(0, 0, 1) == 4L)
    assert(ZOrder.interleave3(1, 1, 1) == 7L)
    assert(ZOrder.interleave3(2, 0, 0) == 8L)
    assert(ZOrder.interleave3(ZOrder.Max21, ZOrder.Max21, ZOrder.Max21) == (1L << 63) - 1)
  }

  test("magic-mask spread matches naive interleave (1000 samples)") {
    (1 to 1000).foreach { _ =>
      val (a, b, c) = (s21(), s21(), s21())
      assert(ZOrder.interleave3(a, b, c) == ZOrder.interleave3Naive(a, b, c))
    }
  }

  test("monotone in each coordinate with others fixed") {
    (1 to 500).foreach { _ =>
      val (a1, a2, b, c) = (s21(), s21(), s21(), s21())
      val (lo, hi) = (math.min(a1, a2), math.max(a1, a2))
      assert(ZOrder.interleave3(lo, b, c) <= ZOrder.interleave3(hi, b, c))
      assert(ZOrder.interleave3(b, lo, c) <= ZOrder.interleave3(b, hi, c))
      assert(ZOrder.interleave3(b, c, lo) <= ZOrder.interleave3(b, c, hi))
    }
  }

  test("interleave is injective (sampled)") {
    (1 to 500).foreach { _ =>
      val (a, b, c) = (s21(), s21(), s21())
      val (x, y, z) = (s21(), s21(), s21())
      if ((a, b, c) != (x, y, z))
        assert(ZOrder.interleave3(a, b, c) != ZOrder.interleave3(x, y, z))
    }
  }

  test("normHash21 preserves signed order and lands in range") {
    (1 to 1000).foreach { _ =>
      val a = rnd.nextLong(); val b = rnd.nextLong()
      val (na, nb) = (ZOrder.normHash21(a), ZOrder.normHash21(b))
      assert(na >= 0 && na <= ZOrder.Max21)
      if (a <= b) assert(na <= nb)
    }
  }

  test("normRange21 clamps and scales") {
    assert(ZOrder.normRange21(-5, 0, 100) == 0)
    assert(ZOrder.normRange21(100, 0, 100) == ZOrder.Max21)
    assert(ZOrder.normRange21(50, 0, 100) == ZOrder.Max21 / 2)
  }

  test("hilbert3: bijective and unit-step on a small grid") {
    val bits = 3
    val n = 1 << bits
    val seen = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    for (x <- 0L until n; y <- 0L until n; z <- 0L until n) {
      val h = ZOrder.hilbert3(x, y, z, bits)
      assert(h >= 0 && h < n.toLong * n * n)
      assert(!seen.contains(h), s"collision at $h")
      seen(h) = (x, y, z)
    }
    for (i <- 0L until (n.toLong * n * n - 1)) {
      val (x1, y1, z1) = seen(i)
      val (x2, y2, z2) = seen(i + 1)
      val d = math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2)
      assert(d == 1, s"indices $i,${i + 1} not adjacent: ($x1,$y1,$z1)->($x2,$y2,$z2)")
    }
  }

  test("ZOrderKey expression evaluates in a DataFrame (codegen path)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, 0L, 0L), (0L, 1L, 0L), (5L, 9L, 17L))
      .toDF("a", "b", "c")
      .select(zfunctions.zorder_key(col("a"), col("b"), col("c")).as("z"),
        zfunctions.hilbert_key(col("a"), col("b"), col("c")).as("hk"))
    val rows = df.collect()
    assert(rows(0).getLong(0) == 1L)
    assert(rows(1).getLong(0) == 2L)
    assert(rows(2).getLong(0) == ZOrder.interleave3(5, 9, 17))
    assert(rows(2).getLong(1) == ZOrder.hilbert3_21(5, 9, 17))
  }

  test("ZOrderKey via SQL registration") {
    val spark = TestSpark.spark
    zfunctions.register(spark)
    val r = spark.sql("SELECT zorder_key(1L, 1L, 1L) AS z").head().getLong(0)
    assert(r == 7L)
  }

  test("null input propagates to null (nullIntolerant)") {
    val spark = TestSpark.spark
    zfunctions.register(spark)
    val r = spark.sql("SELECT zorder_key(CAST(NULL AS BIGINT), 1L, 1L) AS z").head()
    assert(r.isNullAt(0))
  }

  test("zkey keeps phash locality: nearby phash => nearby zkey") {
    val p1 = 0x7abc000000000000L
    val p2 = 0x7abc000000001234L
    val far = 0x0123000000000000L
    val z1 = ZOrder.interleave3(ZOrder.normHash21(p1), 7, 7)
    val z2 = ZOrder.interleave3(ZOrder.normHash21(p2), 7, 7)
    val zf = ZOrder.interleave3(ZOrder.normHash21(far), 7, 7)
    assert(math.abs(z1 - z2) < math.abs(z1 - zf))
  }
}
