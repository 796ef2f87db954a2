package graft.jobs

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExactShuffleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("repartitionByBin: every row lands in exactly its bin's partition") {
    import spark.implicits._
    val n = 7
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("bin", pmod(col("id"), lit(n.toLong)).cast("int"))
    val parted = ExactShuffle.repartitionByBin(df, n, col("bin"))
      .withColumn("pid", spark_partition_id())
    assert(parted.rdd.getNumPartitions == n)
    // each partition holds exactly one bin, and it is bin == pid
    val m = parted.select("bin", "pid").distinct().as[(Int, Int)].collect()
    assert(m.length == n)
    assert(m.forall { case (bin, pid) => bin == pid })
  }

  test("sentinels cover every partition for a range of n") {
    for (n <- 1 to 64) {
      val s = ExactShuffle.sentinels(n)
      assert(s.length == n)
      // re-derive the placement the same way HashPartitioning does
      s.zipWithIndex.foreach { case (v, p) =>
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(v, 42)
        assert(((h % n) + n) % n == p)
      }
    }
  }

  test("binByBounds: boundary membership matches searchsorted semantics") {
    import spark.implicits._
    val bounds = Seq(10L, 20L, 30L)
    val df = Seq(5L, 10L, 11L, 20L, 25L, 30L, 31L, 100L).toDF("k")
      .select(col("k"), ExactShuffle.binByBounds(col("k"), bounds).as("bin"))
    val got = df.as[(Long, Int)].collect().toMap
    assert(got == Map(5L -> 0, 10L -> 0, 11L -> 1, 20L -> 1, 25L -> 2,
      30L -> 2, 31L -> 3, 100L -> 3))
  }
}
