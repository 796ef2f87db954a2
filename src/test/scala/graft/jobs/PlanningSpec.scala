package graft.jobs

import graft.model.DataFileEntry
import org.scalatest.funsuite.AnyFunSuite

class PlanningSpec extends AnyFunSuite {

  private def fe(path: String, bucket: Int, bytes: Long) = DataFileEntry(
    path, rowCount = 1, byteCount = bytes, pbucketMin = bucket, pbucketMax = bucket,
    phashMin = 0, phashMax = 0, imageIdMin = "a", imageIdMax = "z")

  test("coalesceGroups: every file appears exactly once, order kept") {
    val perBucket = (0 until 10).map(b => b -> Seq(fe(s"f$b-0", b, 10), fe(s"f$b-1", b, 10)))
    val groups = JobPlanning.coalesceGroups(perBucket, targetFileBytes = 10, minGroupBytes = 35)
    val all = groups.flatMap(_._2.map(_.path))
    assert(all.sorted == perBucket.flatMap(_._2.map(_.path)).sorted)
    assert(all.distinct.size == all.size)
    // each group except possibly the last carries >= minGroupBytes
    groups.dropRight(1).foreach { case (_, fs) =>
      assert(fs.map(_.byteCount).sum >= 35)
    }
  }

  test("coalesceGroups: big buckets stay 1:1, small buckets fold") {
    val perBucket = Seq(
      0 -> Seq(fe("big0", 0, 1000)),
      1 -> Seq(fe("s1", 1, 1)),
      2 -> Seq(fe("s2", 2, 1)),
      3 -> Seq(fe("s3", 3, 1)))
    val groups = JobPlanning.coalesceGroups(perBucket, targetFileBytes = 100, minGroupBytes = 400)
    assert(groups.head._1 == "b0")
    assert(groups.size == 2)
    assert(groups(1)._1 == "b1-3")
  }

  test("coalesceGroups: default min is 4x target") {
    val perBucket = (0 until 8).map(b => b -> Seq(fe(s"f$b", b, 100)))
    val groups = JobPlanning.coalesceGroups(perBucket, targetFileBytes = 100)
    // 4x100=400 min => groups of 4 buckets
    assert(groups.size == 2)
  }

  test("Timing.median and estimate") {
    assert(Timing.median(Seq(1.0, 100.0, 2.0)) == 2.0)
    assert(Timing.median(Seq(1.0, 2.0, 3.0, 100.0)) == 2.5)
    val samples = (1 to 8).map(i => Timing.Sample("cluster", s"g$i", if (i % 4 == 0) 50.0 else 2.0))
    // median 2.0, 8 groups at conc 4 => 2 waves => 4.0 (bursts filtered)
    assert(Timing.estimate(samples, "cluster", 4) == 4.0)
    assert(Timing.estimate(samples, "compact", 4) == 0.0)
  }
}
