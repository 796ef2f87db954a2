package graft.jobs

import graft.TestSpark
import graft.format.QTable
import graft.synth.DataGen
import graft.verify.ScanEquivalence
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RebucketJobSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("rebucket 4 -> 8: rows preserved, pbucket recomputed, pruning works") {
    val t = QTable.create(TestSpark.tmpDir("rebucket"), spark, buckets = 4)
    AppendJob.append(t, DataGen.generate(spark, 600, 42L, 8).toDF(), filesPerBucket = 3)
    val preDf = t.read()

    val snap = new RebucketJob(t, newBuckets = 8, targetFileBytes = 256L << 10).run()
    assert(snap.operation == "rebucket")
    assert(snap.buckets == 8)
    assert(t.currentSnapshot.buckets == 8)

    val post = t.read(snap)
    val (ok, bad) = ScanEquivalence.check(preDf, post)
    assert(ok, s"$bad violations after rebucket")

    // stored pbucket matches the new transform for every row
    val miss = post.where(
      col("pbucket") =!= pmod(xxhash64(col("image_id")), lit(8L)).cast("int")).count()
    assert(miss == 0, s"$miss rows with stale pbucket")

    // manifest bucket ranges prune: each bucket's files serve only it
    (0 until 8).foreach { b =>
      val files = t.planFiles(snap, bucket = Some(b))
      assert(files.nonEmpty, s"bucket $b has no files")
      assert(files.forall(f => f.pbucketMin <= b && b <= f.pbucketMax))
    }
    // bucket pruning reads a proper subset
    assert(t.planFiles(snap, bucket = Some(0)).size < t.entries(snap).size)

    // follow-on maintenance works against the new spec
    val c = new CompactJob(t, targetFileBytes = 8L << 20).run()
    assert(t.entries(c).map(_.rowCount).sum == 600)
  }

  test("rebucket to the same count is rejected; sub-splitting caps file size") {
    val t = QTable.create(TestSpark.tmpDir("rebucket2"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 400, 7L, 4).toDF(), filesPerBucket = 2)
    intercept[IllegalArgumentException] { new RebucketJob(t, 2).run() }

    // tiny target forces sub-splitting: more files than buckets
    val snap = new RebucketJob(t, newBuckets = 4, targetFileBytes = 128L << 10).run()
    assert(t.entries(snap).size > 4, "expected sub-split files beyond one per bucket")
    assert(t.entries(snap).map(_.rowCount).sum == 400)
  }
}
