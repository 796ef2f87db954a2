package graft.jobs

import graft.TestSpark
import graft.format.QTable
import graft.synth.DataGen
import graft.verify.ScanEquivalence
import org.scalatest.funsuite.AnyFunSuite

/** Bucket-scoped rewrites (rolling maintenance): only scoped buckets'
  * files are rewritten, everything else rides by reference, the logical
  * row set is untouched, and successive scoped runs converge to the
  * full-table result. */
class ScopedMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("scoped compact + cluster rewrite only their buckets; rolling runs converge") {
    val t = QTable.create(TestSpark.tmpDir("scoped"), spark, buckets = 4)
    AppendJob.append(t, DataGen.generate(spark, 3000, 42L, 4).toDF(),
      filesPerBucket = 5)
    val target = 4L << 20
    val pre = t.currentSnapshot
    val preDf = t.read(pre).cache()
    val outOfScope = t.entries(pre)
      .filter(e => e.pbucketMin >= 2 && e.pbucketMax >= 2).map(_.path).toSet
    assert(outOfScope.nonEmpty)

    val c1 = new CompactJob(t, target, bucketScope = Some(Set(0, 1))).run()
    // out-of-scope files carried by reference, logical rows untouched
    val afterPaths = t.entries(c1).map(_.path).toSet
    assert(outOfScope.subsetOf(afterPaths),
      "scoped compact must not touch out-of-scope buckets")
    val (ok1, bad1) = ScanEquivalence.check(preDf, t.read(c1))
    assert(ok1, s"$bad1 violations after scoped compact")
    // debt remains in the unscoped buckets, visible to analyze
    val mid = new AnalyzeJob(t, target).run()
    assert(mid.smallFiles > 0, "unscoped buckets should still carry debt")

    // rolling: second run covers the rest; result = full-table compact
    val c2 = new CompactJob(t, target, bucketScope = Some(Set(2, 3))).run()
    val done = new AnalyzeJob(t, target).run()
    assert(done.smallFiles < mid.smallFiles)
    val (ok2, bad2) = ScanEquivalence.check(preDf, t.read(c2))
    assert(ok2, s"$bad2 violations after rolling compact")

    // scoped cluster: only bucket 0 files rewritten, others carried
    val preCluster = t.entries(t.currentSnapshot)
      .filter(_.pbucketMin != 0).map(_.path).toSet
    val cl = new ClusterJob(t, target, bucketScope = Some(Set(0))).run()
    assert(preCluster.subsetOf(t.entries(cl).map(_.path).toSet),
      "scoped cluster must carry out-of-scope files by reference")
    val (ok3, bad3) = ScanEquivalence.check(preDf, t.read(cl))
    assert(ok3, s"$bad3 violations after scoped cluster")
    preDf.unpersist()
  }
}
