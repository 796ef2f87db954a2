package graft.jobs

import graft.TestSpark
import graft.format.QTable
import graft.synth.DataGen
import org.scalatest.funsuite.AnyFunSuite

/** The analyze report must MOVE THE RIGHT WAY across maintenance — its
  * whole purpose is deciding which job to launch next. */
class AnalyzeJobSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("debt falls under compact, overlap falls under cluster, metadata tracks") {
    val t = QTable.create(TestSpark.tmpDir("analyze"), spark, buckets = 4)
    AppendJob.append(t, DataGen.generate(spark, 4000, 42L, 4).toDF(),
      filesPerBucket = 6)
    val target = 4L << 20
    val fresh = new AnalyzeJob(t, target).run()
    assert(fresh.files == 24)
    assert(fresh.smallFiles > 0 && fresh.smallFileDebtBytes > 0,
      "deliberate small-file debt must register")
    assert(fresh.bloomCoverage == 1.0)
    assert(fresh.clusterOverlap > 1.5,
      s"unclustered overlap should be high, got ${fresh.clusterOverlap}")

    new CompactJob(t, targetFileBytes = target).run()
    val compacted = new AnalyzeJob(t, target).run()
    assert(compacted.files < fresh.files)
    assert(compacted.smallFileDebtBytes < fresh.smallFileDebtBytes,
      s"compact must shrink debt: ${fresh.smallFileDebtBytes} -> " +
        s"${compacted.smallFileDebtBytes}")

    new ClusterJob(t, targetFileBytes = target).run()
    val clustered = new AnalyzeJob(t, target).run()
    assert(clustered.clusterOverlap < fresh.clusterOverlap,
      s"cluster must shrink overlap: ${fresh.clusterOverlap} -> " +
        s"${clustered.clusterOverlap}")
    assert(clustered.clusterOverlap < 1.5,
      s"clustered overlap should approach 1, got ${clustered.clusterOverlap}")

    // an append on top re-raises overlap (full-span files stack up)
    AppendJob.append(t, DataGen.generate(spark, 2000, 7L, 4).toDF()
      .selectExpr("concat('x-', image_id) AS image_id", "bytes", "w", "h",
        "fmt", "caption", "phash"), 2)
    val appended = new AnalyzeJob(t, target).run()
    assert(appended.clusterOverlap > clustered.clusterOverlap)
    assert(appended.retainedVersions == 5)
    assert(appended.schemaFields == 8)
  }
}
