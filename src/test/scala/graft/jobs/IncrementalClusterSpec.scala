package graft.jobs

import graft.TestSpark
import graft.format.QTable
import graft.synth.DataGen
import graft.verify.ScanEquivalence
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental clustering: sort ONLY the files added since the last
  * cluster commit into a new sorted run, carrying the previous run's
  * outputs by reference — the LSM compromise that absorbs append debt
  * without re-sorting the table. */
class IncrementalClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("only post-cluster appends rewrite; prior run carries by reference") {
    val t = QTable.create(TestSpark.tmpDir("inc-cluster"), spark, buckets = 4)
    AppendJob.append(t, DataGen.generate(spark, 1200, 42L, 8).toDF(),
      filesPerBucket = 4)
    new ClusterJob(t, targetFileBytes = 256L << 10, minGroupBytes = 1L).run()
    val clustered = t.entries(t.currentSnapshot).map(_.path).toSet
    val clusteredBytes = t.entries(t.currentSnapshot).map(_.byteCount).sum

    // append debt (~1/4 of the table), then cluster incrementally
    AppendJob.append(t, DataGen.generate(spark, 300, 7L, 8).toDF()
      .withColumn("image_id", concat(lit("b2-"), col("image_id"))),
      filesPerBucket = 2)
    val pre = t.read()
    val debtBytes = t.entries(t.currentSnapshot)
      .filterNot(e => clustered.contains(e.path)).map(_.byteCount).sum

    val snap = new ClusterJob(t, targetFileBytes = 256L << 10,
      minGroupBytes = 1L, incremental = true).run()
    // rewrite touched ONLY the debt
    assert(snap.summary("bytes-rewritten").toLong == debtBytes)
    assert(snap.summary("bytes-rewritten").toLong < clusteredBytes / 2,
      "incremental run must not approach a full re-sort")
    // the previous run's files carry BY REFERENCE (same paths, no copy)
    val after = t.entries(snap).map(_.path).toSet
    assert(clustered.subsetOf(after),
      "previous sorted run must survive untouched")
    // logical rows unchanged
    val (ok, bad) = ScanEquivalence.check(pre, t.read(snap))
    assert(ok, s"$bad violations after incremental cluster")

    // a follow-up FULL run merges the runs: everything rewrites
    val full = new ClusterJob(t, targetFileBytes = 256L << 10,
      minGroupBytes = 1L).run()
    assert(t.entries(full).map(_.path).toSet.intersect(after).isEmpty,
      "full run merges all sorted runs")
  }

  test("incremental with no prior cluster degrades to a full run") {
    val t = QTable.create(TestSpark.tmpDir("inc-first"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 300, 9L, 8).toDF(),
      filesPerBucket = 2)
    val allBytes = t.entries(t.currentSnapshot).map(_.byteCount).sum
    val snap = new ClusterJob(t, targetFileBytes = 256L << 10,
      minGroupBytes = 1L, incremental = true).run()
    assert(snap.summary("bytes-rewritten").toLong == allBytes)
  }

  test("incremental run with no debt is a no-op commit-wise") {
    val t = QTable.create(TestSpark.tmpDir("inc-noop"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 200, 11L, 8).toDF(),
      filesPerBucket = 2)
    new ClusterJob(t, targetFileBytes = 256L << 10, minGroupBytes = 1L).run()
    val v = t.currentSnapshot.version
    val snap = new ClusterJob(t, targetFileBytes = 256L << 10,
      minGroupBytes = 1L, incremental = true).run()
    assert(snap.version == v, "nothing to sort => no new snapshot")
  }
}
