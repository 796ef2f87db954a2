package graft.format

import graft.TestSpark
import graft.jobs.{AppendJob, CompactJob, MergeJob}
import graft.synth.DataGen
import graft.verify.ScanEquivalence
import org.scalatest.funsuite.AnyFunSuite

/** Write-audit-publish: a staged commit claims its version but leaves
  * the hint — readers stay on the pre-job snapshot, the audit reads the
  * staged one explicitly, publish is one atomic hint flip, abort rolls
  * the claim back file-precisely. */
class StagedCommitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fresh(n: Long): QTable = {
    val t = QTable.create(TestSpark.tmpDir("wap"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, n, 42L, 2).toDF(), 4)
    t
  }

  test("stage -> audit -> publish: readers move only at the hint flip") {
    val t = fresh(400)
    val preHead = t.currentVersion
    val preFiles = t.entries(t.currentSnapshot).size

    val snap = new CompactJob(t.staged, targetFileBytes = 8L << 20).run()
    assert(snap.version == preHead + 1)
    // claim exists, hint does not move: readers still see the old layout
    assert(t.currentVersion == preHead, "staged commit must not publish")
    assert(t.stagedVersion.contains(preHead + 1))
    assert(t.entries(t.currentSnapshot).size == preFiles)

    // the audit reads the staged snapshot explicitly
    val (ok, bad) = ScanEquivalence.check(
      t.read(t.snapshotAt(preHead)), t.read(t.snapshotAt(snap.version)))
    assert(ok, s"$bad violations in staged audit")

    val published = t.publishStaged()
    assert(published.version == snap.version)
    assert(t.currentVersion == snap.version)
    assert(t.stagedVersion.isEmpty)
    assert(t.read().count() == 400)
  }

  test("staging owns the single-writer window; abort releases it file-precisely") {
    val t = fresh(300)
    val preHead = t.currentVersion
    val preFilePaths = t.entries(t.currentSnapshot).map(_.path).toSet

    val staged = new CompactJob(t.staged, targetFileBytes = 8L << 20).run()
    val stagedAdded = t.entries(t.snapshotAt(staged.version))
      .map(_.path).filterNot(preFilePaths.contains)
    assert(stagedAdded.nonEmpty)

    // a concurrent writer conflicts on the claimed version (no silent
    // publish past the gate)
    intercept[CommitConflictException] {
      val corr = DataGen.correctionsDF(spark, 300, 42L, inserts = 1)
      new MergeJob(t).run(corr)
    }

    val aborted = t.abortStaged()
    assert(aborted.contains(preHead + 1))
    assert(t.stagedVersion.isEmpty)
    assert(t.currentVersion == preHead)
    // the staged outputs are gone, the published file set is intact
    assert(stagedAdded.forall(p => !new java.io.File(p).exists()),
      "aborted staged outputs must be deleted")
    assert(preFilePaths.forall(p => new java.io.File(p).exists()),
      "abort must not touch published files")
    assert(t.read().count() == 300)

    // and the writer can proceed now
    val corr = DataGen.correctionsDF(spark, 300, 42L, inserts = 2)
    val m = new MergeJob(t).run(corr)
    assert(m.version == preHead + 1)
    assert(t.read().count() == 302)
  }

  test("abort with nothing staged is a no-op; publish demands a stage") {
    val t = fresh(50)
    assert(t.abortStaged().isEmpty)
    intercept[IllegalStateException] { t.publishStaged() }
  }
}
