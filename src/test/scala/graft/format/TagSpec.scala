package graft.format

import graft.TestSpark
import graft.jobs.{AppendJob, CompactJob, ExpireSnapshotsJob}
import graft.synth.DataGen
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot tags: immutable named refs, first-writer-wins creation, and
  * the retention contract — expiry keeps tagged versions (and their
  * files) readable until the tag is deleted. */
class TagSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fresh(n: Long): QTable = {
    val t = QTable.create(TestSpark.tmpDir("tag"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, n, 42L, 2).toDF(), 2)
    t
  }

  test("create/list/read/delete; re-point requires explicit delete") {
    val t = fresh(100)
    val ref = Tags.create(t, "release-1")
    assert(ref.version == t.currentVersion)
    assert(Tags.list(t).map(_.name) == Seq("release-1"))
    assert(Tags.read(t, "release-1").count() == 100)
    intercept[IllegalStateException] { Tags.create(t, "release-1") }
    assert(Tags.delete(t, "release-1"))
    assert(!Tags.delete(t, "release-1"))
    assert(Tags.list(t).isEmpty)
    intercept[IllegalArgumentException] { Tags.ref(t, "release-1") }
    intercept[IllegalArgumentException] { Tags.create(t, "bad/name") }
    intercept[IllegalArgumentException] { Tags.create(t, "x", version = 99L) }
  }

  test("expiry keeps tagged versions and their files; untag releases them") {
    val t = fresh(200)                                  // v1
    Tags.create(t, "training-v1")                       // pins v1
    new CompactJob(t, targetFileBytes = 64L << 20).run() // v2
    AppendJob.append(t, DataGen.generate(spark, 20, 7L, 2).toDF()
      .selectExpr("concat('x-', image_id) AS image_id", "bytes", "w", "h",
        "fmt", "caption", "phash"), 1)                  // v3
    val taggedFiles = t.entries(t.snapshotAt(1L)).map(_.path)

    val r1 = new ExpireSnapshotsJob(t).run(keepLast = 2)
    // v0 (create) expires; v1 survives by tag even though only v2/v3 are
    // in the keep-last window
    assert(!r1.expiredVersions.contains(1L),
      s"tagged v1 expired: ${r1.expiredVersions}")
    assert(t.listVersions.contains(1L))
    assert(Tags.read(t, "training-v1").count() == 200,
      "tagged snapshot must stay fully readable after expiry")
    assert(taggedFiles.forall(p => new java.io.File(p).exists()),
      "expiry deleted a file referenced by a tagged snapshot")

    Tags.delete(t, "training-v1")
    val r2 = new ExpireSnapshotsJob(t).run(keepLast = 2)
    assert(r2.expiredVersions.contains(1L), "untagged v1 must now expire")
    assert(!t.listVersions.contains(1L))
    // v1-only files are gone, current head still fully readable
    assert(t.read().count() == 220)
  }
}
