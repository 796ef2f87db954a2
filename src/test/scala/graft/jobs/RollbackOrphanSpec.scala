package graft.jobs

import graft.TestSpark
import graft.format.QTable
import graft.synth.DataGen
import graft.verify.ScanEquivalence
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

class RollbackOrphanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("rollback re-points at an earlier snapshot as a NEW commit") {
    val t = QTable.create(TestSpark.tmpDir("rb"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 200, 42L, 4).toDF(), 2) // v1
    val v1 = t.currentSnapshot
    val v1Df = t.read(v1)
    // a merge "gone wrong" commits v2
    val corr = DataGen.correctionsDF(spark, 200, 42L, inserts = 3)
    new MergeJob(t).run(corr) // v2
    assert(t.read().count() == 203)

    val snap = new RollbackJob(t).run(v1.version)
    assert(snap.operation == "rollback")
    assert(snap.version == 3L, "rollback must be a forward commit, not a rewind")
    assert(t.read().count() == 200)
    val (ok, bad) = ScanEquivalence.check(v1Df, t.read())
    assert(ok, s"$bad violations vs the rolled-back-to snapshot")
    // the bad snapshot remains inspectable until expiry
    assert(t.listVersions.contains(2L))
    intercept[IllegalArgumentException] { new RollbackJob(t).run(99L) }
  }

  test("rollback target resolves by version, tag name, or timestamp") {
    val t = QTable.create(TestSpark.tmpDir("rbres"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 100, 42L, 2).toDF(), 2) // v1
    val v1 = t.currentSnapshot
    graft.format.Tags.create(t, "release", v1.version)
    Thread.sleep(5) // ensure v2's commit timestamp is strictly after v1's
    AppendJob.append(t, DataGen.generate(spark, 50, 43L, 2).toDF(), 2)  // v2

    assert(RollbackJob.resolveTarget(t, Some("1"), None, None) == 1L)
    assert(RollbackJob.resolveTarget(t, None, Some("release"), None) == v1.version)
    // timestamp just after v1's commit resolves to v1 (youngest ancestor <= ts)
    assert(RollbackJob.resolveTarget(
      t, None, None, Some((v1.timestampMs + 1).toString)) == v1.version)
    intercept[IllegalArgumentException] {
      RollbackJob.resolveTarget(t, Some("1"), Some("release"), None)
    }
    intercept[IllegalArgumentException] {
      RollbackJob.resolveTarget(t, None, None, None)
    }
    // end-to-end through the job: tag-addressed rollback restores v1
    val snap = new RollbackJob(t).run(
      RollbackJob.resolveTarget(t, None, Some("release"), None))
    assert(snap.operation == "rollback")
    assert(t.read().count() == 100)
  }

  test("rollback across a rebucket restores the OLD bucket count with the old layout") {
    val t = QTable.create(TestSpark.tmpDir("rbrb"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 200, 42L, 4).toDF(), 2) // v1
    val v1 = t.currentSnapshot
    assert(v1.buckets == 2)
    new RebucketJob(t, newBuckets = 4, 8L << 20).run() // v2
    assert(t.currentSnapshot.buckets == 4)

    val snap = new RollbackJob(t).run(v1.version) // v3
    assert(snap.buckets == 2,
      "bucket count must travel with the restored manifests, not the rebucketed head")
    // appends after the rollback assign pbucket with the restored modulus:
    // merge-inserting a new row must land in a bucket < 2
    val corr = DataGen.correctionsDF(spark, 200, 42L, inserts = 2)
    new MergeJob(t).run(corr)
    val buckets = t.read().select("pbucket").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(buckets.forall(_ < 2), s"pbucket written with wrong modulus: $buckets")
    // and a rebucket AFTER the rollback sees the restored count (its
    // newBuckets != snap.buckets guard checks the right value)
    val re = new RebucketJob(t, newBuckets = 4, 8L << 20).run()
    assert(re.buckets == 4)
  }

  test("remove-orphans deletes only unreferenced leftovers") {
    val t = QTable.create(TestSpark.tmpDir("orph"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 200, 42L, 4).toDF(), 2) // v1
    val live = t.entries(t.currentSnapshot).map(_.path)

    // a crashed job attempt: data written under the table but never
    // committed to any snapshot and never checkpointed
    val orphanDir = t.newDataDir("crashed-job", "b0")
    DataGen.generate(spark, 20, 7L, 1).toDF()
      .write.parquet(orphanDir)
    val orphans = graft.format.ParquetStats.listParquet(orphanDir, t.hadoopConf)
    assert(orphans.nonEmpty)

    // a crashed-but-CHECKPOINTED group: its outputs must survive (a
    // resume will reuse them)
    val ckptDir = t.newDataDir("resumable-job", "b1")
    DataGen.generate(spark, 10, 8L, 1).toDF().write.parquet(ckptDir)
    val ckptFiles = t.harvest(ckptDir)
    val ckpt = new Checkpoint(t, "resumable-job")
    ckpt.commit(graft.model.LineageEntry("resumable-job", "compact", "b1",
      Seq("in"), ckptFiles, 10L, ckptFiles.map(_.byteCount).sum, "committed", 1))

    val dry = new RemoveOrphanFilesJob(t, graceMs = 0L).run(dryRun = true)
    assert(dry.deleted == orphans.size)
    orphans.foreach(p => assert(Files.exists(Paths.get(p)), "dry run must not delete"))

    val res = new RemoveOrphanFilesJob(t, graceMs = 0L).run()
    assert(res.deleted == orphans.size)
    orphans.foreach(p => assert(!Files.exists(Paths.get(p)), s"$p should be gone"))
    live.foreach(p => assert(Files.exists(Paths.get(p)), s"$p must survive"))
    ckptFiles.foreach(f => assert(Files.exists(Paths.get(f.path)),
      "checkpointed group outputs must survive for resume"))
    assert(t.read().count() == 200)
  }

  test("remove-orphans distributed path matches driver semantics") {
    val t = QTable.create(TestSpark.tmpDir("orphd"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 100, 42L, 2).toDF(), 2)
    val live = t.entries(t.currentSnapshot).map(_.path)
    // several crashed job dirs (the fan-out axis of the distributed lister)
    val orphans = (0 until 4).flatMap { k =>
      val d = t.newDataDir(s"crashed-$k", "b0")
      DataGen.generate(spark, 5, 100L + k, 1).toDF().write.parquet(d)
      graft.format.ParquetStats.listParquet(d, t.hadoopConf)
    }
    // a checkpointed group whose outputs must survive
    val ckptDir = t.newDataDir("resumable-d", "b1")
    DataGen.generate(spark, 5, 8L, 1).toDF().write.parquet(ckptDir)
    val ckptFiles = t.harvest(ckptDir)
    new Checkpoint(t, "resumable-d").commit(graft.model.LineageEntry(
      "resumable-d", "compact", "b1", Seq("in"), ckptFiles, 5L,
      ckptFiles.map(_.byteCount).sum, "committed", 1))

    // distributeThreshold=1 forces the Spark listing + anti-join + delete
    val dry = new RemoveOrphanFilesJob(t, graceMs = 0L, distributeThreshold = 1)
      .run(dryRun = true)
    assert(dry.deleted == orphans.size)
    orphans.foreach(p => assert(Files.exists(Paths.get(p)), "dry run must not delete"))

    val res = new RemoveOrphanFilesJob(t, graceMs = 0L, distributeThreshold = 1).run()
    assert(res.deleted == orphans.size)
    orphans.foreach(p => assert(!Files.exists(Paths.get(p)), s"$p should be gone"))
    live.foreach(p => assert(Files.exists(Paths.get(p)), s"$p must survive"))
    ckptFiles.foreach(f => assert(Files.exists(Paths.get(f.path)),
      "checkpointed outputs must survive the distributed sweep"))
    assert(t.read().count() == 100)
  }

  test("grace window: freshly written files are never orphan candidates") {
    val t = QTable.create(TestSpark.tmpDir("orph2"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 50, 42L, 2).toDF(), 1)
    DataGen.generate(spark, 5, 9L, 1).toDF()
      .write.parquet(t.newDataDir("in-flight-job", "b0"))
    // default grace (24h): the just-written in-flight files survive
    val res = new RemoveOrphanFilesJob(t).run()
    assert(res.deleted == 0, "grace window must protect in-flight writes")
  }
}
