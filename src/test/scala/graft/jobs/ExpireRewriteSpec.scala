package graft.jobs

import graft.TestSpark
import graft.format.QTable
import graft.synth.DataGen
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

class ExpireRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("expire snapshots deletes only unreferenced files, keeps current") {
    val t = QTable.create(TestSpark.tmpDir("expire"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 300, 42L, 4).toDF(), filesPerBucket = 4) // v1
    val v1Files = t.entries(t.currentSnapshot).map(_.path)
    new CompactJob(t, targetFileBytes = 8L << 20).run() // v2 rewrites most files
    val v2 = t.currentSnapshot
    val v2Files = t.entries(v2).map(_.path).toSet

    // before expiry, old small files still exist (isolation window)
    assert(v1Files.forall(p => Files.exists(Paths.get(p))))

    val res = new ExpireSnapshotsJob(t).run(keepLast = 1)
    assert(res.expiredVersions == Seq(0L, 1L))
    // v1-only files gone; current snapshot files intact
    val v1Only = v1Files.filterNot(v2Files.contains)
    assert(v1Only.nonEmpty)
    v1Only.foreach(p => assert(!Files.exists(Paths.get(p)), s"$p should be deleted"))
    v2Files.foreach(p => assert(Files.exists(Paths.get(p)), s"$p must survive"))
    // table still reads fine and fully
    assert(t.read().count() == 300)
    assert(t.listVersions == Seq(2L))
    // expired version files gone
    assert(!Files.exists(Paths.get(t.metadataDir, "v1.json")))
  }

  test("expire deletes identically on both sides of the distribute threshold") {
    // same table shape twice: once forced sequential (threshold above the
    // dead-file count), once forced distributed (threshold 1) — results
    // and on-disk state must agree, like the orphan/footer threshold specs
    def build(tag: String): QTable = {
      val t = QTable.create(TestSpark.tmpDir(s"expire-$tag"), spark, buckets = 2)
      AppendJob.append(t, DataGen.generate(spark, 200, 42L, 4).toDF(), filesPerBucket = 6)
      new CompactJob(t, targetFileBytes = 8L << 20).run()
      t
    }
    val seqT = build("seq")
    val distT = build("dist")
    val seqDead = seqT.entries(seqT.snapshotAt(1)).map(_.path)
      .filterNot(seqT.entries(seqT.currentSnapshot).map(_.path).toSet)
    assert(seqDead.size > 1, "fixture needs multiple dead files")

    val seqRes = new ExpireSnapshotsJob(seqT, distributeThreshold = Int.MaxValue)
      .run(keepLast = 1)
    val distRes = new ExpireSnapshotsJob(distT, distributeThreshold = 1)
      .run(keepLast = 1)
    assert(seqRes.deletedDataFiles == distRes.deletedDataFiles,
      s"sequential ${seqRes.deletedDataFiles} != distributed ${distRes.deletedDataFiles}")
    assert(seqRes.deletedManifests == distRes.deletedManifests)
    Seq(seqT, distT).foreach { t =>
      assert(t.read().count() == 200)
      t.entries(t.currentSnapshot).foreach(f =>
        assert(Files.exists(Paths.get(f.path)), s"${f.path} must survive"))
      assert(t.listVersions == Seq(2L))
    }
    // distributed run really removed the dead files from disk
    distT.entries(distT.currentSnapshot) // (current set checked above)
  }

  test("rewrite manifests: metadata-only commit, same files, fewer manifests") {
    val t = QTable.create(TestSpark.tmpDir("rwm"), spark, buckets = 2)
    // several appends => several manifests
    (1 to 4).foreach { k =>
      AppendJob.append(t, DataGen.generate(spark, 50, 42L + k, 2).toDF(), filesPerBucket = 2)
    }
    val pre = t.currentSnapshot
    val preFiles = t.entries(pre).map(_.path).sorted
    assert(pre.manifests.size > 1)

    val snap = new RewriteManifestsJob(t).run(entriesPerManifest = 1000)
    assert(snap.operation == "rewrite-manifests")
    assert(snap.manifests.size == 1)
    assert(t.entries(snap).map(_.path).sorted == preFiles, "file set must not change")
    // manifests sorted by (pbucket, phash): verify ordering inside manifest
    val files = t.readManifest(snap.manifests.head).files
    val keys = files.map(f => (f.pbucketMin, f.phashMin))
    assert(keys == keys.sorted)
  }

  test("expire across shared-manifest chains (appends + metadata-only commits)") {
    // regression: expired snapshots that share manifests by reference
    // (append chains, add/rename/drop-column) used to crash expire on
    // the second referencing version (manifest already deleted)
    val t = QTable.create(TestSpark.tmpDir("expire-shared"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 100, 42L, 2).toDF(), 2)  // v1
    AppendJob.append(t,                                                  // v2 reuses v1 manifests
      DataGen.generate(spark, 50, 7L, 1).toDF()
        .withColumn(
          "image_id",
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit("n-"),
            org.apache.spark.sql.functions.col("image_id"))), 1)
    t.addColumn("tag", "string")                                         // v3 reuses v2 manifests
    t.renameColumn("tag", "label")                                       // v4 reuses v3 manifests
    new CompactJob(t, targetFileBytes = 8L << 20).run()                  // v5 full rewrite
    val cur = t.currentSnapshot
    val curFiles = t.entries(cur).map(_.path)

    val res = new ExpireSnapshotsJob(t).run(keepLast = 1)
    assert(res.expiredVersions == Seq(0L, 1L, 2L, 3L, 4L))
    assert(t.listVersions == Seq(5L))
    // every pre-rewrite data file is gone, the current set intact
    assert(res.deletedDataFiles > 0)
    curFiles.foreach(p => assert(Files.exists(Paths.get(p)), s"$p must survive"))
    assert(t.read().count() == 150)
  }

  test("expire refuses keepLast < 1") {
    val t = QTable.create(TestSpark.tmpDir("expire2"), spark, buckets = 2)
    intercept[IllegalArgumentException] { new ExpireSnapshotsJob(t).run(0) }
  }

  test("age-based retention: commits younger than the cutoff never expire") {
    val t = QTable.create(TestSpark.tmpDir("expire-age"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 60, 3L, 4).toDF(), 1)  // v1
    AppendJob.append(t, DataGen.generate(spark, 60, 4L, 4).toDF()
      .withColumn("image_id",
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("b-"),
          org.apache.spark.sql.functions.col("image_id"))), 1)         // v2
    new CompactJob(t, targetFileBytes = 8L << 20).run()                // v3
    val oldest = t.listVersions.map(v => t.snapshotAt(v).timestampMs).min

    // cutoff at/before the oldest commit: every version is "young",
    // so even keepLast=1 expires nothing
    val kept = new ExpireSnapshotsJob(t).run(1, Some(oldest))
    assert(kept.expiredVersions.isEmpty && t.listVersions.size == 4)

    // cutoff in the future: the age term protects nothing and the
    // keepLast term governs alone
    val res = new ExpireSnapshotsJob(t)
      .run(1, Some(System.currentTimeMillis() + 3600 * 1000))
    assert(res.expiredVersions == Seq(0L, 1L, 2L))
    assert(t.listVersions == Seq(3L) && t.read().count() == 120)
  }

  test("dry-run prices the reclaim and deletes nothing") {
    val t = QTable.create(TestSpark.tmpDir("expire-dry"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 200, 42L, 4).toDF(),
      filesPerBucket = 4)                                              // v1
    new CompactJob(t, targetFileBytes = 8L << 20).run()                // v2
    val versionsBefore = t.listVersions
    val deadBytes = t.entries(t.snapshotAt(1)).map(_.path).toSet
      .diff(t.entries(t.currentSnapshot).map(_.path).toSet)

    val dry = new ExpireSnapshotsJob(t).run(keepLast = 1, dryRun = true)
    assert(dry.dryRun && dry.expiredVersions == Seq(0L, 1L))
    assert(dry.deletedDataFiles == deadBytes.size)
    assert(dry.reclaimableBytes > 0)
    // nothing was touched: versions, metadata, data files all intact
    assert(t.listVersions == versionsBefore)
    deadBytes.foreach(p => assert(Files.exists(Paths.get(p)), s"$p must survive a dry-run"))

    // the real run then deletes exactly what the dry-run priced
    val real = new ExpireSnapshotsJob(t).run(keepLast = 1)
    assert(real.expiredVersions == dry.expiredVersions)
    assert(real.deletedDataFiles == dry.deletedDataFiles)
    assert(real.reclaimableBytes == dry.reclaimableBytes)
  }
}
