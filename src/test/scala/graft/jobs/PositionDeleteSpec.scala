package graft.jobs

import graft.TestSpark
import graft.format.QTable
import graft.synth.DataGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read position deletes: DeleteJob, delete-applied reads,
  * folding by the rewrite jobs, MOR MERGE, and the metadata lifecycle
  * (rollback/expiry/orphans/changelog/DataSource). */
class PositionDeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fresh(n: Long, buckets: Int = 4, filesPerBucket: Int = 2): QTable = {
    val t = QTable.create(TestSpark.tmpDir("posdel"), spark, buckets)
    AppendJob.append(t, DataGen.generate(spark, n, 42L, 8).toDF(),
      filesPerBucket = filesPerBucket)
    t
  }

  test("MOR delete: rows vanish without touching data files; time travel intact") {
    val t = fresh(600)
    val v0 = t.currentSnapshot

    val s1 = new DeleteJob(t).run(col("image_id").endsWith("0"))
    assert(s1.operation == "delete")
    assert(s1.summary("deleted-rows").toLong == 60)
    assert(s1.deleteFiles.nonEmpty)
    // no data file was written or removed — that is the point of MOR
    assert(t.entries(s1).map(_.path).toSet == t.entries(v0).map(_.path).toSet)

    assert(t.read().count() == 540)
    assert(t.read().where(col("image_id").endsWith("0")).count() == 0)
    // the indexed (Catalyst FileIndex) read path applies deletes too
    assert(t.readIndexed()._1.count() == 540)
    // snapshot isolation: the pre-delete snapshot still reads everything
    assert(t.read(v0).count() == 600)

    // re-deleting already-dead rows is a no-op commit
    val s2 = new DeleteJob(t).run(col("image_id").endsWith("0"))
    assert(s2.version == s1.version)

    // a second delete accumulates entries; both sets apply
    val s3 = new DeleteJob(t).run(col("image_id").endsWith("1"))
    assert(s3.deleteFiles.size == s1.deleteFiles.size + 1)
    assert(t.read().count() == 480)
    assert(s3.summary("total-delete-rows").toLong == 120)
  }

  test("compact folds deletes and plans delete-referenced files as mandatory work") {
    val t = fresh(600)
    // with a tiny target every file is "large": no compactable debt
    val compactor = new CompactJob(t, targetFileBytes = 1024)
    assert(compactor.plan(t.currentSnapshot).isEmpty,
      "fixture files should all sit above the small-file threshold")

    val sDel = new DeleteJob(t).run(col("image_id").endsWith("7"))
    val liveIds = t.read().select("image_id").collect().map(_.getString(0)).sorted
    assert(liveIds.length == 540)

    // the same planner now rewrites the delete-referenced files
    val plans = new CompactJob(t, targetFileBytes = 1024).plan(t.currentSnapshot)
    assert(plans.nonEmpty, "files with deletes must be mandatory compaction work")

    val sC = new CompactJob(t, targetFileBytes = 8L << 20).run()
    assert(sC.operation == "compact")
    assert(sC.deleteFiles.isEmpty, "unscoped compact must fold every delete")
    val postIds = t.read(sC).select("image_id").collect().map(_.getString(0)).sorted
    assert(postIds.toSeq == liveIds.toSeq)
    // incremental scan treats the fold as row-preserving
    assert(t.readIncremental(sDel.version, sC.version).count() == 0)
  }

  test("scoped compact carries out-of-scope deletes; a full pass clears them") {
    val t = fresh(800)
    new DeleteJob(t).run(col("pbucket").isin(1, 2) && col("image_id").endsWith("3"))
    val liveCount = t.read().count()
    assert(liveCount < 800)

    val sScoped = new CompactJob(t, targetFileBytes = 8L << 20,
      bucketScope = Some(Set(1))).run()
    // bucket-2 rows still carry position deletes — entries must survive
    assert(sScoped.deleteFiles.nonEmpty,
      "scoped compact dropped delete entries still referencing live files")
    assert(t.read(sScoped).count() == liveCount)
    assert(t.read(sScoped).where(col("image_id").endsWith("3") &&
      col("pbucket").isin(1, 2)).count() == 0)

    val sFull = new CompactJob(t, targetFileBytes = 8L << 20).run()
    assert(sFull.deleteFiles.isEmpty)
    assert(t.read(sFull).count() == liveCount)
  }

  test("cluster rewrite folds deletes") {
    val t = fresh(500)
    new DeleteJob(t).run(col("image_id").endsWith("9"))
    val live = t.read().count()
    val sZ = new ClusterJob(t, targetFileBytes = 8L << 20).run()
    assert(sZ.deleteFiles.isEmpty)
    assert(t.read(sZ).count() == live)
    assert(t.read(sZ).where(col("image_id").endsWith("9")).count() == 0)
  }

  test("CoW merge after MOR delete: deleted key re-inserts instead of vanishing") {
    val t = fresh(400)
    new DeleteJob(t).run(col("image_id").endsWith("5"))
    assert(t.read().count() == 360)

    // a correction for a DELETED id must be an INSERT (the row is dead);
    // without delete-applied merge reads it would silently vanish
    import spark.implicits._
    val corr = DataGen.generate(spark, 400, 42L, 1)
      .filter(_.image_id.endsWith("5")).limit(1)
      .map(r => r.copy(caption = "re-added")).toDF()
    assert(corr.count() == 1)
    val sM = new MergeJob(t).run(corr)
    val got = t.read(sM).where(col("caption") === "re-added")
    assert(got.count() == 1, "merge lost the insert of a position-deleted key")
    assert(t.read(sM).count() == 361)
  }

  test("MOR merge produces the same table as CoW merge, appending instead of rewriting") {
    def build(): QTable = fresh(600, filesPerBucket = 2)
    val (t1, t2) = (build(), build())
    val base = t1.read()
    // updates (captions), flagged deletes, one unmatched ghost, inserts
    // (full rows — MERGE inserts need every table column)
    import spark.implicits._
    val placeholder = Seq(lit(Array[Byte](0)).as("bytes"), lit(1).as("w"),
      lit(1).as("h"), lit("png").as("fmt"), lit(0L).as("phash"))
    val upd = base.where(col("image_id").endsWith("2"))
      .select(Seq(col("image_id"),
        concat(lit("upd: "), col("image_id")).as("caption"),
        lit(false).as("is_delete")) ++ placeholder: _*)
    val del = base.where(col("image_id").endsWith("8"))
      .select(Seq(col("image_id"), lit("x").as("caption"),
        lit(true).as("is_delete")) ++ placeholder: _*)
    val ghost = spark.range(1)
      .select(Seq(lit("zzz-ghost").as("image_id"), lit("g").as("caption"),
        lit(true).as("is_delete")) ++ placeholder: _*)
    val ins = DataGen.generate(spark, 3, 99L, 1)
      .map(r => r.copy(image_id = "zzz-" + r.image_id)).toDF()
      .withColumn("is_delete", lit(false))
      .select("image_id", "caption", "is_delete", "bytes", "w", "h", "fmt", "phash")
    val corr = upd.union(del).union(ghost).union(ins)

    val sCow = new MergeJob(t1, deleteCol = Some("is_delete")).run(corr)
    val sMor = new MergeJob(t2, deleteCol = Some("is_delete"),
      mergeOnRead = true).run(corr)

    // identical logical tables
    val a = t1.read(sCow).select("image_id", "caption")
    val b = t2.read(sMor).select("image_id", "caption")
    assert(a.count() == b.count())
    assert(a.join(b, Seq("image_id", "caption"), "left_anti").count() == 0)
    assert(b.join(a, Seq("image_id", "caption"), "left_anti").count() == 0)

    // MOR commit shape: every pre-merge data file carried by reference,
    // deletes recorded instead of rewrites
    val pre = t2.entries(t2.snapshotAt(sMor.parentVersion)).map(_.path).toSet
    val post = t2.entries(sMor).map(_.path).toSet
    assert(pre.subsetOf(post), "MOR merge must not remove/rewrite data files")
    assert(sMor.deleteFiles.nonEmpty)
    assert(sMor.summary("strategy") == "merge-on-read")
    assert(sMor.summary("rows-deleted") == sCow.summary("rows-deleted"))
    assert(sMor.summary("rows-inserted") == sCow.summary("rows-inserted"))
    assert(sMor.summary("rows-updated") == sCow.summary("rows-updated"))

    // folding leaves the same table
    val sC = new CompactJob(t2, targetFileBytes = 8L << 20).run()
    assert(sC.deleteFiles.isEmpty)
    val c = t2.read(sC).select("image_id", "caption")
    assert(c.count() == a.count())
    assert(a.join(c, Seq("image_id", "caption"), "left_anti").count() == 0)
  }

  test("rollback restores deleted rows; changelog follows deletes both ways") {
    val t = fresh(300)
    val vAppend = t.currentVersion
    val sDel = new DeleteJob(t).run(col("image_id").endsWith("4"))
    assert(t.read().count() == 270)

    // changelog across the delete: 30 delete rows, nothing else
    val ch1 = t.readChanges(vAppend, sDel.version)
    assert(ch1.count() == 30)
    assert(ch1.where(col("_change_type") === "delete").count() == 30)
    assert(ch1.where(col("image_id").endsWith("4")).count() == 30)

    val sRb = new RollbackJob(t).run(vAppend)
    assert(t.read(sRb).count() == 300, "rollback must restore position-deleted rows")
    // changelog across the rollback: the same 30 rows come back as inserts
    val ch2 = t.readChanges(sDel.version, sRb.version)
    assert(ch2.count() == 30)
    assert(ch2.where(col("_change_type") === "insert").count() == 30)

    // expiry: once only the rollback snapshot is retained, the delete
    // file (referenced solely by the delete snapshot) is swept
    val delPath = sDel.deleteFiles.head.path
    assert(new java.io.File(delPath).exists())
    val res = new ExpireSnapshotsJob(t).run(keepLast = 1)
    assert(res.expiredVersions.contains(sDel.version))
    assert(!new java.io.File(delPath).exists(), "expired delete file not swept")
    assert(t.read().count() == 300)
  }

  test("orphan sweep keeps live delete files") {
    val t = fresh(200, buckets = 2)
    val sDel = new DeleteJob(t).run(col("image_id").endsWith("6"))
    val live = t.read().count()
    new RemoveOrphanFilesJob(t, graceMs = 0L).run()
    assert(new java.io.File(sDel.deleteFiles.head.path).exists(),
      "orphan sweep deleted a live position-delete file")
    assert(t.read().count() == live)
  }

  test("rewrite-deletes consolidates delete files without changing live rows") {
    val t = fresh(600)
    new DeleteJob(t).run(col("image_id").endsWith("0"))
    new DeleteJob(t).run(col("image_id").endsWith("1"))
    new DeleteJob(t).run(col("image_id").endsWith("2"))
    val before = t.currentSnapshot
    assert(before.deleteFiles.size == 3)
    val live = t.read().count()
    assert(live == 420)

    val s = new RewriteDeletesJob(t).run()
    assert(s.operation == "rewrite-deletes")
    assert(s.deleteFiles.size == 1)
    assert(s.summary("total-delete-rows").toLong == 180)
    assert(t.read(s).count() == live)
    assert(t.entries(s).map(_.path).toSet == t.entries(before).map(_.path).toSet)
    // row-preserving: incremental scan and changelog both skip it
    assert(t.readIncremental(before.version, s.version).count() == 0)
    assert(t.readChanges(before.version, s.version).count() == 0)
    // superseded delete files die with their snapshots at expiry
    val oldPaths = before.deleteFiles.map(_.path)
    new ExpireSnapshotsJob(t).run(keepLast = 1)
    oldPaths.foreach(p => assert(!new java.io.File(p).exists(),
      s"superseded delete file survived expiry: $p"))
    assert(t.read().count() == live)
  }

  test("resume after crash does not reuse a group output that predates a delete") {
    // compact commits one group's checkpoint, driver dies, a DELETE
    // lands, the SAME jobId resumes: the checkpointed output did not
    // fold the new deletes, so its reuse would resurrect them — the
    // delete files in the checkpoint input identity force a re-run
    val t = fresh(600)
    // minGroupBytes=1 keeps each bucket its own group so the crash lands
    // between group commits
    intercept[RuntimeException] {
      new CompactJob(t, targetFileBytes = 8L << 20, jobId = "crash-del",
        minGroupBytes = 1L).run(failAfterGroups = 1)
    }
    assert(new Checkpoint(t, "crash-del").committed.nonEmpty)

    new DeleteJob(t).run(col("image_id").endsWith("4"))
    val live = t.read().count()
    assert(live == 540)

    val sC = new CompactJob(t, targetFileBytes = 8L << 20, jobId = "crash-del",
      minGroupBytes = 1L).run()
    assert(sC.deleteFiles.isEmpty)
    assert(t.read(sC).count() == live,
      "resumed compact reused a pre-delete group output — rows resurrected")
    assert(t.read(sC).where(col("image_id").endsWith("4")).count() == 0)
  }

  test("concurrent delete + compact: both commit, no resurrection either order") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val t = fresh(600)
    val fDel = Future(CommitRetry.withCommitRetry(8) {
      new DeleteJob(t, jobId = "race-del").run(col("image_id").endsWith("1"))
    })
    val fCompact = Future(CommitRetry.withCommitRetry(8) {
      new CompactJob(t, targetFileBytes = 8L << 20, jobId = "race-compact").run()
    })
    Await.result(Future.sequence(Seq(fDel, fCompact)), 10.minutes)
    val ops = t.listVersions.map(v => t.snapshotAt(v).operation)
    assert(ops.contains("delete") && ops.contains("compact"), s"history: $ops")
    val post = t.read()
    assert(post.count() == 540, s"expected 540 live rows, got ${post.count()}")
    assert(post.where(col("image_id").endsWith("1")).count() == 0)
    assert(post.groupBy("image_id").count().where(col("count") > 1).count() == 0)
  }

  test("targeted delete prunes the scan via manifest stats") {
    // appends slice files by (pbucket, image_id) range, so a point
    // predicate must open only the files whose id range can match —
    // a one-row DELETE at 10^12 rows cannot be a table scan
    val t = fresh(600, buckets = 4, filesPerBucket = 4)
    val s = new DeleteJob(t).run(col("image_id") === "img000000000042")
    assert(s.summary("deleted-rows") == "1")
    assert(s.summary("files-scanned").toInt < s.summary("files-total").toInt,
      s"point delete scanned ${s.summary("files-scanned")}/${s.summary("files-total")} files")
    assert(t.read().where(col("image_id") === "img000000000042").count() == 0)
    assert(t.read().count() == 599)
  }

  test("delete anti-join broadcasts the delete side and scans data once") {
    val t = fresh(400)
    new DeleteJob(t).run(col("image_id").endsWith("3"))
    val df = t.read()
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the live delete set is KB-sized vs a TB-scale data side: the
    // anti-join must broadcast it, never shuffle the table
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast left-anti delete application, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"delete application shuffled the data side:\n$plan")
  }

  test("DataSource reads apply live deletes via the fallback; fast path after a fold") {
    val t = fresh(200, buckets = 2)
    new DeleteJob(t).run(col("image_id").endsWith("2"))
    // live deletes: served through the decorated-scan fallback with the
    // anti-joins applied — deleted rows invisible immediately
    val fb = spark.read.format("qtable").load(t.root)
    assert(fb.count() == t.read().count())
    assert(fb.where(col("image_id").endsWith("2")).count() == 0)
    new CompactJob(t, targetFileBytes = 8L << 20).run()
    assert(spark.read.format("qtable").load(t.root).count() == t.read().count())
  }
}
