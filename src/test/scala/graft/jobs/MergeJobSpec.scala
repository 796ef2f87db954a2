package graft.jobs

import graft.TestSpark
import graft.format.QTable
import graft.synth.DataGen
import graft.verify.ScanEquivalence
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MergeJobSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshTable(n: Long, buckets: Int = 4): QTable = {
    val t = QTable.create(TestSpark.tmpDir("merge"), spark, buckets)
    AppendJob.append(t, DataGen.generate(spark, n, 42L, 8).toDF(), filesPerBucket = 4)
    t
  }

  test("copy-on-write MERGE: updates applied, inserts added, rest untouched") {
    val n = 1000L
    val t = freshTable(n)
    val pre = t.currentSnapshot
    val preDf = t.read(pre).cache()
    val corr = DataGen.correctionsDF(spark, n, 42L, inserts = 5).cache()
    val nCorr = corr.count()
    assert(nCorr > 5, "fixture should contain some updates")

    val snap = new MergeJob(t).run(corr)
    assert(snap.operation == "merge")
    val post = t.read(snap)

    // row count grew by exactly the inserts
    assert(post.count() == n + 5)
    // every correction id carries the corrected caption
    val wrong = post.join(corr.select(col("image_id"), col("caption").as("want")),
      Seq("image_id")).where(col("caption") =!= col("want")).count()
    assert(wrong == 0, s"$wrong corrected captions missing")
    // full oracle: expected = pre upserted with corrections
    val (ok, bad) = ScanEquivalence.checkMerged(preDf, post, corr)
    assert(ok, s"$bad violations vs merged expectation")

    // copy-on-write: files without matches are carried by reference
    val prePaths = t.entries(pre).map(_.path).toSet
    val postPaths = t.entries(snap).map(_.path).toSet
    val carried = prePaths.intersect(postPaths)
    assert(carried.nonEmpty, "merge rewrote every file — not copy-on-write")
    val summary = snap.summary
    assert(summary("rows-inserted") == "5")
    assert(summary("files-rewritten").toInt < prePaths.size)
    preDf.unpersist(); corr.unpersist()
  }

  test("merge with no matches only inserts") {
    val t = freshTable(200, buckets = 2)
    val preCount = t.read().count()
    import spark.implicits._
    val onlyNew = DataGen.generate(spark, 3, 99L, 1)
      .map(r => r.copy(image_id = "zzz-" + r.image_id)).toDF()
    val snap = new MergeJob(t).run(onlyNew)
    assert(t.read(snap).count() == preCount + 3)
    assert(snap.summary("rows-updated") == "0")
  }

  test("empty source is a no-op: same snapshot, no new version") {
    val t = freshTable(100, buckets = 2)
    val pre = t.currentSnapshot
    val empty = DataGen.generate(spark, 1, 1L, 1).toDF().limit(0)
    val snap = new MergeJob(t).run(empty)
    assert(snap.version == pre.version, "empty merge must not commit")
  }

  test("duplicate source image_ids are rejected (ANSI multi-match)") {
    val t = freshTable(100, buckets = 2)
    val one = DataGen.generate(spark, 1, 42L, 1).toDF()
    val dup = one.union(one)
    val ex = intercept[IllegalArgumentException] { new MergeJob(t).run(dup) }
    assert(ex.getMessage.contains("duplicated image_id"))
  }

  test("merge is resumable per group") {
    val n = 800L
    val t = freshTable(n)
    val corr = DataGen.correctionsDF(spark, n, 42L, inserts = 2).cache()
    val jobId = "merge-resume"
    intercept[RuntimeException] {
      new MergeJob(t, jobId = jobId).run(corr, failAfterGroups = 1)
    }
    val before = new Checkpoint(t, jobId).committed
    assert(before.nonEmpty)
    val snap = new MergeJob(t, jobId = jobId).run(corr)
    val preDf = t.read(t.snapshotAt(snap.version - 1))
    val (ok, bad) = ScanEquivalence.checkMerged(preDf, t.read(snap), corr)
    assert(ok, s"$bad violations after resumed merge")
    corr.unpersist()
  }
}
