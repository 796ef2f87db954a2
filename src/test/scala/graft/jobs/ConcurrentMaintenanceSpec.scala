package graft.jobs

import graft.TestSpark
import graft.format.{CommitConflictException, QTable}
import graft.synth.DataGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Snapshot-isolation under CONCURRENT writers: two maintenance jobs race
  * on the same table; optimistic concurrency makes one lose the version
  * claim and CommitRetry re-runs it against the winner's snapshot. The
  * re-run reuses checkpointed groups whose inputs the winner left alone
  * and re-does exactly the invalidated ones. */
class ConcurrentMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("concurrent compact + merge: both eventually commit, data correct") {
    val n = 600L
    val t = QTable.create(TestSpark.tmpDirUri("conc"), spark, buckets = 4)
    AppendJob.append(t, DataGen.generate(spark, n, 42L, 8).toDF(), filesPerBucket = 4)
    val corr = DataGen.correctionsDF(spark, n, 42L, inserts = 4).cache()
    corr.count()

    implicit val ec: ExecutionContext = ExecutionContext.global
    val fCompact = Future(CommitRetry.withCommitRetry(8) {
      new CompactJob(t, targetFileBytes = 8L << 20, jobId = "conc-compact").run()
    })
    val fMerge = Future(CommitRetry.withCommitRetry(8) {
      new MergeJob(t, jobId = "conc-merge").run(corr)
    })
    Await.result(Future.sequence(Seq(fCompact, fMerge)), 10.minutes)

    // both operations are in the committed history (order unspecified)
    val ops = t.listVersions.map(v => t.snapshotAt(v).operation)
    assert(ops.contains("compact") && ops.contains("merge"), s"history: $ops")

    // final state: all rows present, all corrections applied
    val post = t.read()
    assert(post.count() == n + 4)
    val wrong = post.join(corr.select(col("image_id"), col("caption").as("want")),
      Seq("image_id")).where(col("caption") =!= col("want")).count()
    assert(wrong == 0, s"$wrong corrections lost in the race")
    // no duplicate rows (a lost-update race would double image_ids)
    assert(post.groupBy("image_id").count().where(col("count") > 1).count() == 0)
    corr.unpersist()
  }

  test("schema evolution racing a compaction: both commit, schema and data intact") {
    // compact plans against the pre-evolution snapshot; if the rename (or
    // the compact) lands first the other loses the version claim and
    // CommitRetry re-runs it against the winner's snapshot — the retry
    // must pick up the NEW schema (physical names make any interleaving
    // readable; a lost schema would surface as a missing/null column)
    val n = 400L
    val t = QTable.create(TestSpark.tmpDirUri("conc-evo"), spark, buckets = 4)
    AppendJob.append(t, DataGen.generate(spark, n, 42L, 8).toDF(), filesPerBucket = 4)
    t.addColumn("tag", "string")
    AppendJob.append(t,
      DataGen.generate(spark, 50, 7L, 2).toDF()
        .withColumn("image_id", concat(lit("n-"), col("image_id")))
        .withColumn("tag", lit("keep")), 2)

    implicit val ec: ExecutionContext = ExecutionContext.global
    val fCompact = Future(CommitRetry.withCommitRetry(8) {
      new CompactJob(t, targetFileBytes = 8L << 20, jobId = "conc-evo-compact").run()
    })
    val fRename = Future(CommitRetry.withCommitRetry(8) { t.renameColumn("tag", "label") })
    Await.result(Future.sequence(Seq(fCompact, fRename)), 10.minutes)

    val ops = t.listVersions.map(v => t.snapshotAt(v).operation)
    assert(ops.contains("compact") && ops.contains("rename-column"), s"history: $ops")
    val post = t.read()
    assert(post.count() == n + 50)
    assert(post.columns.contains("label") && !post.columns.contains("tag"))
    assert(post.where(col("label") === "keep").count() == 50,
      "evolved-column values lost in the race")
  }

  test("withCommitRetry rethrows after maxAttempts conflicts") {
    var calls = 0
    intercept[CommitConflictException] {
      CommitRetry.withCommitRetry(3, backoffMs = 1L) {
        calls += 1
        throw new CommitConflictException("always")
      }
    }
    assert(calls == 3)
  }
}
