package graft.format

import graft.TestSpark
import graft.jobs.{AppendJob, CompactJob, MergeJob}
import graft.synth.DataGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental append scan ([[QTable.readIncremental]]) + snapshot
  * history metadata table: the CDC-style consumption surface. */
class IncrementalScanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tagged(seed: Long, n: Long, tag: String) =
    DataGen.generate(spark, n, seed).toDF()
      .withColumn("image_id", concat(lit(tag + "-"), col("image_id")))

  test("incremental read across appends and a compaction returns exactly the appended rows") {
    val root = TestSpark.tmpDir("inc-scan")
    val t = QTable.create(root, spark, buckets = 4)
    AppendJob.append(t, tagged(1L, 60, "a"), filesPerBucket = 2)  // v1
    AppendJob.append(t, tagged(2L, 40, "b"), filesPerBucket = 2)  // v2
    new CompactJob(t, targetFileBytes = 8L << 20).run()           // v3 rewrite
    AppendJob.append(t, tagged(3L, 25, "c"), filesPerBucket = 1)  // v4

    // (v1, v4]: batches b and c — the compaction contributes nothing even
    // though it rewrote every file
    val inc = t.readIncremental(1, 4).select("image_id").collect().map(_.getString(0))
    assert(inc.length == 65)
    assert(inc.forall(id => id.startsWith("b-") || id.startsWith("c-")))

    // (v2, v4]: only batch c
    val inc2 = t.readIncremental(2, 4).select("image_id").collect().map(_.getString(0))
    assert(inc2.length == 25 && inc2.forall(_.startsWith("c-")))

    // empty range and rewrite-only range are both empty
    assert(t.readIncremental(4, 4).count() == 0)
    assert(t.readIncremental(2, 3).count() == 0)

    // full-history read from table birth (create contributes nothing)
    assert(t.readIncremental(0, 4).count() == 125)
    assert(t.readIncremental(-1, 4).count() == 125)
  }

  test("incremental planning is manifest-level: appended files only, no O(table) file diff") {
    val root = TestSpark.tmpDir("inc-meta")
    val t = QTable.create(root, spark, buckets = 4)
    AppendJob.append(t, tagged(1L, 60, "a"), filesPerBucket = 2)
    val v1Files = t.entries(t.snapshotAt(1)).map(_.path).toSet
    AppendJob.append(t, tagged(2L, 40, "b"), filesPerBucket = 2)
    val added = t.addedEntries(1, 2)
    assert(added.nonEmpty)
    assert(added.map(_.path).toSet.intersect(v1Files).isEmpty)
    assert(added.map(_.rowCount).sum == 40)
  }

  test("incremental read refuses to cross a merge (rows changed, not appended)") {
    val root = TestSpark.tmpDir("inc-merge")
    val t = QTable.create(root, spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 50, 9L).toDF(), filesPerBucket = 1) // v1
    val corr = DataGen.correctionsDF(spark, 50, 9L, inserts = 2)
    new MergeJob(t).run(corr)                                                       // v2
    val e = intercept[IllegalArgumentException](t.readIncremental(1, 2))
    assert(e.getMessage.contains("merge"))
  }

  test("historyDF records version / operation / cumulative totals") {
    val root = TestSpark.tmpDir("inc-hist")
    val t = QTable.create(root, spark, buckets = 2)
    AppendJob.append(t, tagged(1L, 30, "a"), filesPerBucket = 1)
    AppendJob.append(t, tagged(2L, 20, "b"), filesPerBucket = 1)
    new CompactJob(t, targetFileBytes = 8L << 20).run()
    val h = t.historyDF.orderBy("version")
      .select("version", "operation", "total_rows").collect()
    assert(h.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((0L, "create", 0L), (1L, "append", 30L),
        (2L, "append", 50L), (3L, "compact", 50L)))
  }
}
