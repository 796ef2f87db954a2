package graft.jobs

import graft.TestSpark
import graft.format.QTable
import graft.synth.DataGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** NDV sketches: accuracy vs exact distinct counts, the incremental
  * (only-new-files) analyze contract, the zero-scan estimate path on an
  * analyzed table, and the scan fallback covering post-analyze appends. */
class NdvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // lgK=12 -> published relative standard error 1.04/sqrt(4096) ~ 1.6%;
  // 5 sigma keeps the assertion deterministic for fixed seeds
  private val Tol = 0.09

  private def exactDistinct(t: QTable, c: String): Long =
    t.read().select(c).distinct().count()

  private def within(est: Long, exact: Long): Boolean =
    math.abs(est - exact) <= math.max(1L, (exact * Tol).toLong)

  test("estimates track exact NDV; analyzed table estimates with zero scans") {
    val t = QTable.create(TestSpark.tmpDir("ndv"), spark, buckets = 4)
    AppendJob.append(t, DataGen.generate(spark, 3000, 42L, 4).toDF(),
      filesPerBucket = 4)

    val cols = Seq("image_id", "caption", "fmt", "w")
    val s1 = new NdvSketchJob(t, cols).run()
    assert(s1.operation == "analyze-ndv")
    assert(s1.summary("files-sketched").toInt == 16)

    val r = NdvEstimate.run(t, t.currentSnapshot, cols)
    assert(r.filesScanned == 0, "analyzed table must estimate from sketches only")
    assert(r.filesFromSketch == r.filesTotal)
    cols.foreach { c =>
      val exact = exactDistinct(t, c)
      val est = r.estimates(c)
      assert(within(est, exact), s"$c: estimate $est vs exact $exact")
    }

    // re-running the analyze is a no-op: nothing pending, no new commit
    val s2 = new NdvSketchJob(t, cols).run()
    assert(s2.version == s1.version, "no-op analyze must not commit")
  }

  test("post-analyze appends fall back to scanning exactly the new files; re-analyze is incremental") {
    val t = QTable.create(TestSpark.tmpDir("ndv2"), spark, buckets = 4)
    AppendJob.append(t, DataGen.generate(spark, 2000, 42L, 4).toDF(),
      filesPerBucket = 2)
    new NdvSketchJob(t, Seq("image_id")).run()

    // new rows with DISTINCT ids (prefix) so the union is detectable
    AppendJob.append(t, DataGen.generate(spark, 1000, 7L, 4).toDF()
      .withColumn("image_id", concat(lit("x-"), col("image_id"))), 2)

    val r = NdvEstimate.run(t, t.currentSnapshot, Seq("image_id"))
    assert(r.filesScanned == 8, s"exactly the appended files scan, got ${r.filesScanned}")
    assert(within(r.estimates("image_id"), 3000),
      s"union estimate ${r.estimates("image_id")} vs 3000")

    // incremental re-analyze touches only the 8 new files, and carries
    // every already-analyzed manifest by reference (O(touched metadata))
    val analyzedManifests = t.currentSnapshot.manifests.filter(m =>
      t.readManifest(m).files.forall(_.ndvSketches.nonEmpty)).map(_.path).toSet
    assert(analyzedManifests.nonEmpty)
    val s = new NdvSketchJob(t, Seq("image_id")).run()
    assert(s.summary("files-sketched").toInt == 8)
    assert(s.summary("manifests-reused").toInt == analyzedManifests.size)
    assert(analyzedManifests.subsetOf(s.manifests.map(_.path).toSet),
      "already-analyzed manifests must be reused by reference")
    val r2 = NdvEstimate.run(t, t.currentSnapshot, Seq("image_id"))
    assert(r2.filesScanned == 0)
    assert(within(r2.estimates("image_id"), 3000))
  }

  test("schema-evolved column: sketches keyed by physical name survive a rename") {
    val t = QTable.create(TestSpark.tmpDir("ndv3"), spark, buckets = 2)
    t.addColumn("alt_text", "string")
    AppendJob.append(t, DataGen.generate(spark, 500, 42L, 2).toDF()
      .withColumn("alt_text", concat(lit("alt for "), col("image_id"))),
      filesPerBucket = 2)
    new NdvSketchJob(t, Seq("alt_text")).run()
    t.renameColumn("alt_text", "alt")
    val r = NdvEstimate.run(t, t.currentSnapshot, Seq("alt"))
    assert(r.filesScanned == 0, "rename is metadata-only; sketches must survive")
    val exact = t.read().select("alt").distinct().count()
    assert(exact == 500L)
    assert(within(r.estimates("alt"), exact))
  }

  test("analyze-ndv is row-preserving: incremental scan and changelog skip it") {
    val t = QTable.create(TestSpark.tmpDir("ndv5"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 300, 42L, 2).toDF(), 2)  // v1
    new NdvSketchJob(t, Seq("image_id")).run()                           // v2
    AppendJob.append(t, DataGen.generate(spark, 100, 7L, 2).toDF()
      .withColumn("image_id", concat(lit("x-"), col("image_id"))), 2)    // v3
    // the stats commit contributes no appended rows and no change rows —
    // a CDC follower or incremental consumer never sees ANALYZE runs
    assert(t.readIncremental(1, 3).count() == 100)
    assert(t.readChanges(1, 2).count() == 0)
  }

  test("delete debt reported as the estimate's upper-bound slack; fold restores tightness") {
    val t = QTable.create(TestSpark.tmpDir("ndv4"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 1000, 42L, 2).toDF(),
      filesPerBucket = 2)
    new NdvSketchJob(t, Seq("image_id")).run()
    new DeleteJob(t).run(col("image_id").endsWith("7"))

    val r = NdvEstimate.run(t, t.currentSnapshot, Seq("image_id"))
    assert(r.deleteDebtRows == 100L)
    // stored-rows estimate: still ~1000 (upper bound on the 900 live)
    assert(within(r.estimates("image_id"), 1000))

    // compact folds the deletes; rewritten files are pending again
    new CompactJob(t, targetFileBytes = 16L << 20).run()
    new NdvSketchJob(t, Seq("image_id")).run()
    val r2 = NdvEstimate.run(t, t.currentSnapshot, Seq("image_id"))
    assert(r2.deleteDebtRows == 0L)
    assert(r2.filesScanned == 0)
    assert(within(r2.estimates("image_id"), 900))
  }
}
