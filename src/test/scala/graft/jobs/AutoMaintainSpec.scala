package graft.jobs

import graft.TestSpark
import graft.format.QTable
import graft.synth.DataGen
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The auto tick's contract: each debt dial launches exactly its job,
  * and a clean table commits NOTHING (the property that makes the tick
  * schedulable at 10^12-row scale — cost O(outstanding debt)). */
class AutoMaintainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def clean = AnalyzeJob.Report(
    version = 5, operation = "cluster", retainedVersions = 3, tags = 0,
    files = 10, totalRows = 100000, totalBytes = 10L << 30,
    avgFileBytes = 1L << 30, smallFiles = 0, smallFileDebtBytes = 0,
    manifests = 1, avgEntriesPerManifest = 10, bloomCoverage = 1.0,
    ndvCoverage = 1.0,
    clusterOverlap = 1.05, worstBucketOverlap = 1.2, schemaFields = 7,
    deleteFiles = 0, deleteRows = 0, eqDeleteFiles = 0, eqDeleteKeys = 0)

  test("planner: clean table plans nothing") {
    val p = AutoMaintain.plan(clean)
    assert(p.isNoop, s"clean report must be a no-op, planned ${p.actions}")
  }

  test("planner: each dial trips exactly its job") {
    // small-file bytes over ratio -> compact
    val small = AutoMaintain.plan(clean.copy(
      smallFiles = 20, smallFileDebtBytes = 2L << 30))
    assert(small.compact && !small.clusterIncremental && !small.rewriteDeletes)

    // delete ROW debt over ratio -> compact (fold), not consolidation
    val fold = AutoMaintain.plan(clean.copy(
      deleteFiles = 2, deleteRows = 5000))
    assert(fold.compact && !fold.rewriteDeletes)

    // many delete FILES under the row threshold -> rewrite-deletes only
    val fanIn = AutoMaintain.plan(clean.copy(
      deleteFiles = 30, deleteRows = 30))
    assert(fanIn.rewriteDeletes && !fanIn.compact)

    // eq-delete keys count toward the same fold dial
    val eq = AutoMaintain.plan(clean.copy(eqDeleteFiles = 1, eqDeleteKeys = 9000))
    assert(eq.compact)

    // overlap -> incremental cluster only
    val ov = AutoMaintain.plan(clean.copy(clusterOverlap = 4.0))
    assert(ov.clusterIncremental && !ov.compact)

    // manifest pile-up vs ideal packing -> rewrite-manifests
    val mf = AutoMaintain.plan(clean.copy(manifests = 7, avgEntriesPerManifest = 1))
    assert(mf.rewriteManifests)

    // version pile-up -> expire
    val ex = AutoMaintain.plan(clean.copy(retainedVersions = 20))
    assert(ex.expire && !ex.rewrites)

    // external (cloned) references -> compact (localize), any count
    val ext = AutoMaintain.plan(clean.copy(
      externalFiles = 1, externalBytes = 1L << 20))
    assert(ext.compact, "external references must trigger a localizing compact")

    // noise floor: 2 tiny files on a tiny table stay below minSmallFiles
    val noise = AutoMaintain.plan(clean.copy(
      smallFiles = 2, smallFileDebtBytes = 9L << 30))
    assert(!noise.compact)

    // ndv refresh: only opted-in tables (coverage > 0), on coverage
    // drop OR alongside a rewrite (whose outputs lose their sketches)
    val ndvDrop = AutoMaintain.plan(clean.copy(ndvCoverage = 0.5))
    assert(ndvDrop.refreshNdv && !ndvDrop.rewrites)
    val ndvOptOut = AutoMaintain.plan(clean.copy(
      ndvCoverage = 0.0, clusterOverlap = 4.0))
    assert(!ndvOptOut.refreshNdv && ndvOptOut.clusterIncremental)
    val ndvWithRewrite = AutoMaintain.plan(clean.copy(
      smallFiles = 20, smallFileDebtBytes = 2L << 30))
    assert(ndvWithRewrite.refreshNdv, "rewrite on an opted-in table refreshes")
  }

  test("auto tick pays off debt, then converges to committing nothing") {
    val t = QTable.create(TestSpark.tmpDir("automaint"), spark, buckets = 4)
    AppendJob.append(t, DataGen.generate(spark, 4000, 42L, 4).toDF(),
      filesPerBucket = 6)
    // target sized so a maintained bucket is ONE above-threshold file —
    // the clean state must be re-measurable as clean
    val target = 16L << 20

    // fresh append: small-file + overlap debt -> compact + cluster run
    val r1 = AutoMaintain.run(t, target, concurrency = 2)
    assert(r1.plan.compact && r1.plan.clusterIncremental,
      s"append debt must plan compact+cluster, got ${r1.plan.actions}")
    assert(r1.scanEquivalent.contains(true))
    assert(r1.postVersion > r1.preVersion)

    // second tick on the maintained table: nothing crosses threshold,
    // nothing commits — THE property that makes the tick schedulable
    val r2 = AutoMaintain.run(t, target, concurrency = 2)
    assert(r2.plan.isNoop, s"maintained table re-planned ${r2.plan.actions}: " +
      s"reasons ${r2.plan.reasons}")
    assert(r2.postVersion == r1.postVersion, "no-op tick must not commit")

    // MOR delete debt over the row ratio -> the next tick folds it
    new DeleteJob(t).run(col("image_id").endsWith("7"))
    val r3 = AutoMaintain.run(t, target, concurrency = 2)
    assert(r3.plan.compact, s"delete debt must plan compact, got ${r3.plan.actions}")
    assert(t.currentSnapshot.deleteFiles.isEmpty, "fold must clear delete files")

    // rows survive the whole sequence: ids are img%012d over 0..3999,
    // so exactly every 10th (…7) died -> 3600 live
    val live = t.read(t.currentSnapshot).count()
    assert(live == 3600L, s"expected 3600 live rows after fold, got $live")

    // opt the table into NDV tracking, then dirty it: the next tick's
    // refresh leg re-analyzes and leaves the estimate scan-free again
    new NdvSketchJob(t, Seq("image_id")).run()
    AppendJob.append(t, DataGen.generate(spark, 400, 9L, 2).toDF()
      .selectExpr("concat('y-', image_id) AS image_id", "bytes", "w", "h",
        "fmt", "caption", "phash"), 1)
    val r4 = AutoMaintain.run(t, target, concurrency = 2)
    assert(r4.plan.refreshNdv, s"coverage drop must plan refresh: ${r4.plan}")
    val est = NdvEstimate.run(t, t.currentSnapshot, Seq("image_id"))
    assert(est.filesScanned == 0, "post-tick estimate must be sketch-only")
  }
}
