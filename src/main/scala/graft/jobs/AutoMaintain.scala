package graft.jobs

import graft.format.QTable
import graft.verify.ScanEquivalence

/** Debt-driven maintenance planner + executor: `maintain --auto`.
  *
  * The unconditional `maintain` composite re-runs every job each tick —
  * fine for a drill, wrong at 10^12 rows, where a tick must cost
  * O(outstanding debt), not O(table). AutoMaintain closes the loop the
  * AnalyzeJob scaladoc promises: read the metadata-only debt report,
  * launch ONLY the jobs whose dial crossed threshold, and commit nothing
  * when the table is clean (a no-op tick is metadata reads only, so it
  * can run on every scheduler tick).
  *
  * Dials (each maps one Report metric to one job):
  *  - small-file byte ratio -> compact (bin-pack small files)
  *  - delete-row debt ratio (position rows + equality keys vs live rows)
  *    -> compact, which plans delete-affected files as mandatory work
  *    and folds the debt (read-side anti-join cost scales with debt ROWS
  *    until folded)
  *  - delete FILE count with row debt still under the fold threshold ->
  *    rewrite-deletes (consolidation is O(delete rows) — far cheaper
  *    than compaction when the per-read cost is fan-in, not volume)
  *  - clustering range-overlap -> incremental cluster (LSM-style: sorts
  *    only post-cluster debt into a new run — never a table re-sort)
  *  - manifest-count drift vs the ideal ceil(files/entriesPerManifest)
  *    -> rewrite-manifests
  *  - retained-version pile-up -> expire (+ orphan sweep, paired with
  *    the destructive tail like the composite)
  *
  * The planner is a pure function Report -> Plan (unit-testable without
  * a SparkSession); [[run]] executes the plan with the same step-scoped
  * jobIds and the same scan-equivalence gate before the destructive
  * tail as the unconditional composite. A killed run resumes: re-running
  * replans from the CURRENT report, so already-committed steps read as
  * paid-off debt and drop out of the plan (idempotent convergence).
  */
object AutoMaintain {

  /** Thresholds. Defaults are deliberately conservative: a freshly
    * maintained table must plan nothing. */
  final case class Config(
      // compact when small files hold more than this fraction of bytes
      smallDebtRatio: Double = 0.10,
      // ...and there are at least this many (absolute noise floor)
      minSmallFiles: Int = 4,
      // compact (fold) when delete debt exceeds this fraction of rows
      deleteRowRatio: Double = 0.02,
      // consolidate when this many delete files accumulate below the
      // fold threshold (every read anti-joins each file's rows)
      maxDeleteFiles: Int = 16,
      // incremental-cluster when a random range probe must read this
      // many files per bucket on average (1.0 = perfectly clustered)
      overlapThreshold: Double = 1.5,
      // rewrite manifests when count exceeds twice the ideal packing
      entriesPerManifest: Int = 512,
      // expire when more versions than this are retained
      maxRetainedVersions: Int = 12,
      // refresh NDV sketches (tables that opted in via analyze-ndv)
      // when live-file coverage drops below this; rewrites in the same
      // tick also trigger it, so a tick leaves the table fully analyzed
      ndvRefreshBelow: Double = 1.0)

  final case class Plan(
      compact: Boolean,
      clusterIncremental: Boolean,
      rewriteDeletes: Boolean,
      rewriteManifests: Boolean,
      expire: Boolean,
      refreshNdv: Boolean,
      reasons: Seq[String]) {
    def actions: Seq[String] =
      (if (compact) Seq("compact") else Nil) ++
        (if (clusterIncremental) Seq("cluster-incremental") else Nil) ++
        (if (rewriteDeletes) Seq("rewrite-deletes") else Nil) ++
        (if (rewriteManifests) Seq("rewrite-manifests") else Nil) ++
        (if (expire) Seq("expire") else Nil) ++
        (if (refreshNdv) Seq("analyze-ndv") else Nil)
    def rewrites: Boolean =
      compact || clusterIncremental || rewriteDeletes || rewriteManifests
    def isNoop: Boolean = !rewrites && !expire && !refreshNdv
  }

  def plan(r: AnalyzeJob.Report, c: Config = Config()): Plan = {
    val reasons = Seq.newBuilder[String]

    val smallRatio =
      if (r.totalBytes == 0) 0.0
      else r.smallFileDebtBytes.toDouble / r.totalBytes
    val smallDebt = r.smallFiles >= c.minSmallFiles &&
      smallRatio > c.smallDebtRatio
    if (smallDebt) reasons += f"small-file debt $smallRatio%.2f of bytes " +
      f"across ${r.smallFiles} files > ${c.smallDebtRatio}%.2f"

    val debtRows = r.deleteRows + r.eqDeleteKeys
    val rowRatio =
      if (r.totalRows == 0) 0.0 else debtRows.toDouble / r.totalRows
    val deleteFold = rowRatio > c.deleteRowRatio
    if (deleteFold) reasons += f"delete debt $debtRows rows, " +
      f"$rowRatio%.3f of table > ${c.deleteRowRatio}%.3f"

    // shallow-clone localization: any entry referencing a file outside
    // the table root is compaction work (compact treats externals as
    // mandatory), so a cloned table's first tick localizes it and stops
    // depending on the source's retention
    val externalDebt = r.externalFiles > 0
    if (externalDebt) reasons += s"${r.externalFiles} external (cloned) " +
      s"file references, ${r.externalBytes} bytes to localize"

    val compact = smallDebt || deleteFold || externalDebt

    // consolidation only matters while the debt stays UNfolded
    val rewriteDeletes = !compact &&
      (r.deleteFiles + r.eqDeleteFiles) > c.maxDeleteFiles
    if (rewriteDeletes) reasons += s"${r.deleteFiles + r.eqDeleteFiles} " +
      s"delete files > ${c.maxDeleteFiles} (row debt under fold threshold)"

    val cluster = r.files > 1 && r.clusterOverlap > c.overlapThreshold
    if (cluster) reasons += f"cluster overlap ${r.clusterOverlap}%.2f > " +
      f"${c.overlapThreshold}%.2f"

    val idealManifests =
      math.max(1, (r.files + c.entriesPerManifest - 1) / c.entriesPerManifest)
    val rewriteManifests = r.manifests > math.max(2, 2 * idealManifests)
    if (rewriteManifests) reasons += s"${r.manifests} manifests > " +
      s"2x ideal $idealManifests"

    val expire = r.retainedVersions > c.maxRetainedVersions
    if (expire) reasons += s"${r.retainedVersions} retained versions > " +
      s"${c.maxRetainedVersions}"

    // only tables that opted in (some sketch exists) refresh; a rewrite
    // this tick will strip its outputs' sketches, so it triggers too
    val refreshNdv = r.ndvCoverage > 0.0 &&
      (r.ndvCoverage < c.ndvRefreshBelow ||
        compact || cluster || rewriteDeletes)
    if (refreshNdv) reasons += f"ndv coverage ${r.ndvCoverage}%.2f with " +
      "sketch-tracked columns present"

    Plan(compact, cluster, rewriteDeletes, rewriteManifests, expire,
      refreshNdv, reasons.result())
  }

  final case class Result(
      plan: Plan,
      preVersion: Long,
      postVersion: Long,
      scanEquivalent: Option[Boolean],
      violations: Long,
      expiredVersions: Seq[Long],
      orphansDeleted: Int)

  /** Execute one auto tick. Same ordering and safety contract as the
    * unconditional composite: rewrites first (non-destructive — old
    * snapshots stay rollback targets), then the scan-equivalence gate,
    * and only then the destructive tail (expire + orphan sweep). When
    * the plan has no rewrites the gate is vacuous (pre == current) and
    * is skipped. Throws IllegalStateException on a gate violation, with
    * the pre-tick version in the message as the rollback target. */
  def run(
      table: QTable,
      targetBytes: Long,
      config: Config = Config(),
      jobId: String = java.util.UUID.randomUUID().toString,
      concurrency: Int = 4,
      bucketScope: Option[Set[Int]] = None,
      hilbert: Boolean = false,
      keep: Int = 2,
      graceMs: Long = 24L * 3600 * 1000,
      dryRun: Boolean = false): Result = {
    val pre = table.currentSnapshot
    val p = plan(new AnalyzeJob(table, targetBytes).run(), config)
    // tracked-column discovery BEFORE rewrites: a full rewrite strips
    // every carried sketch, which would otherwise lose the opt-in
    val trackedPre =
      if (p.refreshNdv) NdvStats.trackedColumns(pre, table.entries(pre))
      else Nil

    if (p.compact)
      CommitRetry.withCommitRetry()(new CompactJob(table, targetBytes,
        jobId = s"$jobId-compact", concurrency = concurrency,
        bucketScope = bucketScope).run())
    if (p.clusterIncremental)
      CommitRetry.withCommitRetry()(new ClusterJob(table, targetBytes,
        hilbert = hilbert, jobId = s"$jobId-cluster",
        concurrency = concurrency, bucketScope = bucketScope,
        incremental = true).run())
    if (p.rewriteDeletes)
      CommitRetry.withCommitRetry()(
        new RewriteDeletesJob(table, jobId = s"$jobId-rwdel").run())
    if (p.rewriteManifests)
      CommitRetry.withCommitRetry()(
        new RewriteManifestsJob(table).run(config.entriesPerManifest))
    // re-analyze the columns the table already tracked, AFTER rewrites
    // so their outputs get sketched in the same tick (metadata-only
    // commit; a fully-covered table no-ops inside the job)
    if (p.refreshNdv && trackedPre.nonEmpty)
      CommitRetry.withCommitRetry()(
        new NdvSketchJob(table, trackedPre).run())

    val (okV, badV) =
      if (p.rewrites)
        ScanEquivalence.check(table.read(pre), table.read(table.currentSnapshot))
      else (true, 0L)
    if (!okV)
      throw new IllegalStateException(
        s"auto-maintain scan-equivalence gate failed ($badV violations); " +
          s"destructive tail skipped — rollback --to ${pre.version} " +
          "restores the pre-tick snapshot")

    val expired =
      if (p.expire && !dryRun)
        new ExpireSnapshotsJob(table).run(keep).expiredVersions
      else Seq.empty
    val orphans =
      if (p.expire) new RemoveOrphanFilesJob(table, graceMs).run(dryRun).deleted
      else 0

    Result(p, pre.version, table.currentVersion,
      if (p.rewrites) Some(okV) else None, badV, expired, orphans)
  }
}
