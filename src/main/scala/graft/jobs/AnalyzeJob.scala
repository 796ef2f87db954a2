package graft.jobs

import graft.format.{QTable, Tags}
import graft.model.DataFileEntry

/** Maintenance-debt report, computed from snapshot + manifest metadata
  * ONLY — no data file is opened, so it costs the same on a 10^12-row
  * table as on a test fixture and can run on every scheduler tick to
  * decide WHICH maintenance to launch (the observability face of the
  * `maintain` composite: compact when smallFileDebt is high, cluster
  * when overlap is high, rewrite-manifests when entries/manifest drifts,
  * expire when retained versions pile up).
  *
  * Clustering overlap is the standard range-overlap metric: for each
  * bucket, sum(per-file phash span) / bucket phash span ≈ how many files
  * a random phash-range probe must read. Freshly clustered buckets sit
  * near 1.0 (disjoint spans); every append stacks another full-span file
  * on top, pushing it toward the file count.
  */
object AnalyzeJob {
  /** Lives in the companion (not the job instance) so the AutoMaintain
    * planner can be a pure function of a Report — unit-testable with a
    * hand-built report, no table or SparkSession required. */
  final case class Report(
      version: Long,
      operation: String,
      retainedVersions: Int,
      tags: Int,
      files: Int,
      totalRows: Long,
      totalBytes: Long,
      avgFileBytes: Long,
      smallFiles: Int,
      smallFileDebtBytes: Long,
      manifests: Int,
      avgEntriesPerManifest: Int,
      bloomCoverage: Double,
      // fraction of live files carrying at least one NDV sketch: < 1.0
      // means files were written since the last analyze-ndv run (the
      // signal to re-run it if approx-distinct queries matter)
      ndvCoverage: Double,
      clusterOverlap: Double,
      worstBucketOverlap: Double,
      schemaFields: Int,
      deleteFiles: Int,
      deleteRows: Long,
      eqDeleteFiles: Int,
      eqDeleteKeys: Long,
      // shallow-clone debt: live entries referencing files OUTSIDE the
      // table root (QTable.cloneTo). External bytes depend on the
      // source table's retention — a compact localizes them (and is the
      // fix when the source is about to be cleaned up)
      externalFiles: Int = 0,
      externalBytes: Long = 0L)
}

class AnalyzeJob(table: QTable, targetFileBytes: Long = 128L << 20) {
  import AnalyzeJob.Report

  def run(): Report = {
    val snap = table.currentSnapshot
    val entries = table.entries(snap)
    val files = entries.size
    val totalBytes = entries.map(_.byteCount).sum
    val external = externalEntries(entries)
    // a file is "small" below half the target: binpack output lands in
    // [half, full] by construction, so anything below it is real debt
    val small = entries.filter(_.byteCount < targetFileBytes / 2)

    // per-bucket overlap over files that live in exactly one bucket
    // (cross-bucket files — pre-rebucket history — count as overlap 1
    // in each bucket they span is overstated; they are rare and flagged
    // by the small-file/bucket metrics instead, so they are excluded)
    // under a days(ts) partition spec, overlap compartments are
    // (bucket, day): two days' files in one bucket are NOT sort debt —
    // a date-range scan prunes them by day before zkey ranges matter,
    // and the day-aware cluster can never reduce cross-day overlap, so
    // counting it would make `maintain --auto` tick forever
    val dayF = graft.format.DayPartition.fieldOf(snap)
    val byBucket = entries.filter(e => e.pbucketMin == e.pbucketMax)
      .groupBy(e => (e.pbucketMin,
        dayF.flatMap(f => graft.format.DayPartition.entryDay(f, e))))
    // overlap spans follow the table's LEADING sort column: phash (the
    // image zkey's first plane) by default, or sort.order's first entry
    // when the table was clustered --by user columns — measuring overlap
    // on a column the layout never sorted would misreport debt both ways
    val leading = snap.props.get("sort.order")
      .map(_.split(",")(0).trim).filter(_.nonEmpty)
    val leadPhys = leading.flatMap(c =>
      snap.schemaFields.find(_.name == c).map(_.phys))
    def range(e: DataFileEntry): Option[(Double, Double)] = leading match {
      case None | Some("phash") => Some((e.phashMin.toDouble, e.phashMax.toDouble))
      case Some("image_id") => Some((
        graft.expr.ZOrder.strPrefixLong(e.imageIdMin).toDouble,
        graft.expr.ZOrder.strPrefixLong(e.imageIdMax).toDouble))
      case Some(_) =>
        leadPhys.flatMap(p => e.stats.get(p)).map(s => s.kind match {
          case "string" => (graft.expr.ZOrder.strPrefixLong(s.min).toDouble,
            graft.expr.ZOrder.strPrefixLong(s.max).toDouble)
          case _ => (s.min.toDouble, s.max.toDouble)
        })
    }
    val overlaps = byBucket.values.toSeq.flatMap { fs0 =>
      val fs = fs0.flatMap(f => range(f).map(f -> _))
      if (fs.size < 2) None else {
        val lo = fs.map(_._2._1).min
        val hi = fs.map(_._2._2).max
        val span = hi - lo
        if (span <= 0) None
        else Some((fs.map { case (_, (l, h)) => h - l }.sum / span, fs.size))
      }
    }
    val clusterOverlap =
      if (overlaps.isEmpty) 1.0
      else overlaps.map { case (o, n) => o * n }.sum / overlaps.map(_._2).sum
    val worst = if (overlaps.isEmpty) 1.0 else overlaps.map(_._1).max

    Report(
      version = snap.version,
      operation = snap.operation,
      retainedVersions = table.listVersions.size,
      tags = Tags.list(table).size,
      files = files,
      totalRows = entries.map(_.rowCount).sum,
      totalBytes = totalBytes,
      avgFileBytes = if (files == 0) 0L else totalBytes / files,
      smallFiles = small.size,
      smallFileDebtBytes = small.map(_.byteCount).sum,
      manifests = snap.manifests.size,
      avgEntriesPerManifest =
        if (snap.manifests.isEmpty) 0 else files / snap.manifests.size,
      bloomCoverage =
        if (files == 0) 1.0 else entries.count(_.blooms.nonEmpty).toDouble / files,
      ndvCoverage =
        if (files == 0) 1.0 else entries.count(_.ndvSketches.nonEmpty).toDouble / files,
      clusterOverlap = clusterOverlap,
      worstBucketOverlap = worst,
      schemaFields = snap.schemaFields.size,
      // merge-on-read debt: every scan anti-joins this many delete rows
      // until a compact folds them (compact plans delete-referenced
      // files as mandatory work, so launching it clears this)
      deleteFiles = snap.deleteFiles.size,
      deleteRows = snap.deleteFiles.map(_.rowCount).sum,
      // equality-delete debt (scan-free upserts): same fold story —
      // compact plans eq-affected files as mandatory work
      eqDeleteFiles = snap.eqDeleteFiles.size,
      eqDeleteKeys = snap.eqDeleteFiles.map(_.rowCount).sum,
      externalFiles = external.size,
      externalBytes = external.map(_.byteCount).sum)
  }

  /** Live entries outside the table root — shallow-clone references. */
  private def externalEntries(entries: Seq[DataFileEntry]): Seq[DataFileEntry] =
    entries.filterNot(e => graft.format.QTable.ownedBy(e.path, table.root))
}
