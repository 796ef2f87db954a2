package graft.jobs

import graft.format.QTable
import graft.model.Snapshot

/** Roll the table back to an earlier retained snapshot.
  *
  * Implemented as a NEW commit that re-points at the target version's
  * manifest list (never by rewinding the version counter): history stays
  * linear and auditable, concurrent readers are unaffected, and the bad
  * snapshots remain inspectable until ExpireSnapshotsJob collects them —
  * the same forward-rollback Iceberg exposes as
  * `rollback_to_snapshot`. Metadata-only: no data file is touched.
  */
class RollbackJob(table: QTable) {

  def run(toVersion: Long): Snapshot = {
    val cur = table.currentSnapshot
    require(toVersion != cur.version, s"already at v$toVersion")
    require(table.listVersions.contains(toVersion),
      s"v$toVersion is not a retained snapshot (have: ${table.listVersions.mkString(",")})")
    val target = table.snapshotAt(toVersion)
    // bucket count must travel WITH the manifests being restored: rolling
    // back across a RebucketJob commit would otherwise pair old-layout
    // manifests with the new bucket count, and every later append/merge
    // would assign pbucket with the wrong modulus
    table.commit(Some(cur), "rollback", Nil,
      Map("rolled-back-to" -> toVersion.toString,
        "rolled-back-from" -> cur.version.toString),
      reuseManifests = target.manifests,
      bucketsOverride = Some(target.buckets))
  }
}

/** Delete data files under the table root that no retained snapshot and
  * no live checkpoint references — the leftovers of crashed or abandoned
  * job attempts (a killed driver's half-written group output that was
  * never resumed). At 10^12-image scale leaked files are real money;
  * every lakehouse ships this (Iceberg `remove_orphan_files`).
  *
  * Safety: only files under `<root>/data` are candidates; anything
  * referenced by ANY retained snapshot version or recorded as output in
  * a live checkpoint lineage entry survives, and — like Iceberg's
  * `older_than` guard — files younger than `graceMs` are never touched:
  * an in-flight group writes its part files BEFORE its lineage entry
  * exists, so a zero-grace sweep racing that group would delete data
  * mid-write. Default grace is 24h; tests pass 0 on quiesced tables.
  */
class RemoveOrphanFilesJob(table: QTable, graceMs: Long = 24L * 3600 * 1000) {

  final case class Result(deleted: Int, kept: Int)

  def run(dryRun: Boolean = false): Result = {
    val conf = table.hadoopConf
    val cutoff = System.currentTimeMillis() - graceMs
    val onDisk = graft.format.ParquetStats.listParquet(table.dataDir, conf)
      .filter { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(conf).getFileStatus(hp).getModificationTime <= cutoff
      }

    val referenced: Set[String] =
      table.listVersions.flatMap(v => table.entries(table.snapshotAt(v)))
        .map(_.path).toSet
    // outputs recorded by live (unfinished) job checkpoints
    val inFlight: Set[String] =
      table.io.listDirNames(s"${table.metadataDir}/checkpoints")
        .flatMap(jobId => new Checkpoint(table, jobId).all)
        .flatMap(_.outputFiles.map(_.path))
        .toSet

    val keep = referenced ++ inFlight
    var deleted = 0
    onDisk.foreach { p =>
      if (!keep.contains(p)) {
        if (!dryRun) {
          val hp = new org.apache.hadoop.fs.Path(p)
          val fs = hp.getFileSystem(conf)
          if (fs.delete(hp, false)) deleted += 1
        } else deleted += 1
      }
    }
    Result(deleted, onDisk.size - deleted)
  }
}
