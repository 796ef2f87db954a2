package graft.jobs

import graft.format.QTable
import org.apache.hadoop.fs.{Path => HPath}

/** Snapshot expiry: retain the most recent `keepLast` snapshots, delete
  * version files, manifests, and data files reachable ONLY from expired
  * snapshots. The current version pointer is never touched, so readers of
  * retained snapshots are unaffected (snapshot isolation holds for the
  * retained window).
  *
  * All deletes go through the Hadoop FileSystem resolved per path — the
  * same abstraction every rewrite job writes through — so expiry works on
  * any FS the data files live on, not just the local one.
  *
  * DATA-file deletes distribute above `distributeThreshold` paths (the
  * same switch the orphan sweep and footer harvest use): steady-state
  * expiry removes far more files than any other metadata op — O(dead
  * files) sequential driver-side `fs.delete` round-trips would be the
  * slowest operation in the engine at 10^9-file scale, while shipping
  * the path list to executors makes it one short Spark job. Manifest and
  * version-file deletes stay driver-side (metadata-count-sized).
  */
class ExpireSnapshotsJob(table: QTable,
    distributeThreshold: Int = ExpireSnapshotsJob.DistributeThreshold) {

  final case class Result(expiredVersions: Seq[Long], deletedDataFiles: Int,
      deletedManifests: Int, reclaimableBytes: Long = 0L,
      dryRun: Boolean = false, externalSkipped: Int = 0)

  private def delete(pathStr: String): Boolean = {
    val hp = new HPath(pathStr)
    val fs = hp.getFileSystem(table.hadoopConf)
    fs.exists(hp) && fs.delete(hp, false)
  }

  /** Expire snapshots outside the retention window. A version is
    * retained when ANY of these hold (Iceberg's expire_snapshots
    * semantics — `retain_last` and `older_than` compose as a union of
    * protections, tags protect unconditionally):
    *  - it is among the `keepLast` most recent;
    *  - it is tagged;
    *  - `olderThanMs` is set and the version's commit timestamp is at
    *    or after it (age-based retention: "keep everything from the
    *    last 7 days, plus at least K snapshots, plus releases").
    *
    * `dryRun` computes the full expiry plan — versions, dead file
    * count, reclaimable bytes — and deletes NOTHING: the capacity
    * question ("what would expiring down to K buy us") answered from
    * metadata before committing to a destructive pass. */
  def run(keepLast: Int, olderThanMs: Option[Long] = None,
      dryRun: Boolean = false): Result = {
    require(keepLast >= 1, "must retain at least the current snapshot")
    val versions = table.listVersions
    val versionSet = versions.toSet
    // retention = the union of protections (Iceberg expire_snapshots):
    //  - the most recent keepLast of the MAIN chain (the parent-pointer
    //    walk from the head — on a branch-free table this is exactly the
    //    last K version numbers, but branch commits interleave the
    //    global numbering and must not eat main's window);
    //  - every tagged version and every BRANCH HEAD (explicit promises
    //    that those snapshots stay readable; a branch's non-head
    //    ancestors age out like any other history);
    //  - UNMARKED versions above the main head (staged write-audit-
    //    publish claims — unpublished work is never garbage; branch
    //    commits are ref-marked and protect themselves via their head);
    //  - commits younger than the optional age cutoff.
    val mainChain = {
      val buf = scala.collection.mutable.ArrayBuffer[Long]()
      var v = table.currentVersion
      while (v >= 0 && buf.size < keepLast && versionSet.contains(v)) {
        buf += v
        v = table.snapshotAt(v).parentVersion
      }
      buf.toSet
    }
    val tagged = graft.format.Tags.list(table).map(_.version).toSet
    val branchHeads = graft.format.Branches.list(table).map(_.version).toSet
    val aboveHead = versionSet.filter(_ > table.currentVersion)
      .filterNot(v => table.snapshotAt(v).summary.contains("ref"))
    val young = olderThanMs.map(cut =>
      versions.filter(v => table.snapshotAt(v).timestampMs >= cut).toSet)
      .getOrElse(Set.empty)
    val keep = mainChain ++ tagged.filter(versionSet.contains) ++
      branchHeads.filter(versionSet.contains) ++ aboveHead ++ young
    val (expired, retained) = versions.partition(v => !keep.contains(v))
    if (expired.isEmpty) return Result(Nil, 0, 0)

    val retainedSnaps = retained.map(table.snapshotAt)
    val liveFiles = retainedSnaps.flatMap(s =>
      table.entries(s).map(_.path) ++ s.deleteFiles.map(_.path) ++
        s.eqDeleteFiles.map(_.path)).toSet
    val liveManifests = retainedSnaps.flatMap(_.manifests.map(_.path)).toSet

    // Expired snapshots routinely SHARE manifests (appends and the
    // metadata-only add/rename/drop-column commits carry parent
    // manifests by reference), so collect the distinct dead manifests
    // across ALL expired versions and process each exactly once — a
    // per-version loop would delete a shared manifest at its first
    // referencing version and crash reading it at the next.
    // existence-filtered for crash idempotency: a re-run after a crash
    // (or a partial older expire) skips manifests already deleted — any
    // data files those stranded are RemoveOrphanFilesJob's to sweep
    val deadManifests = expired.map(table.snapshotAt)
      .flatMap(_.manifests).filterNot(m => liveManifests.contains(m.path))
      .groupBy(_.path).map(_._2.head)
      .filter(m => table.io.exists(s"${table.metadataDir}/${m.path}"))

    // distinct: a rewrite-manifests chain can list one file from several
    // dead manifests — the sequential path counted it once (second delete
    // found nothing), the distributed path must not double-delete either.
    // Delete files (both flavors) referenced only by expired snapshots
    // (folded away or rolled back in every retained one) die with them.
    // (path, bytes) so the dry-run can price the reclaim without stat()s
    val deadDeleteEntries = expired.map(table.snapshotAt)
      .flatMap(s => s.deleteFiles.map(d => (d.path, d.byteCount)) ++
        s.eqDeleteFiles.map(d => (d.path, d.byteCount)))
      .filterNot(e => liveFiles.contains(e._1)).distinct
    // SHALLOW-CLONE guard: never delete a file outside this table's
    // root. A cloned snapshot references the SOURCE table's files by
    // absolute path; when a clone-local rewrite strands them in the
    // clone's dead set, they belong to the source's lifecycle, not the
    // clone's — skip and report them instead of reaching into another
    // table (QTable.cloneTo scaladoc has the ownership contract).
    val (deadDataEntries, externalEntries) = (deadManifests.toSeq
      .flatMap(m => table.readManifest(m).files.map(f => (f.path, f.byteCount)))
      .filterNot(e => liveFiles.contains(e._1)) ++ deadDeleteEntries)
      .groupBy(_._1).map(_._2.head).toSeq
      .partition(e => QTable.ownedBy(e._1, table.root))
    val deadDataPaths = deadDataEntries.map(_._1)

    if (dryRun)
      return Result(expired, deadDataPaths.size, deadManifests.size,
        reclaimableBytes = deadDataEntries.map(_._2).sum, dryRun = true,
        externalSkipped = externalEntries.size)

    val dataDeleted =
      if (deadDataPaths.size < distributeThreshold) deadDataPaths.count(delete)
      else {
        // distributed sweep: ship the path list to executors (the
        // RollbackJob orphan-sweep pattern); conf travels as props
        // because Configuration is not serializable
        val spark = table.spark
        val props = graft.format.ParquetStats.confProps(table.hadoopConf)
        val slices = math.min(deadDataPaths.size,
          math.max(2, spark.sparkContext.defaultParallelism * 2))
        spark.sparkContext.parallelize(deadDataPaths, slices)
          .mapPartitions { it =>
            val c = graft.format.ParquetStats.confFromProps(props)
            var n = 0
            it.foreach { p =>
              val hp = new HPath(p)
              val fs = hp.getFileSystem(c)
              if (fs.exists(hp) && fs.delete(hp, false)) n += 1
            }
            Iterator.single(n)
          }.sum().toInt
      }
    // manifests only after every dead manifest's files were swept, so a
    // crash mid-sweep leaves manifests readable for a re-run. Metadata
    // deletes go through table.io — the same store the commit protocol
    // wrote them to (an object-store metadata layer is not reachable
    // through the data path's Hadoop FS)
    var manifestsDeleted = 0
    deadManifests.foreach { m =>
      if (table.io.delete(s"${table.metadataDir}/${m.path}")) manifestsDeleted += 1
    }
    expired.foreach(v => table.io.delete(s"${table.metadataDir}/v$v.json"))
    Result(expired, dataDeleted, manifestsDeleted,
      reclaimableBytes = deadDataEntries.map(_._2).sum,
      externalSkipped = externalEntries.size)
  }
}

object ExpireSnapshotsJob {
  /** Below this many dead data files the driver deletes sequentially
    * (job-launch overhead beats task fan-out); above it, a Spark job. */
  val DistributeThreshold = 256
}

/** Manifest rewrite: re-chunk the current snapshot's file list into
  * right-sized manifests sorted by (pbucket, phash) so manifest-level
  * range pruning stays effective after many incremental commits. Data
  * files are untouched — this is a metadata-only commit.
  */
class RewriteManifestsJob(table: QTable) {
  def run(entriesPerManifest: Int = 512): graft.model.Snapshot = {
    val snap = table.currentSnapshot
    table.commit(Some(snap), "rewrite-manifests", table.entries(snap),
      Map("manifests-before" -> snap.manifests.size.toString),
      entriesPerManifest = entriesPerManifest)
  }
}
