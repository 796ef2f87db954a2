package graft.jobs

import graft.model.DataFileEntry

/** Shared planning helpers for the maintenance jobs. */
object JobPlanning {

  /** Coalesce per-bucket file groups into rewrite groups that each carry
    * at least ~4x the target file size (so one group = one Spark job
    * with several tasks, and job-launch overhead amortizes). Buckets are
    * merged ADJACENT-only, keeping each group a contiguous pbucket range
    * so group outputs still cover disjoint, prunable bucket ranges.
    *
    * This is the knob that keeps the planner scale-proportional: at
    * 100 TB every bucket is huge and groups are 1:1 with buckets; on a
    * small table many buckets fold into one job.
    */
  def coalesceGroups(perBucket: Seq[(Int, Seq[DataFileEntry])],
      targetFileBytes: Long,
      minGroupBytes: Long = -1L): Seq[(String, Seq[DataFileEntry])] = {
    if (perBucket.isEmpty) return Nil
    val minBytes = if (minGroupBytes > 0) minGroupBytes else targetFileBytes * 4
    val out = scala.collection.mutable.ArrayBuffer[(String, Seq[DataFileEntry])]()
    var curBuckets = scala.collection.mutable.ArrayBuffer[Int]()
    var curFiles = scala.collection.mutable.ArrayBuffer[DataFileEntry]()
    var curBytes = 0L

    def flush(): Unit = if (curFiles.nonEmpty) {
      val name =
        if (curBuckets.size == 1) s"b${curBuckets.head}"
        else s"b${curBuckets.head}-${curBuckets.last}"
      out += name -> curFiles.sortBy(_.path).toSeq
      curBuckets = scala.collection.mutable.ArrayBuffer[Int]()
      curFiles = scala.collection.mutable.ArrayBuffer[DataFileEntry]()
      curBytes = 0L
    }

    perBucket.foreach { case (b, fs) =>
      curBuckets += b
      curFiles ++= fs
      curBytes += fs.map(_.byteCount).sum
      if (curBytes >= minBytes) flush()
    }
    flush()
    out.toSeq
  }
}
