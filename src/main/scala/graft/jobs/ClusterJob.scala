package graft.jobs

import graft.expr.zfunctions._
import graft.format.QTable
import graft.model._
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._

/** Z-order / Hilbert clustering rewrite.
  *
  * Per partition group (pbucket): compute the clustering key with the
  * custom Catalyst expression [[graft.expr.ZOrderKey]], range-repartition
  * on (zkey, tiebreak) and sort within partitions by zkey, then write
  * ~targetFileBytes files whose narrow per-file phash ranges land in the
  * rewritten manifests and drive scan pruning.
  *
  * Skew: phash is heavily skewed (near-duplicate clusters — by design in
  * the synthetic data, and in any real image corpus). Range-partitioning
  * on zkey alone would put every near-dup in one reducer. The uniform
  * `tiebreak = xxhash64(image_id)` as the SECOND range key splits zkey
  * ties across partitions — salting built into the sort key, with AQE
  * left on as the runtime backstop.
  */
class ClusterJob(
    table: QTable,
    targetFileBytes: Long = 8L << 20,
    hilbert: Boolean = false,
    jobId: String = java.util.UUID.randomUUID().toString,
    concurrency: Int = 4,
    minGroupBytes: Long = -1L) {

  final case class Plan(group: String, inputs: Seq[DataFileEntry]) {
    def bytes: Long = inputs.map(_.byteCount).sum
  }

  def plan(snap: Snapshot): Seq[Plan] = {
    val perBucket = table.entries(snap).groupBy(_.pbucketMin).toSeq.sortBy(_._1)
    JobPlanning.coalesceGroups(perBucket, targetFileBytes, minGroupBytes)
      .map { case (name, fs) => Plan(name, fs) }
  }

  def run(failAfterGroups: Int = Int.MaxValue): Snapshot = {
    val snap = table.currentSnapshot
    val plans = plan(snap)
    if (plans.isEmpty) return snap

    val ckpt = new Checkpoint(table, jobId)
    val outputs = GroupRunner.run[Plan](plans, _.group, ckpt.committed,
      failAfterGroups, concurrency) { p =>
      val dir = table.newDataDir(jobId, p.group)
      cleanDir(dir)
      val nOut = math.max(1, math.round(p.bytes.toDouble / targetFileBytes).toInt)
      val df = table.readFiles(p.inputs.map(_.path))
        .withColumn("zkey", imageZKey(col("phash"), col("w"), col("h"),
          col("image_id"), hilbert))
        .withColumn("tiebreak", xxhash64(col("image_id")))
      val t0 = System.nanoTime()
      df.repartitionByRange(nOut, col("zkey"), col("tiebreak"))
        .sortWithinPartitions(col("zkey"), col("tiebreak"))
        .drop("zkey", "tiebreak")
        .write.parquet(dir)
      val t1 = System.nanoTime()
      val files = table.harvest(dir)
      val t2 = System.nanoTime()
      Timing.record("cluster", p.group, (t1 - t0) / 1e9)
      if (sys.env.contains("GRAFT_TIMING"))
        System.err.println(f"[timing] cluster ${p.group}%-8s files=${p.inputs.size}%3d " +
          f"bytes=${p.bytes / (1 << 20)}%5d MiB nOut=$nOut%3d " +
          f"write=${(t1 - t0) / 1e9}%7.2fs harvest=${(t2 - t1) / 1e9}%6.2fs")
      val entry = LineageEntry(jobId, if (hilbert) "cluster-hilbert" else "cluster-zorder",
        p.group, p.inputs.map(_.path), files,
        files.map(_.rowCount).sum, files.map(_.byteCount).sum,
        "committed", attempt = 1)
      ckpt.commit(entry)
      entry
    }

    table.commit(Some(snap), if (hilbert) "cluster-hilbert" else "cluster-zorder",
      outputs.flatMap(_.outputFiles).toSeq, Map(
        "job-id" -> jobId,
        "bytes-rewritten" -> plans.map(_.bytes).sum.toString,
        "groups" -> plans.size.toString))
  }

  private def cleanDir(dir: String): Unit = {
    val hp = new HPath(dir)
    val fs = hp.getFileSystem(table.hadoopConf)
    if (fs.exists(hp)) fs.delete(hp, true)
  }
}
