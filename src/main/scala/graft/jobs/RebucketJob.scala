package graft.jobs

import graft.format.QTable
import graft.model._
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._

/** Partition-spec evolution: rewrite the table into a different hash
  * bucket count (Iceberg's spec-evolution analogue for the qtable's
  * single `bucket(image_id, B)` transform). Needed when a table outgrows
  * its creation-time bucket count — at 10^12 images a 32-bucket layout
  * would make every maintenance group multi-TB.
  *
  * One exact-bin shuffle moves every row to its (new bucket, sub-file)
  * partition — sub-files split each new bucket into ~targetFileBytes
  * outputs by a second hash, so file sizes stay right without a
  * sampling pass. Rows inside each output are sorted by phash so the
  * rewritten manifests carry tight ranges for pruning.
  *
  * Unlike compact/cluster this is inherently a whole-table rewrite with
  * one global shuffle, so lineage is a single group: resume of a killed
  * run restarts the write (outputs are job-scoped and overwritten), and
  * the commit is still atomic + conflict-checked.
  */
class RebucketJob(
    table: QTable,
    newBuckets: Int,
    targetFileBytes: Long = 128L << 20,
    jobId: String = java.util.UUID.randomUUID().toString) {

  def run(): Snapshot = {
    require(newBuckets >= 1, "newBuckets must be >= 1")
    val snap = table.currentSnapshot
    require(newBuckets != snap.buckets,
      s"table already has ${snap.buckets} buckets")
    val entries = table.entries(snap)
    if (entries.isEmpty)
      return table.commit(Some(snap), "rebucket", Nil,
        Map("job-id" -> jobId, "buckets-before" -> snap.buckets.toString),
        bucketsOverride = Some(newBuckets))

    val totalBytes = entries.map(_.byteCount).sum
    val subPerBucket = math.max(1,
      math.round(totalBytes.toDouble / newBuckets / targetFileBytes).toInt)
    val nOut = newBuckets * subPerBucket

    val ckpt = new Checkpoint(table, jobId)
    val inputs = entries.map(_.path)
    // delete files join the checkpoint input identity (see CompactJob)
    val ckptInputs = inputs ++ table.deleteInputsFor(snap, inputs) ++
      table.eqDeleteInputsFor(snap, entries)
    val outputs = GroupRunner.run[Seq[String]](Seq(inputs), _ => "all",
      _ => ckptInputs,
      ckpt.committed, Int.MaxValue, concurrency = 1) { paths =>
      val dir = table.newDataDir(jobId, "all")
      cleanDir(dir)
      val bucket = pmod(xxhash64(col("image_id")), lit(newBuckets.toLong)).cast("int")
      val sub = pmod(xxhash64(col("image_id"), lit("sub")), lit(subPerBucket.toLong)).cast("int")
      // decorated whole-table read: the rewrite folds every live
      // position delete (the commit below clears the set) and bakes
      // initial defaults in (see CompactJob)
      val df = table.readEntriesForRewrite(snap, entries)
        .withColumn("pbucket", bucket)
      // day-partitioned tables re-bin on (day, newBucket, sub) so the
      // spec-evolution rewrite PRESERVES day isolation (JobPlanning
      // .dayBins — one column-pruned span pass, trivial next to the
      // full rewrite rebucket already is)
      val laid = graft.format.DayPartition.fieldOf(snap)
        .flatMap(f => JobPlanning.dayBins(df, f, newBuckets, subPerBucket))
        .map(_.sortWithinPartitions("pbucket", "phash"))
        .getOrElse(
          ExactShuffle.repartitionByBin(
            df.withColumn("__bin", col("pbucket") * subPerBucket + sub),
            nOut, col("__bin"))
            .drop("__bin")
            .sortWithinPartitions("pbucket", "phash"))
      graft.format.TableWrite.parquet(
        JobPlanning.alignToPhysical(laid, snap), dir)
      val files = table.harvest(dir)
      val entry = LineageEntry(jobId, "rebucket", "all", ckptInputs, files,
        files.map(_.rowCount).sum, files.map(_.byteCount).sum, "committed", 1)
      ckpt.commit(entry)
      entry
    }

    val committed = table.commit(Some(snap), "rebucket",
      outputs.flatMap(_.outputFiles).toSeq, Map(
        "job-id" -> jobId,
        "buckets-before" -> snap.buckets.toString,
        "bytes-rewritten" -> totalBytes.toString),
      bucketsOverride = Some(newBuckets),
      // whole-table rewrite folds all deletes, both flavors
      deletesOverride = Some(Nil),
      eqDeletesOverride = Some(Nil))
    ckpt.clear()
    committed
  }

  private def cleanDir(dir: String): Unit = {
    val hp = new HPath(dir)
    val fs = hp.getFileSystem(table.hadoopConf)
    if (fs.exists(hp)) fs.delete(hp, true)
  }
}
