package graft.streaming

import graft.format.QTable
import graft.jobs.{CommitRetry, MergeJob, UpsertJob}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming UPSERT into a qtable: each micro-batch runs a
  * merge-on-read MERGE ([[MergeJob]] with `mergeOnRead = true`), so a
  * live CDC feed of corrections/deletes lands with commit cost
  * O(changed rows) per batch — position deletes for matched old rows,
  * appended files for patches and inserts, zero data files rewritten.
  * This is the streaming face of the reference's correction flow (EP2:
  * new transaction files upsert the portfolio's partition), upgraded
  * from last-writer-wins path overwrite to transactional MERGE.
  *
  * Exactly-once: the same (queryName, batchId)-derived job-id dedup as
  * [[StreamingAppend]] — a replayed batch whose merge already committed
  * is skipped, so crash-replay cannot double-apply deletes or double-
  * insert rows.
  *
  * Multi-event keys: ANSI MERGE (and MergeJob) rejects a source with
  * two rows per key, but a CDC micro-batch routinely carries several
  * events for one key. Pass `seqCol` (an event-sequence column, not a
  * table column) and the sink resolves last-wins per key by it before
  * merging — the q11 window-dedup operator fused into the sink. Without
  * `seqCol`, multi-event batches are rejected (no row order exists to
  * define "last").
  *
  * `updateCols` empty = SET every data column (whole-record upsert, the
  * reference's semantics); `deleteCol` names a boolean source column
  * marking CDC deletes. Maintenance (compact folds the accumulating
  * position deletes; rewrite-deletes consolidates them) runs
  * concurrently through optimistic commit retry, like any writer.
  *
  * `equality = true` switches the per-batch commit from MOR MERGE to the
  * SCAN-FREE [[UpsertJob]] (equality deletes): the MOR MERGE still scans
  * every candidate file per batch to address the matched rows, which at
  * 10^12 rows dominates the feed's cost — the equality path writes the
  * batch's keys as one delete file and its rows as appends, O(batch)
  * total. Whole-record only (there is no old row on hand to patch), so
  * it rejects a non-empty `updateCols`; compact folds the accumulating
  * key-delete debt like any other.
  */
class StreamingUpsert(table: QTable, queryName: String,
    updateCols: Seq[String] = Nil,
    deleteCol: Option[String] = None,
    seqCol: Option[String] = None,
    equality: Boolean = false) {

  require(!equality || updateCols.isEmpty,
    "equality upsert replaces whole records (no old row is read to " +
      "patch); drop updateCols or use the merge-on-read path")

  private def jobId(batchId: Long): String = s"upsert-$queryName-b$batchId"

  /** True iff this (queryName, batchId) already committed — newest-first
    * walk so the common case (no replay) reads one snapshot. */
  def isCommitted(batchId: Long): Boolean = {
    val id = jobId(batchId)
    table.listVersions.reverse.exists(v =>
      table.snapshotAt(v).summary.get("job-id").contains(id))
  }

  /** The foreachBatch sink: idempotent merge-on-read MERGE of one batch. */
  val sink: (DataFrame, Long) => Unit = (df0, batchId) => {
    if (!df0.isEmpty && !isCommitted(batchId)) {
      val df = seqCol match {
        case Some(sc) =>
          val w = Window.partitionBy("image_id").orderBy(col(sc).desc)
          df0.withColumn("__rn", row_number().over(w))
            .where(col("__rn") === 1).drop("__rn", sc)
        case None => df0
      }
      if (equality)
        CommitRetry.withCommitRetry()(
          new UpsertJob(table, jobId(batchId), deleteCol = deleteCol).run(df))
      else {
        val sets =
          if (updateCols.nonEmpty) updateCols
          else table.storedSchema.fieldNames.toSeq
            .filterNot(c => c == "image_id" || c == "pbucket")
        CommitRetry.withCommitRetry()(
          new MergeJob(table, jobId(batchId), updateCols = sets,
            deleteCol = deleteCol, mergeOnRead = true).run(df))
      }
    }
  }

  /** Wire a streaming DataFrame of correction rows into the table. */
  def start(stream: DataFrame, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(sink)
      .start()
}
