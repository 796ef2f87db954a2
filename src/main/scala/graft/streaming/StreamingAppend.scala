package graft.streaming

import graft.format.QTable
import graft.jobs.{AppendJob, CommitRetry}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming ingestion into a qtable: micro-batches append as
  * ordinary snapshots via `foreachBatch`, so every lakehouse guarantee
  * (snapshot isolation, time travel, incremental scan, maintenance under
  * live readers) applies to streamed data with zero new write machinery.
  *
  * Exactly-once across restarts: Spark replays the last unacknowledged
  * micro-batch after a crash between the sink call and the streaming
  * checkpoint commit. The sink makes the append IDEMPOTENT by deriving
  * the commit's job id from (queryName, batchId) and skipping batches
  * whose id is already in a retained snapshot's summary — the Iceberg
  * connector's batch-id dedup, re-expressed over qtable metadata. Only
  * the latest batch can ever be in doubt, so the newest-first version
  * walk terminates almost immediately; the walk is bounded by expiry
  * retention either way (a streaming table's retention must exceed one
  * replay window, which it does by orders of magnitude in practice).
  *
  * Scale: appends commit parent manifests by reference — O(batch)
  * metadata per micro-batch, never O(table) — and the table stays
  * compactable/clusterable CONCURRENTLY with the stream because
  * maintenance commits race through optimistic concurrency
  * ([[graft.jobs.CommitRetry]]) like any other writer.
  */
class StreamingAppend(table: QTable, queryName: String,
    filesPerBucket: Int = 1) {

  private def jobId(batchId: Long): String = s"stream-$queryName-b$batchId"

  /** True iff this (queryName, batchId) already committed — newest-first
    * walk so the common case (no replay) reads one snapshot. */
  def isCommitted(batchId: Long): Boolean = {
    val id = jobId(batchId)
    table.listVersions.reverse.exists(v =>
      table.snapshotAt(v).summary.get("job-id").contains(id))
  }

  /** The foreachBatch sink: idempotent append of one micro-batch. */
  val sink: (DataFrame, Long) => Unit = (df, batchId) => {
    if (!df.isEmpty && !isCommitted(batchId))
      CommitRetry.withCommitRetry()(
        AppendJob.append(table, df, filesPerBucket, jobId(batchId)))
  }

  /** Wire a streaming DataFrame into the table. Caller owns the trigger
    * cadence; `Trigger.AvailableNow` drains-and-stops (backfill mode),
    * the default processing-time trigger tails forever. */
  def start(stream: DataFrame, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(sink)
      .start()
}
