package graft.jobs

import graft.format.{Json, QTable}
import graft.model.LineageEntry

/** Per-job checkpoint: one JSON lineage file per committed partition
  * group, published through the table's [[graft.format.CommitIO]] (atomic
  * rename locally, conditional/atomic PUT on object stores). A killed run
  * restarted with the same jobId skips every group whose lineage says
  * "committed" — the idempotent-resume upgrade over the reference's
  * refetch-everything behavior (SURVEY §4.2 "no resumability").
  */
class Checkpoint(table: QTable, val jobId: String) {

  def dir: String = s"${table.metadataDir}/checkpoints/$jobId"
  private def io = table.io

  private def entries: Seq[LineageEntry] =
    io.listNames(dir)
      .filter(_.endsWith(".json"))
      .map(n => Json.fromBytes(io.readBytes(s"$dir/$n"), classOf[LineageEntry]))

  def committed: Map[String, LineageEntry] =
    entries.filter(_.status == "committed").map(e => e.group -> e).toMap

  /** All lineage rows, including `failed` ones (for inspection/metrics). */
  def all: Seq[LineageEntry] = entries.sortBy(_.group)

  def commit(entry: LineageEntry): Unit =
    io.writeAtomic(s"$dir/${sanitize(entry.group)}.json", Json.toBytes(entry))

  /** Delete the checkpoint dir once the job's final snapshot commit has
    * succeeded: a finished jobId must never be resumable against a LATER
    * snapshot (its group names would alias fresh work and silently skip
    * it — input validation in GroupRunner is the second guard). */
  def clear(): Unit = io.deleteRecursive(dir)

  private def sanitize(g: String): String = g.replaceAll("[^A-Za-z0-9_.-]", "_")
}
