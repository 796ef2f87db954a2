package graft.jobs

import graft.format.{Json, QTable}
import graft.model.LineageEntry

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Per-job checkpoint: one JSON lineage file per committed partition
  * group, published by atomic rename. A killed run restarted with the
  * same jobId skips every group whose lineage says "committed" — the
  * idempotent-resume upgrade over the reference's refetch-everything
  * behavior (SURVEY §4.2 "no resumability").
  */
class Checkpoint(table: QTable, val jobId: String) {

  def dir: Path = table.metadataDir.resolve("checkpoints").resolve(jobId)

  def committed: Map[String, LineageEntry] = {
    if (!Files.exists(dir)) return Map.empty
    Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .map(p => Json.read(p, classOf[LineageEntry]))
      .filter(_.status == "committed")
      .map(e => e.group -> e)
      .toMap
  }

  /** All lineage rows, including `failed` ones (for inspection/metrics). */
  def all: Seq[LineageEntry] = {
    if (!Files.exists(dir)) return Nil
    Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .map(p => Json.read(p, classOf[LineageEntry]))
      .toSeq.sortBy(_.group)
  }

  def commit(entry: LineageEntry): Unit =
    Json.write(dir.resolve(s"${sanitize(entry.group)}.json"), entry)

  /** Delete the checkpoint dir once the job's final snapshot commit has
    * succeeded: a finished jobId must never be resumable against a LATER
    * snapshot (its group names would alias fresh work and silently skip
    * it — input validation in GroupRunner is the second guard). */
  def clear(): Unit = {
    if (!Files.exists(dir)) return
    Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
  }

  private def sanitize(g: String): String = g.replaceAll("[^A-Za-z0-9_.-]", "_")
}
