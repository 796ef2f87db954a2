package graft.format

import org.apache.spark.sql.DataFrame

/** A named immutable reference to one snapshot version (Iceberg tag
  * analogue): `metadata/tag-<name>.json`. Tagged versions are exempt from
  * snapshot expiry, making retention policy explicit — "keep the last K
  * plus every tagged release". A tag protects its own snapshot (and the
  * files it references), NOT the chain of versions between tags. */
final case class TagRef(name: String, version: Long, createdAtMs: Long)

/** Tag operations over a [[QTable]]'s metadata store. Creation is
  * first-writer-wins through the same conditional-PUT primitive commits
  * use ([[CommitIO.writeNew]]): re-pointing a tag requires an explicit
  * delete, so a tag can never silently move — the property that makes a
  * tag safe to hand to a downstream consumer as a reproducible dataset
  * version (e.g. "the training snapshot release"). All operations are
  * metadata-sized: O(1) reads/writes plus one O(tags) listing. */
object Tags {

  private def tagFile(t: QTable, name: String): String =
    s"${t.metadataDir}/tag-$name.json"

  /** Create an immutable named reference to `version` (default: head). */
  def create(t: QTable, name: String, version: Long = -1L): TagRef = {
    require(name.nonEmpty && name.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"invalid tag name: $name")
    val v = if (version < 0) t.currentVersion else version
    require(t.listVersions.contains(v), s"no retained snapshot v$v to tag")
    val ref = TagRef(name, v, System.currentTimeMillis())
    if (!t.io.writeNew(tagFile(t, name), Json.toBytes(ref)))
      throw new IllegalStateException(
        s"tag $name already exists (delete it first to re-point)")
    ref
  }

  def delete(t: QTable, name: String): Boolean = t.io.delete(tagFile(t, name))

  def list(t: QTable): Seq[TagRef] =
    t.io.listNames(t.metadataDir)
      .collect { case s if s.startsWith("tag-") && s.endsWith(".json") =>
        Json.fromBytes(t.io.readBytes(s"${t.metadataDir}/$s"), classOf[TagRef]) }
      .sortBy(_.name)

  def ref(t: QTable, name: String): TagRef = {
    require(t.io.exists(tagFile(t, name)), s"no such tag: $name")
    Json.fromBytes(t.io.readBytes(tagFile(t, name)), classOf[TagRef])
  }

  /** Read the snapshot a tag points at (time travel by name). */
  def read(t: QTable, name: String): DataFrame =
    t.read(t.snapshotAt(ref(t, name).version))
}
