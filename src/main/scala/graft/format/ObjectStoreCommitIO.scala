package graft.format

/** The minimal object-store contract the qtable commit protocol needs —
  * the boundary a GCS/S3 vendor binding implements (the reference's
  * whole sink surface is such a store,
  * `google_cloud_storage_client.py:40-163`):
  *
  *  - `put` — single-object PUT: atomic replace (readers see old or new
  *    bytes, never partial). GCS/S3 single-object PUT is atomic.
  *  - `putIfAbsent` — conditional PUT, the optimistic version claim:
  *    GCS `if-generation-match: 0`, S3 `If-None-Match: *`. Exactly one
  *    of N racing callers may win.
  *  - `list(prefix)` — keys under a prefix. GCS/S3 listing is strongly
  *    consistent since 2020, which is what makes listVersions sound.
  *  - no directories, no rename: the commit protocol above never uses
  *    either (writeAtomic maps to plain PUT, mkdirs is a no-op).
  *
  * [[ObjectStoreCommitIO]] adapts this contract to [[CommitIO]], so the
  * ENTIRE metadata protocol (version claim, hint flip, manifests,
  * checkpoints, expiry) is exercised against object-store semantics —
  * the spec drives a full table lifecycle through an in-memory store
  * implementing this trait; a production deployment only swaps in the
  * vendor SDK calls.
  */
trait ObjectStore extends Serializable {
  def get(key: String): Option[Array[Byte]]
  /** Atomic single-object replace. */
  def put(key: String, bytes: Array[Byte]): Unit
  /** Conditional PUT (create-only): true iff this call created the key. */
  def putIfAbsent(key: String, bytes: Array[Byte]): Boolean
  /** All keys with the given prefix. */
  def list(prefix: String): Seq[String]
  /** True iff the key existed and was removed. */
  def delete(key: String): Boolean
}

/** [[CommitIO]] over an [[ObjectStore]]: paths are keys, "directories"
  * are pure prefixes. */
class ObjectStoreCommitIO(store: ObjectStore) extends CommitIO {

  override def readBytes(path: String): Array[Byte] =
    store.get(path).getOrElse(
      throw new java.io.FileNotFoundException(path))

  /** Single-object PUT is the object store's atomic publish — no
    * tmp-file-then-rename dance (there is no rename). */
  override def writeAtomic(path: String, bytes: Array[Byte]): Unit =
    store.put(path, bytes)

  /** The optimistic version claim = conditional PUT. */
  override def writeNew(path: String, bytes: Array[Byte]): Boolean =
    store.putIfAbsent(path, bytes)

  /** Immediate children (files and "dirs") of the prefix. */
  override def listNames(dir: String): Seq[String] =
    children(dir).keys.toSeq

  /** Children that have deeper keys below them ("dirs"). */
  override def listDirNames(dir: String): Seq[String] =
    children(dir).collect { case (name, hasDeeper) if hasDeeper => name }.toSeq

  /** name -> has-deeper-levels, over the immediate children of dir. */
  private def children(dir: String): Map[String, Boolean] = {
    val prefix = if (dir.endsWith("/")) dir else dir + "/"
    store.list(prefix).foldLeft(Map.empty[String, Boolean]) { (acc, key) =>
      val rest = key.stripPrefix(prefix)
      val slash = rest.indexOf('/')
      if (rest.isEmpty) acc
      else if (slash < 0) acc.updated(rest, acc.getOrElse(rest, false))
      else acc.updated(rest.take(slash), true)
    }
  }

  /** A key exists, or the path is a non-empty prefix ("directory"). */
  override def exists(path: String): Boolean =
    store.get(path).isDefined ||
      store.list(if (path.endsWith("/")) path else path + "/").nonEmpty

  override def delete(path: String): Boolean = store.delete(path)

  override def deleteRecursive(path: String): Unit = {
    store.delete(path)
    store.list(if (path.endsWith("/")) path else path + "/")
      .foreach(store.delete)
  }

  /** Object stores have no directories. */
  override def mkdirs(path: String): Unit = ()
}
