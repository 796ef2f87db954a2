package graft.format

/** A named MUTABLE reference to a snapshot chain head (Iceberg branch
  * analogue): `metadata/branch-<name>.text` holds the branch's head
  * version, exactly like `version-hint.text` holds main's. Where a tag
  * pins one immutable version, a branch is a writable line of history:
  * [[QTable.onBranch]] returns a view whose reads resolve the branch
  * head and whose commits advance it — main's hint is untouched, so a
  * branch is where risky work (an experimental re-encode, a staged
  * backfill, a what-if merge) runs with full table semantics (snapshot
  * isolation, checkpointed resume, scan-equivalence audits) without a
  * reader on main ever seeing it. [[graft.jobs.FastForwardJob]]
  * publishes a branch to main when main has not advanced past the fork.
  *
  * Version numbers are GLOBAL across refs (every commit claims
  * `max(version)+1` via the same conditional-PUT the commit protocol
  * uses), so snapshot files never collide and the data-sequence-number
  * domain stays monotonic along every chain; each ref's history is its
  * parent-pointer chain, not a consecutive integer range.
  *
  * Creation is first-writer-wins ([[CommitIO.writeNew]]); advancing the
  * head is the commit protocol's publish step (atomic rename / PUT).
  * Branch heads are exempt from snapshot expiry (like tags); a branch's
  * NON-head ancestors age out with normal retention — size `--keep` to
  * the history depth you need. */
final case class BranchRef(name: String, version: Long)

object Branches {

  private def file(t: QTable, name: String): String =
    s"${t.metadataDir}/branch-$name.text"

  def exists(t: QTable, name: String): Boolean = t.io.exists(file(t, name))

  /** Fork a branch at `from` (default: the current MAIN head). */
  def create(t: QTable, name: String, from: Long = -1L): BranchRef = {
    require(name.nonEmpty && name.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"invalid branch name: $name")
    val v = if (from < 0) t.currentVersion else from
    require(t.listVersions.contains(v), s"no retained snapshot v$v to branch from")
    if (!t.io.writeNew(file(t, name),
        v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      throw new IllegalStateException(s"branch $name already exists")
    BranchRef(name, v)
  }

  def head(t: QTable, name: String): Long = {
    require(exists(t, name), s"no such branch: $name")
    new String(t.io.readBytes(file(t, name))).trim.toLong
  }

  /** Advance the branch head — the publish step of a branch commit. */
  private[graft] def advance(t: QTable, name: String, v: Long): Unit =
    t.io.writeAtomic(file(t, name),
      v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def delete(t: QTable, name: String): Boolean = t.io.delete(file(t, name))

  def list(t: QTable): Seq[BranchRef] =
    t.io.listNames(t.metadataDir)
      .collect { case s if s.startsWith("branch-") && s.endsWith(".text") =>
        val n = s.stripPrefix("branch-").stripSuffix(".text")
        BranchRef(n, head(t, n)) }
      .sortBy(_.name)
}
