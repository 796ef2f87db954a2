package graft.jobs

import graft.format.CommitConflictException

/** Optimistic-concurrency retry loop for maintenance jobs (the Iceberg
  * commit-retry pattern): a job that loses the version race re-RUNS
  * against the new current snapshot. Re-running is safe and cheap
  * because every job replans from `currentSnapshot` and its per-group
  * checkpoint survives the failed attempt — groups whose input files
  * were untouched by the winning commit are reused verbatim (input-set
  * validation re-runs exactly the groups the other writer invalidated).
  */
object CommitRetry {

  def withCommitRetry[T](maxAttempts: Int = 3, backoffMs: Long = 50L)(body: => T): T = {
    var attempt = 1
    while (true) {
      try return body
      catch {
        case e: CommitConflictException =>
          if (attempt >= maxAttempts) throw e
          Thread.sleep(backoffMs << (attempt - 1))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
