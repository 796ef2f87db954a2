package graft.jobs

import graft.model.LineageEntry

import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.util.{Failure, Success, Try}

/** One group failed after all retry attempts. */
final case class GroupFailure(group: String, attempts: Int, error: Throwable)

/** Raised AFTER every sibling group has run to completion: failed groups
  * are isolated (the reference's `asyncio.gather(return_exceptions=True)`,
  * `eodhd_processor.py:117`), their lineage is recorded `failed`, and the
  * job exits non-zero WITHOUT committing a snapshot. A resume with the
  * same jobId skips committed groups and retries only the failed ones. */
class GroupsFailedException(val failures: Seq[GroupFailure])
    extends RuntimeException(
      s"${failures.size} group(s) failed: " +
        failures.map(f => s"${f.group} (${f.attempts} attempts: ${f.error.getMessage})")
          .mkString("; "),
      failures.head.error)

/** Runs a job's partition groups, skipping checkpoint-committed ones.
  *
  * Groups run CONCURRENTLY (bounded pool): each group is an independent
  * Spark action over a disjoint file set, and Spark schedules concurrent
  * jobs' tasks together — without this, a group whose rewrite needs only
  * a few tasks would leave most of the cluster idle (exactly the
  * semaphore-bounded fan-out the reference uses for its work lists,
  * `eodhd_processor.py:236-248`, re-expressed over Spark jobs).
  *
  * Failure semantics (reference D2-D5, SURVEY §2.7):
  *  - per-group retry with exponential backoff (tenacity analogue,
  *    `base_api_client.py:25-30`);
  *  - a group that exhausts retries does NOT kill siblings; `onFailure`
  *    records its `failed` lineage and the job throws
  *    [[GroupsFailedException]] at the end (swallow-log-continue,
  *    `eodhd_processor.py:107-109`, upgraded to durable lineage).
  *
  * Checkpoint reuse is validated against the CURRENT plan's input files:
  * a lineage entry written by an earlier run of the same jobId over a
  * different snapshot (different inputs) is stale and is re-run, never
  * silently reused.
  *
  * `failAfterGroups` (test hook for kill/resume specs) forces sequential
  * execution so "crash after k commits" is well-defined; a simulated
  * crash is a driver death, not a group failure — no retry, no isolation.
  */
object GroupRunner {

  /** Default await bound: large but FINITE — a hung group must not hang
    * the driver forever in the default config. Committed groups' lineage
    * survives a timeout, so a timed-out job resumes like a killed one. */
  val DefaultAwait: Duration = Duration(24, "h")

  def defaultTimeout: Duration =
    sys.env.get("GRAFT_GROUP_TIMEOUT_SEC")
      .map(s => Duration(s.toLong, "s"))
      .getOrElse(DefaultAwait)

  def run[P](
      plans: Seq[P],
      groupOf: P => String,
      inputsOf: P => Seq[String],
      already: Map[String, LineageEntry],
      failAfterGroups: Int,
      concurrency: Int,
      maxAttempts: Int = 3,
      backoffMs: Long = 100L,
      onFailure: GroupFailure => Unit = _ => (),
      awaitTimeout: Duration = null,
      sizeOf: P => Long = (_: P) => 0L)(
      rewrite: P => LineageEntry): Seq[LineageEntry] = {

    def reusable(p: P): Option[LineageEntry] =
      already.get(groupOf(p)).filter(_.inputFiles.toSet == inputsOf(p).toSet)

    val (done, todo0) = plans.partition(p => reusable(p).isDefined)
    val reused = done.map(p => reusable(p).get)
    // LPT scheduling: largest groups first, so the odd oversized group
    // (bucket coalescing makes some groups ~1.5x the median) never starts
    // in the final wave and stretches the tail — with uniform sizes this
    // is a no-op (stable sort keeps plan order)
    val todo = todo0.sortBy(p => -sizeOf(p))

    def withRetry(p: P): Either[GroupFailure, LineageEntry] = {
      var attempt = 1
      var last: Try[LineageEntry] = Try(rewrite(p))
      while (last.isFailure && attempt < maxAttempts) {
        Thread.sleep(backoffMs << (attempt - 1)) // exp backoff
        attempt += 1
        last = Try(rewrite(p))
      }
      last match {
        case Failure(e) =>
          val gf = GroupFailure(groupOf(p), attempt, e)
          onFailure(gf)
          Left(gf)
        case Success(v) => Right(v)
      }
    }

    val attempted: Seq[Either[GroupFailure, LineageEntry]] =
      if (failAfterGroups != Int.MaxValue) {
        // deterministic sequential mode for crash-injection tests; the
        // simulated crash is a driver death (thrown OUTSIDE withRetry),
        // but real rewrite failures before the crash point still get the
        // full retry/backoff/failed-lineage treatment
        todo.zipWithIndex.map { case (p, i) =>
          if (i >= failAfterGroups)
            throw new RuntimeException(s"[test-hook] simulated crash after $i groups")
          withRetry(p)
        }
      } else {
        // ALWAYS through the bounded pool (even a single group): the
        // bounded-await guarantee — a hung group must not hang the driver
        // forever — has to hold regardless of group count or concurrency.
        // Daemon threads: a group hung past the await bound must not keep
        // the JVM alive after the driver gives up on the job.
        val pool = Executors.newFixedThreadPool(
          math.max(1, math.min(concurrency, todo.size)),
          (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        try {
          val futs = todo.map(p => Future(withRetry(p)))
          val timeout = Option(awaitTimeout).getOrElse(defaultTimeout)
          Await.result(Future.sequence(futs), timeout)
        } finally pool.shutdown()
      }

    val failures = attempted.collect { case Left(gf) => gf }
    if (failures.nonEmpty) throw new GroupsFailedException(failures)

    reused ++ attempted.collect { case Right(e) => e }
  }
}
