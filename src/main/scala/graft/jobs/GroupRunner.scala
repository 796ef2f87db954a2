package graft.jobs

import graft.model.LineageEntry

import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Runs a job's partition groups, skipping checkpoint-committed ones.
  *
  * Groups run CONCURRENTLY (bounded pool): each group is an independent
  * Spark action over a disjoint file set, and Spark schedules concurrent
  * jobs' tasks together — without this, a group whose rewrite needs only
  * a few tasks would leave most of the cluster idle (exactly the
  * semaphore-bounded fan-out the reference uses for its work lists,
  * `eodhd_processor.py:236-248`, re-expressed over Spark jobs).
  *
  * `failAfterGroups` (test hook for kill/resume specs) forces sequential
  * execution so "crash after k commits" is well-defined.
  */
object GroupRunner {

  def run[P](
      plans: Seq[P],
      groupOf: P => String,
      already: Map[String, LineageEntry],
      failAfterGroups: Int,
      concurrency: Int)(rewrite: P => LineageEntry): Seq[LineageEntry] = {

    val (done, todo) = plans.partition(p => already.contains(groupOf(p)))
    val reused = done.map(p => already(groupOf(p)))

    val fresh: Seq[LineageEntry] =
      if (failAfterGroups != Int.MaxValue) {
        // deterministic sequential mode for crash-injection tests
        todo.zipWithIndex.map { case (p, i) =>
          if (i >= failAfterGroups)
            throw new RuntimeException(s"[test-hook] simulated crash after $i groups")
          rewrite(p)
        }
      } else if (todo.size <= 1 || concurrency <= 1) {
        todo.map(rewrite)
      } else {
        val pool = Executors.newFixedThreadPool(math.min(concurrency, todo.size))
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        try {
          val futs = todo.map(p => Future(rewrite(p)))
          Await.result(Future.sequence(futs), Duration.Inf)
        } finally pool.shutdown()
      }

    reused ++ fresh
  }
}
