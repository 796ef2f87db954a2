package graft.jobs

import graft.model.LineageEntry
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.atomic.AtomicInteger
import scala.collection.concurrent.TrieMap

class GroupRunnerSpec extends AnyFunSuite {

  private def entry(g: String) =
    LineageEntry("j", "t", g, Seq(s"in-$g"), Nil, 1L, 1L, "committed", 1)

  private val plans = Seq("g0", "g1", "g2", "g3")

  test("failure isolation: one poisoned group does not kill siblings") {
    val done = TrieMap[String, Int]()
    val attempts = new AtomicInteger(0)
    val failures = scala.collection.mutable.ArrayBuffer[GroupFailure]()
    val ex = intercept[GroupsFailedException] {
      GroupRunner.run[String](plans, identity, g => Seq(s"in-$g"), Map.empty,
        Int.MaxValue, concurrency = 2, maxAttempts = 3, backoffMs = 1L,
        onFailure = f => failures.synchronized { failures += f }) { g =>
        if (g == "g2") { attempts.incrementAndGet(); sys.error("poisoned") }
        done.updateWith(g) { c => Some(c.getOrElse(0) + 1) }
        entry(g)
      }
    }
    // siblings all completed exactly once despite g2 failing
    assert(done.keySet == Set("g0", "g1", "g3"))
    assert(done.values.forall(_ == 1))
    // the poisoned group was retried with backoff (tenacity analogue)
    assert(attempts.get() == 3)
    assert(failures.map(_.group) == Seq("g2"))
    assert(ex.failures.map(_.group) == Seq("g2"))
  }

  test("resume after failure: committed siblings are reused, failed re-run") {
    val already = Map("g0" -> entry("g0"), "g1" -> entry("g1"), "g3" -> entry("g3"))
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    val out = GroupRunner.run[String](plans, identity, g => Seq(s"in-$g"), already,
      Int.MaxValue, concurrency = 2) { g => ran.synchronized(ran += g); entry(g) }
    assert(ran.toSeq == Seq("g2"), "only the previously-failed group re-runs")
    assert(out.map(_.group).toSet == plans.toSet)
  }

  test("stale checkpoint rejected: input mismatch forces a re-run") {
    // g1's lineage was written for DIFFERENT inputs (an earlier run of the
    // same jobId over an older snapshot) -> must not be reused
    val stale = entry("g1").copy(inputFiles = Seq("old-input"))
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    GroupRunner.run[String](Seq("g0", "g1"), identity, g => Seq(s"in-$g"),
      Map("g0" -> entry("g0"), "g1" -> stale),
      Int.MaxValue, concurrency = 1) { g => ran.synchronized(ran += g); entry(g) }
    assert(ran.toSeq == Seq("g1"))
  }

  test("hung group: bounded await times out, committed siblings survive, resumable") {
    val done = TrieMap[String, Int]()
    val committed = TrieMap[String, LineageEntry]()
    intercept[java.util.concurrent.TimeoutException] {
      GroupRunner.run[String](plans, identity, g => Seq(s"in-$g"), Map.empty,
        Int.MaxValue, concurrency = 4,
        awaitTimeout = scala.concurrent.duration.Duration(2, "s")) { g =>
        if (g == "g2") Thread.sleep(60000) // hung group (daemon thread)
        done.updateWith(g) { c => Some(c.getOrElse(0) + 1) }
        val e = entry(g); committed.put(g, e); e
      }
    }
    // siblings finished and their lineage was durably recorded before the
    // driver gave up on the hung group
    assert(done.keySet == Set("g0", "g1", "g3"))
    // a resume (same jobId => lineage map) re-runs ONLY the hung group
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    val out = GroupRunner.run[String](plans, identity, g => Seq(s"in-$g"),
      committed.toMap, Int.MaxValue, concurrency = 2) { g =>
      ran.synchronized(ran += g); entry(g)
    }
    assert(ran.toSeq == Seq("g2"))
    assert(out.map(_.group).toSet == plans.toSet)
  }

  test("default await bound is finite (a hung group cannot hang the driver forever)") {
    assert(GroupRunner.defaultTimeout.isFinite)
  }

  test("transient failure: retry succeeds within maxAttempts") {
    val tries = new AtomicInteger(0)
    val out = GroupRunner.run[String](Seq("g0"), identity, g => Seq(s"in-$g"),
      Map.empty, Int.MaxValue, concurrency = 1, maxAttempts = 3, backoffMs = 1L) { g =>
      if (tries.incrementAndGet() < 3) sys.error("transient")
      entry(g)
    }
    assert(tries.get() == 3)
    assert(out.map(_.group) == Seq("g0"))
  }
}
