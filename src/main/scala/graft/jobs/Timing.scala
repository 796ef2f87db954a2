package graft.jobs

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Per-group wall-time samples from maintenance jobs, consumed by Bench.
  *
  * The sandbox host shows multi-minute noise bursts (identical 100 MiB
  * group rewrites measure 6 s or 50 s depending on the minute). Groups
  * are homogeneous, so the MEDIAN group time x wave count is a
  * noise-robust estimator of steady-state suite time; Bench reports both
  * the raw wall time and this filtered estimate.
  */
object Timing {
  final case class Sample(job: String, group: String, seconds: Double)
  private val q = new ConcurrentLinkedQueue[Sample]()

  def record(job: String, group: String, seconds: Double): Unit =
    q.add(Sample(job, group, seconds))

  def drain(): Seq[Sample] = {
    val out = scala.collection.mutable.ArrayBuffer[Sample]()
    var s = q.poll()
    while (s != null) { out += s; s = q.poll() }
    out.toSeq
  }

  def median(xs: Seq[Double]): Double = {
    if (xs.isEmpty) return 0.0
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** Steady-state estimate: waves of `concurrency` groups, each wave
    * costing the median group time. */
  def estimate(samples: Seq[Sample], job: String, concurrency: Int): Double = {
    val xs = samples.filter(_.job == job).map(_.seconds)
    if (xs.isEmpty) 0.0
    else math.ceil(xs.size.toDouble / concurrency) * median(xs)
  }
}
