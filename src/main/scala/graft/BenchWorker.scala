package graft

import graft.format.QTable
import graft.jobs.{ClusterJob, CompactJob}
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** One simulated EXECUTOR for the process-level scaling evidence: a
  * separate JVM with its own heap, GC, and shuffle dirs, running the
  * maintenance suite (compact + z-order cluster) over the shard tables it
  * is assigned — the faithful sandbox analogue of "N executors vs 4N
  * executors", where scaling adds JVMs, not threads inside one JVM.
  *
  * Protocol (file-based barrier, so JVM startup and JIT warm-up are never
  * inside the timed window):
  *   args = cores syncDir workerId rounds targetMb shardDir1[,shardDir2...]
  *   per round r in 1..rounds:
  *     - wait for <syncDir>/start-r            (parent touches when copies are ready)
  *     - run compact+cluster over <shard>/r<r> work copies, sequentially
  *     - write elapsed seconds to <syncDir>/done-r-<workerId>
  * The parent ([[Bench]]) measures the level's wall time from touching
  * start-r to the last done-r-* appearing.
  */
object BenchWorker {

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val syncDir = Paths.get(args(1))
    val workerId = args(2)
    val rounds = args(3).toInt
    val targetMb = args(4).toLong
    val shards = args(5).split(",").toSeq

    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-worker-$workerId")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.parquet.columnarReaderBatchSize", "512")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      // shuffle dirs under the parent's working set (base/procs/...), so
      // Bench's end-of-run cleanup removes them even though the parent
      // destroyForcibly()s workers before Spark's own shutdown hooks run —
      // RAM-backed shuffle files must never accumulate across bench runs
      .config("spark.local.dir",
        syncDir.getParent.resolve(s"spark-local-$workerId").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    def spinUntil(p: java.nio.file.Path): Unit =
      while (!Files.exists(p)) Thread.sleep(5)

    Files.createDirectories(syncDir)
    Files.write(syncDir.resolve(s"up-$workerId"), Array.emptyByteArray)

    for (r <- 1 to rounds) {
      spinUntil(syncDir.resolve(s"start-$r"))
      val t0 = System.nanoTime()
      shards.foreach { shard =>
        val t = QTable(s"$shard/r$r", s)
        val conc = math.max(2, cores)
        new CompactJob(t, targetMb << 20,
          jobId = s"w$workerId-compact-$r", concurrency = conc).run()
        new ClusterJob(t, targetMb << 20,
          jobId = s"w$workerId-cluster-$r", concurrency = conc).run()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      Files.write(syncDir.resolve(s"done-$r-$workerId"),
        sec.toString.getBytes("UTF-8"))
    }
    s.stop()
  }
}
