package graft

import graft.format.QTable
import graft.jobs._
import graft.synth.DataGen
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Path, Paths}

/** Dev-only scaling probe: runs the maintenance suite (compact + cluster)
  * at a list of parallelism levels on identical copies of one pristine
  * table and prints raw per-phase wall times. Much faster to iterate with
  * than the full Bench (1 round, no query pack, no verify).
  *
  * Usage: sbt "runMain graft.Probe 20000 1,4 8" (rows, cpu list, concurrency)
  */
object Probe {

  private def withSession[T](cpus: Int)(f: SparkSession => T): T = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-probe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.parquet.columnarReaderBatchSize", "512")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.local.dir",
        if (Files.isWritable(Paths.get("/dev/shm")))
          "/dev/shm/graft-spark-local" else System.getProperty("java.io.tmpdir"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    try f(s)
    finally { s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession() }
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  private def copyDir(src: Path, dst: Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(src).iterator().asScala.foreach { p =>
      val q = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(q)
      else { Files.createDirectories(q.getParent); Files.copy(p, q) }
    }
  }

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 20000L
    val cpusList = (if (args.length > 1) args(1) else "1,4").split(",").map(_.toInt).toSeq
    val concOf: Int => Int =
      if (args.length > 2 && args(2) == "x") c => math.max(2, c)
      else if (args.length > 2) { val k = args(2).toInt; _ => k }
      else c => math.max(2, c)
    val rounds = if (args.length > 3) args(3).toInt else 1
    val targetMb = 16L
    val base = Files.createTempDirectory(Paths.get("/dev/shm"), "graft-probe")
    val pristine = base.resolve("pristine")

    withSession(32) { s =>
      val t = QTable.create(pristine.toString, s, 32)
      AppendJob.append(t, DataGen.generate(s, rows, 42L, 0, Array(64, 96, 128)).toDF(), 8)
      System.err.println(s"[probe] table bytes = ${t.entries(t.currentSnapshot).map(_.byteCount).sum / (1 << 20)} MiB, files = ${t.entries(t.currentSnapshot).size}")
    }

    def delDir(pth: Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (Files.exists(pth))
        Files.walk(pth).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }

    val all = for (round <- 1 to rounds; cpus <- cpusList) yield {
      val conc = concOf(cpus)
      val work = base.resolve(s"work-$cpus-$round")
      copyDir(pristine, work)
      val r = withSession(cpus) { s =>
        val t = QTable(work.toString, s)
        // warm-up
        t.readFiles(Seq(t.entries(t.currentSnapshot).head.path))
          .coalesce(1).write.mode("overwrite").parquet(base.resolve(s"warm-$cpus").toString)
        val (_, tC) = time(new CompactJob(t, targetMb << 20,
          jobId = s"probe-compact-$cpus-$round", concurrency = conc).run())
        val (_, tZ) = time(new ClusterJob(t, targetMb << 20,
          jobId = s"probe-cluster-$cpus-$round", concurrency = conc).run())
        System.err.println(f"[probe] r$round cpus=$cpus%2d conc=$conc compact=$tC%7.2fs cluster=$tZ%7.2fs total=${tC + tZ}%7.2fs")
        (cpus, tC, tZ)
      }
      delDir(work)
      r
    }
    val results = cpusList.map { c =>
      val rs = all.filter(_._1 == c)
      (c, rs.map(_._2).min, rs.map(_._3).min)
    }
    results.foreach { case (c, tc, tz) =>
      System.err.println(f"[probe] MIN cpus=$c%2d compact=$tc%7.2fs cluster=$tz%7.2fs total=${tc + tz}%7.2fs")
    }
    results.sliding(2).foreach {
      case Seq((c1, tc1, tz1), (c2, tc2, tz2)) =>
        val sp = (tc1 + tz1) / (tc2 + tz2)
        System.err.println(f"[probe] $c1 -> $c2: speedup=$sp%5.2f eff=${sp / (c2.toDouble / c1)}%5.2f  (compact ${tc1 / tc2}%4.2fx, cluster ${tz1 / tz2}%4.2fx)")
      case _ =>
    }
    // cleanup
    import scala.jdk.CollectionConverters._
    Files.walk(base).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
  }
}
