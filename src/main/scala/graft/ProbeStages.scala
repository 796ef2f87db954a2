package graft

import graft.expr.zfunctions._
import graft.format.QTable
import graft.jobs._
import graft.synth.DataGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Dev-only stage isolation probe for the cluster rewrite: measures scan,
  * scan+shuffle, and scan+shuffle+sort+write separately at one
  * parallelism level to find where wall time goes. */
object ProbeStages {

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 100000L
    val cpus = if (args.length > 1) args(1).toInt else 8
    val extraConf = args.length > 2 && args(2) == "buf"
    val base = Files.createTempDirectory(Paths.get("/dev/shm"), "graft-pstages")

    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.parquet.columnarReaderBatchSize", "512")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
    if (extraConf) {
      b.config("spark.shuffle.file.buffer", "1m")
        .config("spark.shuffle.unsafe.file.output.buffer", "4m")
        .config("spark.shuffle.spill.diskWriteBufferSize", "1m")
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    val t = QTable.create(base.resolve("t").toString, s, 32)
    AppendJob.append(t, DataGen.generate(s, rows, 42L, 0, Array(64, 96, 128)).toDF(), 8)
    val paths = t.entries(t.currentSnapshot).map(_.path)
    val bytesTotal = t.entries(t.currentSnapshot).map(_.byteCount).sum

    // task-level attribution: run time, GC time, shuffle/serialization —
    // distinguishes "work inflates under parallelism" (contention) from
    // "same work, badly packed" (quantization/scheduling)
    val taskNanos = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val taskCount = new java.util.concurrent.atomic.AtomicLong
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          taskNanos.addAndGet(m.executorRunTime * 1000000L)
          gcMs.addAndGet(m.jvmGCTime)
          taskCount.incrementAndGet()
        }
      }
    })

    def timed(name: String)(f: => Unit): Unit = {
      taskNanos.set(0); gcMs.set(0); taskCount.set(0)
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // listener drain
      System.err.println(f"[pstages] $name%-28s $sec%7.2fs  ${bytesTotal / 1e6 / sec}%6.1f MB/s" +
        f"  tasks=${taskCount.get()}%3d task-sec=${taskNanos.get() / 1e9}%7.2f gc-sec=${gcMs.get() / 1e3}%6.2f")
    }

    val zk = imageZKey(col("phash"), col("w"), col("h"), col("image_id"), hilbert = false)
    def keyed = t.readFiles(paths).withColumn("zkey", zk)
      .withColumn("tiebreak", xxhash64(col("image_id")))
    val nOut = 64

    // warm-up
    t.readFiles(Seq(paths.head)).agg(sum(length(col("bytes")))).collect()

    timed("scan+decode only") {
      keyed.agg(sum(length(col("bytes"))), sum(pmod(col("zkey"), lit(1000000L)))).collect()
    }
    timed("scan+shuffle(repartition)") {
      ExactShuffle.repartitionByBin(
        keyed.withColumn("__bin", pmod(col("tiebreak"), lit(nOut.toLong)).cast("int")),
        nOut, col("__bin"))
        .agg(sum(length(col("bytes"))), sum(pmod(col("zkey"), lit(1000000L)))).collect()
    }
    timed("scan+shuffle+sort+count") {
      ExactShuffle.repartitionByBin(
        keyed.withColumn("__bin", pmod(col("tiebreak"), lit(nOut.toLong)).cast("int")),
        nOut, col("__bin"))
        .sortWithinPartitions("zkey", "tiebreak")
        .agg(sum(length(col("bytes"))), sum(pmod(col("zkey"), lit(1000000L)))).collect()
    }
    timed("scan+write (compact path)") {
      t.readFiles(paths).write.mode("overwrite").parquet(base.resolve("w1").toString)
    }
    timed("full cluster path") {
      ExactShuffle.repartitionByBin(
        keyed.withColumn("__bin", pmod(col("tiebreak"), lit(nOut.toLong)).cast("int")),
        nOut, col("__bin"))
        .sortWithinPartitions("zkey", "tiebreak")
        .drop("zkey", "tiebreak", "__bin")
        .write.mode("overwrite").parquet(base.resolve("w2").toString)
    }

    s.stop()
    import scala.jdk.CollectionConverters._
    Files.walk(base).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
  }
}
