package graft

import graft.queries.Queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import java.nio.file.{Files, Paths}

/** Optimization-evidence tool (round 6): dumps `explain("formatted")`
  * for every declared query to `<outDir>/<query>_<tag>.txt`, under the
  * same session shape as the bench's query pack (local[cpus], shuffle
  * partitions = cpus, AQE on). Usage:
  *   runMain graft.PlanDump <outDir> <tag> [queryPrefix...]
  * m1 is omitted (its "plan" is the whole maintenance pipeline, not one
  * query plan); q40 executes a streaming drain before returning its
  * frame, which the dump tolerates. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val only: Seq[String] = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.parquet.columnarReaderBatchSize", "512")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    Queries.prewarmFixtures(spark, sfDir)
    val qs = (Queries.withOracle.map { case (k, (fn, _)) => k -> fn } ++
      Queries.withoutOracle).toSeq.sortBy(_._1)
      .filter { case (k, _) => only.isEmpty || only.exists(k.startsWith) }
    qs.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), txt)
        System.err.println(s"[plandump] $name ok")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
