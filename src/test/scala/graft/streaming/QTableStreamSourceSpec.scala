package graft.streaming

import graft.TestSpark
import graft.format.QTable
import graft.jobs.{AppendJob, CompactJob, DeleteJob, MergeJob}
import graft.synth.DataGen
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

/** The streaming SOURCE: readStream.format("qtable") follows the
  * commit log — appends arrive exactly once across checkpointed
  * restarts, row-preserving maintenance emits nothing, row-changing
  * commits fail unless skipped explicitly. */
class QTableStreamSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def batch(n: Long, seed: Long, tag: String) =
    DataGen.generate(spark, n, seed, 4).toDF()
      .withColumn("image_id", concat(lit(tag + "-"), col("image_id")))

  /** Drain the source into a checkpointed parquet FILE sink (the memory
    * sink cannot recover from a checkpoint) until idle; returns the
    * TOTAL rows landed in `out` so far — callers assert on deltas. */
  private def drain(path: String, ckpt: String, out: String,
      options: Map[String, String] = Map.empty): Long = {
    var reader = spark.readStream.format("qtable")
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load(path).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    try { q.processAllAvailable() } finally q.stop()
    spark.read.parquet(out).count()
  }

  test("appends stream exactly once across checkpointed restarts") {
    val root = TestSpark.tmpDir("ssrc")
    val ckpt = TestSpark.tmpDir("ssrc-ckpt")
    val out = TestSpark.tmpDir("ssrc-out")
    val t = QTable.create(root, spark, buckets = 2)
    AppendJob.append(t, batch(60, 1L, "a"), filesPerBucket = 2)
    AppendJob.append(t, batch(40, 2L, "b"), filesPerBucket = 1)

    assert(drain(root, ckpt, out) == 100L)

    // a row-preserving rewrite emits NOTHING (unlike Delta's re-emit)
    new CompactJob(t, targetFileBytes = 8L << 20).run()
    assert(drain(root, ckpt, out) == 100L,
      "compact must not re-emit rows")

    // a third append after restart arrives alone (exactly once)
    AppendJob.append(t, batch(25, 3L, "c"), filesPerBucket = 1)
    assert(drain(root, ckpt, out) == 125L)
  }

  test("branch option follows the branch chain; main commits never leak in") {
    val root = TestSpark.tmpDir("ssrc-br")
    val ckpt = TestSpark.tmpDir("ssrc-br-ckpt")
    val out = TestSpark.tmpDir("ssrc-br-out")
    val t = QTable.create(root, spark, buckets = 2)
    AppendJob.append(t, batch(50, 1L, "base"), filesPerBucket = 1)
    graft.format.Branches.create(t, "feed")
    val dev = t.onBranch("feed")
    AppendJob.append(dev, batch(20, 2L, "dev"), filesPerBucket = 1)
    // interleave a MAIN append: its rows must never reach the branch
    // stream (the batch walk is the ref's parent chain, not the global
    // version range)
    AppendJob.append(t, batch(30, 3L, "mn"), filesPerBucket = 1)
    AppendJob.append(dev, batch(10, 4L, "dev2"), filesPerBucket = 1)

    val opts = Map("branch" -> "feed")
    assert(drain(root, ckpt, out, opts) == 80L) // 50 base + 20 + 10
    val got = spark.read.parquet(out)
    assert(got.where(col("image_id").startsWith("mn-")).count() == 0,
      "a main append leaked into the branch stream")

    // further branch appends arrive exactly once on the same checkpoint
    AppendJob.append(dev, batch(5, 5L, "dev3"), filesPerBucket = 1)
    assert(drain(root, ckpt, out, opts) == 85L)
  }

  test("row-changing commits fail the stream unless skipped") {
    val root = TestSpark.tmpDir("ssrc2")
    val ckpt = TestSpark.tmpDir("ssrc2-ckpt")
    val out = TestSpark.tmpDir("ssrc2-out")
    val t = QTable.create(root, spark, buckets = 2)
    AppendJob.append(t, batch(50, 5L, "a"), filesPerBucket = 1)
    assert(drain(root, ckpt, out) == 50L)

    new DeleteJob(t).run(col("image_id").startsWith("a-img0000000000"))
    val ex = intercept[StreamingQueryException] {
      drain(root, ckpt, out)
    }
    assert(ex.getMessage.contains("skip-change-commits") ||
      Option(ex.getCause).exists(_.getMessage.contains("skip-change-commits")))

    // skipping: the delete's changes are not emitted; later appends are
    AppendJob.append(t, batch(20, 6L, "z"), filesPerBucket = 1)
    assert(drain(root, ckpt, out,
      Map("skip-change-commits" -> "true")) == 70L)
  }

  test("with-commit-ts: watermarked windowed aggregation over the feed") {
    val root = TestSpark.tmpDir("ssrc-win")
    val ckpt = TestSpark.tmpDir("ssrc-win-ckpt")
    val t = QTable.create(root, spark, buckets = 2)
    AppendJob.append(t, batch(40, 1L, "w1"), 1)
    val tsV1 = t.currentSnapshot.timestampMs

    // event time = commit wall-clock, watermark 0s, 1s tumbling windows,
    // APPEND output mode: a window only emits once the watermark (max
    // seen _commit_ts) passes its end — the full late-data contract
    val q = spark.readStream.format("qtable")
      .option("with-commit-ts", "true").load(root)
      .withWatermark("_commit_ts", "0 seconds")
      .groupBy(window(col("_commit_ts"), "1 second"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      // watermark has not passed the first window's end yet: nothing emits
      assert(spark.table("win_counts").count() == 0)

      // a second append >2s later closes the first window
      Thread.sleep(2200)
      AppendJob.append(t, batch(15, 2L, "w2"), 1)
      q.processAllAvailable()
      // one more tick lets the state store flush windows closed by the
      // previous batch's watermark advance
      AppendJob.append(t, batch(1, 3L, "w3"), 1)
      q.processAllAvailable()

      val rows = spark.table("win_counts").collect()
      assert(rows.nonEmpty, "the first window must have emitted")
      val first = rows.minBy(_.getTimestamp(0).getTime)
      assert(first.getLong(1) == 40,
        s"first closed window must hold exactly batch 1's rows, got $first")
      // the emitted window contains v1's commit timestamp
      val ws = first.getTimestamp(0).getTime
      assert(ws <= tsV1 && tsV1 < ws + 1000)
    } finally { q.stop(); spark.catalog.dropTempView("win_counts") }
  }

  test("renamed tables are refused with a pointer to the library API") {
    val root = TestSpark.tmpDir("ssrc3")
    val t = QTable.create(root, spark, buckets = 2)
    t.addColumn("alt", "string")
    t.renameColumn("alt", "alt2")
    val ex = intercept[Exception] {
      spark.readStream.format("qtable").load(root)
    }
    assert(ex.getMessage.contains("renamed"))
  }
}
