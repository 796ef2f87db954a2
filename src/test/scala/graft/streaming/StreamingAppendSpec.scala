package graft.streaming

import graft.TestSpark
import graft.format.QTable
import graft.jobs.CompactJob
import graft.model.ImageRow
import graft.synth.DataGen
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingestion: micro-batches land as append snapshots with
  * exactly-once batch-id dedup, and the streamed table keeps every
  * lakehouse property (time travel, incremental scan, maintenance). */
class StreamingAppendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(n: Int, seed: Long, tag: String): Seq[ImageRow] = {
    import org.apache.spark.sql.functions._
    DataGen.generate(spark, n, seed)
      .withColumn("image_id", concat(lit(tag + "-"), col("image_id")))
      .as[ImageRow](org.apache.spark.sql.Encoders.product[ImageRow])
      .collect().toSeq
  }

  test("micro-batches append as snapshots; stream survives a concurrent compact") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val t = QTable.create(TestSpark.tmpDir("stream"), spark, buckets = 2)
    val src = MemoryStream[ImageRow]
    val ingest = new StreamingAppend(t, "ingest-spec")
    val q = ingest.start(src.toDF(), TestSpark.tmpDir("stream-ckpt"))
    try {
      src.addData(rows(60, 42L, "s1"): _*)
      q.processAllAvailable()
      assert(t.read().count() == 60)
      val v1 = t.currentVersion

      // maintenance runs UNDER the live stream (optimistic concurrency)
      new CompactJob(t, targetFileBytes = 8L << 20).run()

      src.addData(rows(40, 7L, "s2"): _*)
      q.processAllAvailable()
      assert(t.read().count() == 100)

      // streamed batches are ordinary appends: time travel + CDC hold
      assert(t.read(t.snapshotAt(v1)).count() == 60)
      val ops = t.listVersions.map(v => t.snapshotAt(v).operation)
      assert(ops.count(_ == "append") == 2 && ops.contains("compact"))
    } finally q.stop()
  }

  test("replayed batch id is skipped: idempotent across sink re-invocation") {
    val t = QTable.create(TestSpark.tmpDir("stream-replay"), spark, buckets = 2)
    val ingest = new StreamingAppend(t, "replay-spec")
    val batch = DataGen.generate(spark, 30, 42L, 1).toDF()

    ingest.sink(batch, 0L)
    val v = t.currentVersion
    assert(t.read().count() == 30)
    // crash-between-append-and-checkpoint => Spark re-runs batch 0
    ingest.sink(batch, 0L)
    assert(t.currentVersion == v, "replayed batch must not commit again")
    assert(t.read().count() == 30)
    // the NEXT batch id commits normally
    ingest.sink(DataGen.generate(spark, 10, 7L, 1).toDF()
      .withColumn("image_id", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("n-"),
        org.apache.spark.sql.functions.col("image_id"))), 1L)
    assert(t.read().count() == 40)
    // empty batches commit nothing (no version churn)
    ingest.sink(batch.limit(0), 2L)
    assert(t.currentVersion == v + 1)
  }
}
