package graft.streaming

import graft.TestSpark
import graft.format.QTable
import graft.jobs.{AppendJob, CompactJob}
import graft.synth.DataGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming merge-on-read upsert: each micro-batch is a transactional
  * MOR MERGE with batch-id exactly-once, multi-event keys resolved
  * last-wins by an event-sequence column, and the accumulating delete
  * debt foldable by concurrent maintenance. */
class StreamingUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshTable(n: Long): QTable = {
    val t = QTable.create(TestSpark.tmpDir("upsert"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, n, 42L, 4).toDF(), filesPerBucket = 2)
    t
  }

  /** A correction batch: new captions for ids ending in `suffix`, plus
    * optional delete markers and a fresh insert. */
  private def batch(t: QTable, suffix: String, tag: String,
      deleteSuffix: Option[String] = None) = {
    val base = t.read().drop("pbucket") // derived; merge recomputes it
    val upd = base.where(col("image_id").endsWith(suffix))
      .withColumn("caption", concat(lit(tag + ": "), col("image_id")))
      .withColumn("is_delete", lit(false))
    val del = deleteSuffix.map(s =>
      base.where(col("image_id").endsWith(s))
        .withColumn("is_delete", lit(true))).toSeq
    val ins = DataGen.generate(spark, 1, suffix.hashCode.toLong, 1).toDF()
      .withColumn("image_id", concat(lit(s"zzz-$tag-"), col("image_id")))
      .withColumn("is_delete", lit(false))
    (Seq(upd) ++ del :+ ins).reduce(_ unionByName _)
  }

  test("micro-batch upserts apply updates/deletes/inserts with O(batch) commits") {
    val t = freshTable(300)
    val up = new StreamingUpsert(t, "up-spec", deleteCol = Some("is_delete"))

    up.sink(batch(t, "1", "b0", deleteSuffix = Some("2")), 0L)
    val s0 = t.currentSnapshot
    assert(s0.operation == "merge")
    assert(s0.summary("strategy") == "merge-on-read")
    // 300 - 30 deleted + 1 insert
    assert(t.read().count() == 271)
    assert(t.read().where(col("caption").startsWith("b0: ")).count() == 30)
    assert(t.read().where(col("image_id").endsWith("2")).count() == 0,
      "delete-flagged keys must be gone")

    // second batch updates SOME of the same keys again (new positions)
    up.sink(batch(t, "1", "b1"), 1L)
    assert(t.read().where(col("caption").startsWith("b1: ")).count() == 30)
    assert(t.read().where(col("caption").startsWith("b0: ")).count() == 0)
    assert(t.read().count() == 272)

    // replay of batch 1 is a no-op (exactly-once across crash replay)
    val v = t.currentVersion
    up.sink(batch(t, "1", "b1-replayed"), 1L)
    assert(t.currentVersion == v)
    assert(t.read().where(col("caption").startsWith("b1-replayed")).count() == 0)

    // maintenance folds the stream's accumulated position deletes
    val sC = new CompactJob(t, targetFileBytes = 8L << 20).run()
    assert(sC.deleteFiles.isEmpty)
    assert(t.read().count() == 272)
    assert(t.read().where(col("caption").startsWith("b1: ")).count() == 30)
  }

  test("multi-event keys resolve last-wins by seqCol; without it they are rejected") {
    val t = freshTable(200)
    val base = t.read()
    // two CDC events for every id ending in 3: seq 1 then seq 2
    def ev(seq: Int) = base.where(col("image_id").endsWith("3"))
      .withColumn("caption", concat(lit(s"v$seq: "), col("image_id")))
      .withColumn("_seq", lit(seq))
    val multi = ev(1).unionByName(ev(2))

    val strict = new StreamingUpsert(t, "strict-spec")
    intercept[IllegalArgumentException] { strict.sink(multi, 0L) }

    val up = new StreamingUpsert(t, "seq-spec", seqCol = Some("_seq"))
    up.sink(multi, 0L)
    assert(t.read().where(col("caption").startsWith("v2: ")).count() == 20)
    assert(t.read().where(col("caption").startsWith("v1: ")).count() == 0)
    assert(t.read().count() == 200)
  }
}
