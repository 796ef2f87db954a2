package graft.jobs

import graft.TestSpark
import graft.format.QTable
import graft.synth.DataGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** StatsAggregate must be EXACT in every planner mode: pure-metadata on
  * a freshly maintained table, and hybrid (scan-fallback) whenever the
  * recorded stats cannot answer — missing column stats, truncated string
  * stats, live position deletes. The oracle in every test is the same
  * aggregate computed by a full scan. */
class StatsAggregateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val cols = Seq("image_id", "w", "h", "fmt", "phash")

  private def scanAgg(t: QTable, cs: Seq[String]): Seq[Any] = {
    val aggs = count(lit(1)).cast("long").as("count_star") +:
      cs.flatMap(c => Seq(count(col(c)).cast("long"), min(col(c)), max(col(c))))
    t.read().agg(aggs.head, aggs.tail: _*).collect().head.toSeq
  }

  private def metaAgg(t: QTable, cs: Seq[String]): (Seq[Any], StatsAggregate.Result) = {
    val r = StatsAggregate.run(t, t.currentSnapshot, cs)
    (r.df.collect().head.toSeq, r)
  }

  test("compacted table answers from metadata only, exactly") {
    val t = QTable.create(TestSpark.tmpDir("agg-meta"), spark, buckets = 4)
    AppendJob.append(t, DataGen.generate(spark, 1500, 42L, 4).toDF(),
      filesPerBucket = 3)
    new CompactJob(t, targetFileBytes = 8L << 20).run()
    val (got, r) = metaAgg(t, cols)
    assert(r.filesScanned == 0,
      s"fresh stats must answer without scanning, scanned ${r.filesScanned}")
    assert(r.filesFromStats == r.filesTotal && r.filesTotal > 0)
    assert(got == scanAgg(t, cols))
  }

  test("a column added after old files were written falls back for them only") {
    val t = QTable.create(TestSpark.tmpDir("agg-add"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 400, 7L, 4).toDF(),
      filesPerBucket = 2)
    val before = t.entries(t.currentSnapshot).size
    t.addColumn("views", "int")
    val batch2 = DataGen.generate(spark, 200, 8L, 4).toDF()
      .withColumn("image_id", concat(lit("b2-"), col("image_id")))
      .withColumn("views", (pmod(xxhash64(col("image_id")), lit(1000))).cast("int"))
    AppendJob.append(t, batch2, filesPerBucket = 2)
    val (got, r) = metaAgg(t, Seq("views"))
    assert(r.filesScanned == before,
      s"exactly the pre-evolution files lack views stats: " +
        s"expected $before scanned, got ${r.filesScanned}")
    assert(r.filesFromStats == r.filesTotal - before)
    assert(got == scanAgg(t, Seq("views")))
  }

  test("truncated string stats (captions past the 64-char bound) force a scan") {
    val t = QTable.create(TestSpark.tmpDir("agg-trunc"), spark, buckets = 2)
    val long = DataGen.generate(spark, 300, 9L, 4).toDF()
      .withColumn("caption",
        concat(col("caption"), lit(" " + "pad" * 40)))
    AppendJob.append(t, long, filesPerBucket = 2)
    val (got, r) = metaAgg(t, Seq("caption"))
    assert(r.filesScanned == r.filesTotal,
      "every file's caption stats are truncated bounds; all must scan")
    assert(got == scanAgg(t, Seq("caption")))
    // and the hybrid keeps untruncated columns on the metadata side
    val (got2, r2) = metaAgg(t, Seq("fmt"))
    assert(r2.filesScanned == 0)
    assert(got2 == scanAgg(t, Seq("fmt")))
  }

  test("live position deletes scan exactly the touched files, result exact") {
    val t = QTable.create(TestSpark.tmpDir("agg-mor"), spark, buckets = 4)
    AppendJob.append(t, DataGen.generate(spark, 800, 11L, 4).toDF(),
      filesPerBucket = 2)
    new CompactJob(t, targetFileBytes = 8L << 20).run()
    // delete the row carrying the MAX image_id: a stats-only answer
    // would report the stale max — the hybrid must not
    val maxId = t.read().agg(max("image_id")).collect().head.getString(0)
    new DeleteJob(t).run(col("image_id") === maxId)
    val (got, r) = metaAgg(t, cols)
    val touched = t.deletePairs(t.currentSnapshot).map(_._2).toSet.size
    assert(touched >= 1 && r.filesScanned == touched,
      s"scan set must be the delete-touched files: $touched vs ${r.filesScanned}")
    assert(r.filesScanned < r.filesTotal, "untouched files stay metadata-side")
    assert(got == scanAgg(t, cols))
    assert(got.head == 799L)
    // (count_star, image_id_count, image_id_min, image_id_max, ...)
    assert(got(3) != maxId, "stale stats max must not surface")

    // folding the deletes away restores the pure-metadata path
    new CompactJob(t, targetFileBytes = 8L << 20).run()
    val (got3, r3) = metaAgg(t, cols)
    assert(r3.filesScanned == 0 && got3 == scanAgg(t, cols))
  }

  test("widened column keeps metadata answers; float/double always scan") {
    val t = QTable.create(TestSpark.tmpDir("agg-widen"), spark, buckets = 2)
    t.addColumn("views", "int")
    AppendJob.append(t, DataGen.generate(spark, 200, 13L, 4).toDF()
      .withColumn("views", (pmod(xxhash64(col("image_id")), lit(900))).cast("int")),
      filesPerBucket = 1)
    t.widenColumn("views", "long")
    val (got, r) = metaAgg(t, Seq("views"))
    assert(r.filesScanned == 0, "int-written files answer a long column from stats")
    assert(got == scanAgg(t, Seq("views")))
    assert(got(1).isInstanceOf[Long])

    t.addColumn("score", "double")
    val b2 = DataGen.generate(spark, 100, 14L, 4).toDF()
      .withColumn("image_id", concat(lit("d2-"), col("image_id")))
      .withColumn("score", rand(5) * 10.0)
    AppendJob.append(t, b2, filesPerBucket = 1)
    val (got2, r2) = metaAgg(t, Seq("score"))
    assert(r2.filesScanned == r2.filesTotal,
      "NaN-blind parquet double stats must never answer exactly")
    assert(got2 == scanAgg(t, Seq("score")))
  }

  test("all-null column files answer from the null count alone, no scan") {
    val t = QTable.create(TestSpark.tmpDir("agg-allnull"), spark, buckets = 2)
    t.addColumn("note", "string")
    AppendJob.append(t, DataGen.generate(spark, 120, 17L, 4).toDF()
      .withColumn("note", lit(null).cast("string")), filesPerBucket = 1)
    val (got, r) = metaAgg(t, Seq("note"))
    assert(r.filesScanned == 0,
      "a column that is provably all-null (nulls == rows) needs no scan")
    assert(got == Seq(120L, 0L, null, null))
    assert(got == scanAgg(t, Seq("note")))
  }

  test("count-only and empty table edges") {
    val t = QTable.create(TestSpark.tmpDir("agg-empty"), spark, buckets = 2)
    val (got0, r0) = metaAgg(t, Seq("w"))
    assert(r0.filesTotal == 0 && got0 == Seq(0L, 0L, null, null))
    AppendJob.append(t, DataGen.generate(spark, 50, 15L, 4).toDF(),
      filesPerBucket = 1)
    val (got1, r1) = metaAgg(t, Nil)
    assert(r1.filesScanned == 0 && got1 == Seq(50L))
    assertThrows[IllegalArgumentException](
      StatsAggregate.run(t, t.currentSnapshot, Seq("nope")))
    assertThrows[IllegalArgumentException](
      StatsAggregate.run(t, t.currentSnapshot, Seq("bytes")))
  }
}
