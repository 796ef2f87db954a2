package graft.format

import graft.TestSpark
import graft.jobs.{AppendJob, ClusterJob, CompactJob}
import graft.synth.DataGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Catalyst-integrated data-skipping path: filters pushed into the
  * scan prune files via manifest min/max stats, with NO manual planFiles
  * call — and the answers match the plain full-scan read exactly. */
class FileIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def clusteredTable(n: Long): QTable = {
    val t = QTable.create(TestSpark.tmpDir("qfi"), spark, buckets = 4)
    AppendJob.append(t, DataGen.generate(spark, n, 42L, 8).toDF(), filesPerBucket = 4)
    new CompactJob(t, targetFileBytes = 256L << 10).run()
    // cluster so per-file phash ranges are narrow => skipping has teeth
    new ClusterJob(t, targetFileBytes = 120L << 10, minGroupBytes = 1L).run()
    t
  }

  test("phash range filter skips files inside the scan") {
    val t = clusteredTable(1500)
    val (df, index) = t.readIndexed()
    val total = t.entries(t.currentSnapshot).size
    assert(total >= 8, s"need several files for a meaningful test, got $total")

    // pick a range that covers ~1/4 of the phash space
    val lo = Long.MinValue / 2
    val hi = 0L
    val expected = t.read().where(col("phash").between(lo, hi))
      .select("image_id").collect().map(_.getString(0)).sorted
    val got = df.where(col("phash").between(lo, hi))
      .select("image_id").collect().map(_.getString(0)).sorted
    assert(got.sameElements(expected), "indexed read must match plain read")

    val (selected, all) = index.lastSelection
    assert(all == total)
    assert(selected < all,
      s"scan read $selected/$all files — stats skipping did nothing")
  }

  test("pbucket equality prunes to one bucket's files") {
    val t = clusteredTable(1000)
    val (df, index) = t.readIndexed()
    val n = df.where(col("pbucket") === 2).count()
    assert(n == t.read().where(col("pbucket") === 2).count())
    val (selected, all) = index.lastSelection
    assert(selected < all, s"bucket filter not skipping: $selected/$all")
  }

  test("image_id point lookup touches a small file subset") {
    val t = clusteredTable(1000)
    val (df, index) = t.readIndexed()
    val got = df.where(col("image_id") === "img000000000042").count()
    assert(got == 1L)
    val (selected, all) = index.lastSelection
    assert(selected < all)
  }

  test("prefix predicate (LIKE 'P%' / startsWith) prunes by id range") {
    // two appends with disjoint id prefixes: the aa- scan must not open
    // the zz- files (the optimizer rewrites prefix-LIKE to StartsWith,
    // which prunes on the [P, succ(P)) window against id min/max)
    val t = QTable.create(TestSpark.tmpDir("qfi-prefix"), spark, buckets = 2)
    def batch(seed: Long, tag: String) =
      DataGen.generate(spark, 300, seed, 4).toDF()
        .withColumn("image_id", concat(lit(tag + "-"), col("image_id")))
    AppendJob.append(t, batch(1L, "aa"), filesPerBucket = 2)
    AppendJob.append(t, batch(2L, "zz"), filesPerBucket = 2)
    val (df, index) = t.readIndexed()
    assert(df.where(col("image_id").like("aa-%")).count() == 300L)
    val (selected, all) = index.lastSelection
    assert(all == 8 && selected == 4,
      s"prefix filter must open only the aa- files: $selected/$all")
    // matches the plain read exactly
    assert(df.where(col("image_id").startsWith("zz-")).count() ==
      t.read().where(col("image_id").startsWith("zz-")).count())
  }

  test("null-count pruning: IS NULL skips null-free files and vice versa") {
    val t = QTable.create(TestSpark.tmpDir("qfi-null"), spark, buckets = 2)
    t.addColumn("note", "string")
    // one append all-null notes, one all-set: IS NULL must open only the
    // first append's files, IS NOT NULL only the second's
    AppendJob.append(t, DataGen.generate(spark, 200, 3L, 4).toDF()
      .withColumn("note", lit(null).cast("string")), filesPerBucket = 2)
    AppendJob.append(t, DataGen.generate(spark, 200, 4L, 4).toDF()
      .withColumn("image_id", concat(lit("b-"), col("image_id")))
      .withColumn("note", lit("set")), filesPerBucket = 2)
    val (df, index) = t.readIndexed()
    assert(df.where(col("note").isNull).count() == 200L)
    val (s1, a1) = index.lastSelection
    assert(a1 == 8 && s1 == 4, s"IS NULL must skip null-free files: $s1/$a1")
    assert(df.where(col("note").isNotNull).count() == 200L)
    val (s2, a2) = index.lastSelection
    assert(s2 == 4, s"IS NOT NULL must skip all-null files: $s2/$a2")
  }

  test("unsupported predicates fall back to keeping every file (sound)") {
    val t = clusteredTable(600)
    val (df, index) = t.readIndexed()
    val n = df.where(length(col("caption")) > 20).count()
    assert(n == t.read().where(length(col("caption")) > 20).count())
    val (selected, all) = index.lastSelection
    assert(selected == all, "unknown predicate shapes must never skip")
  }

  test("schema-evolved column: generic colStats prune files, renamed reads stay skipped") {
    // stats generalize past the three dedicated key columns: an added
    // (then renamed) long column's per-file min/max land in colStats under
    // its physical name and the pushed filter prunes on them
    val t = QTable.create(TestSpark.tmpDir("qfi-evo"), spark, buckets = 2)
    t.addColumn("score", "long")
    def batch(seed: Long, n: Long, tag: String, scoreBase: Long) =
      DataGen.generate(spark, n, seed).toDF()
        .withColumn("image_id", concat(lit(tag + "-"), col("image_id")))
        .withColumn("score",
          lit(scoreBase) + pmod(xxhash64(col("image_id")), lit(100L)))
    AppendJob.append(t, batch(1L, 200, "a", 0L), filesPerBucket = 2)     // scores 0-99
    AppendJob.append(t, batch(2L, 200, "b", 1000L), filesPerBucket = 2)  // scores 1000-1099
    t.renameColumn("score", "quality")

    val (df, index) = t.readIndexed()
    val expected = t.read().where(col("quality") > 500).count()
    val got = df.where(col("quality") > 500).count()
    assert(got == expected && got == 200L)
    val (selected, all) = index.lastSelection
    assert(selected < all, s"evolved-column stats not skipping: $selected/$all")

    // old files (written before the column existed) have no stats for it
    // and are conservatively kept — never unsoundly pruned
    val none = df.where(col("quality") < 0).count()
    assert(none == 0L)
  }
}
