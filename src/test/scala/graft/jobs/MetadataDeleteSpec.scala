package graft.jobs

import graft.TestSpark
import graft.format.QTable
import graft.synth.DataGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The metadata-level DELETE fast path: files whose stats prove every
  * row matches are dropped from the manifests with zero delete rows and
  * zero data reads; everything the proof cannot cover falls through to
  * position deletes. Soundness traps each get a test: mixed files,
  * nullable columns (three-valued logic), prior position deletes,
  * CDC visibility. */
class MetadataDeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** batch with every row's fmt forced to `fmt` and ids prefixed. */
  private def batch(n: Long, seed: Long, prefix: String, fmt: String) =
    DataGen.generate(spark, n, seed, 4).toDF()
      .withColumn("image_id", concat(lit(prefix + "-"), col("image_id")))
      .withColumn("fmt", lit(fmt))

  test("whole-file match drops entries: no delete rows, no data reads") {
    val t = QTable.create(TestSpark.tmpDir("mdel"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 300, 42L, 4).toDF(),
      filesPerBucket = 2)
    val keepFiles = t.entries(t.currentSnapshot).size
    AppendJob.append(t, batch(200, 7L, "b2", "bmp"), filesPerBucket = 2)
    val allFiles = t.entries(t.currentSnapshot).size

    val snap = new DeleteJob(t).run(col("fmt") === "bmp")
    assert(snap.summary("files-dropped").toInt == allFiles - keepFiles)
    assert(snap.summary("rows-dropped-with-files").toLong == 200L)
    assert(snap.summary("deleted-rows").toLong == 200L)
    assert(snap.summary("new-delete-files").toInt == 0)
    // the kept files' fmt stats (jpeg..png) exclude 'bmp': the position
    // scan must open ZERO files — the whole DELETE was metadata work
    assert(snap.summary("files-scanned").toInt == 0)
    assert(snap.deleteFiles.isEmpty)
    assert(t.entries(snap).size == keepFiles)
    assert(t.read().count() == 300L)
    assert(t.read().where(col("fmt") === "bmp").count() == 0L)
  }

  test("mixed files fall through to position deletes, never dropped") {
    val t = QTable.create(TestSpark.tmpDir("mdel-mix"), spark, buckets = 2)
    // the mix key must NOT be xxhash64(image_id) % k: pbucket is
    // xxhash64(image_id) % buckets, so that would make per-BUCKET
    // uniform fmt values — and the engine would (correctly!) drop
    // whole files. Salt the hash to de-correlate from bucketing.
    val mixed = DataGen.generate(spark, 300, 21L, 4).toDF()
      .withColumn("fmt",
        when(pmod(xxhash64(concat(col("image_id"), lit("salt"))), lit(2)) === 0,
          lit("bmp")).otherwise(lit("png")))
    AppendJob.append(t, mixed, filesPerBucket = 2)
    val bmp = t.read().where(col("fmt") === "bmp").count()
    assert(bmp > 0)

    val snap = new DeleteJob(t).run(col("fmt") === "bmp")
    assert(snap.summary("files-dropped").toInt == 0)
    assert(snap.summary("deleted-rows").toLong == bmp)
    assert(snap.deleteFiles.nonEmpty)
    assert(t.read().count() == 300L - bmp)
  }

  test("a null row blocks the whole-file proof (three-valued logic)") {
    val t = QTable.create(TestSpark.tmpDir("mdel-null"), spark, buckets = 2)
    t.addColumn("note", "string")
    // every NON-NULL note satisfies note >= '' — but null rows do not
    // match a WHERE, so a file with one null must never be dropped
    // salted hash so nulls land in EVERY file (un-salted xxhash64 %
    // correlates with the pbucket function — see the mixed-file test)
    val rows = DataGen.generate(spark, 200, 33L, 4).toDF()
      .withColumn("note",
        when(pmod(xxhash64(concat(col("image_id"), lit("ns"))), lit(4)) === 0,
          lit(null).cast("string"))
          .otherwise(concat(lit("note "), col("image_id"))))
    AppendJob.append(t, rows, filesPerBucket = 2)
    val nulls = t.read().where(col("note").isNull).count()
    assert(nulls > 0)

    val snap = new DeleteJob(t).run(col("note") >= "")
    assert(snap.summary("files-dropped").toInt == 0,
      "files holding null notes must not be dropped wholesale")
    assert(t.read().count() == nulls)
    assert(t.read().where(col("note").isNotNull).count() == 0L)

    // the dual: an all-non-null batch with the same predicate DOES drop
    val t2 = QTable.create(TestSpark.tmpDir("mdel-null2"), spark, buckets = 2)
    t2.addColumn("note", "string")
    AppendJob.append(t2, DataGen.generate(spark, 100, 34L, 4).toDF()
      .withColumn("note", concat(lit("n"), col("image_id"))),
      filesPerBucket = 1)
    val s2 = new DeleteJob(t2).run(col("note") >= "")
    assert(s2.summary("files-dropped").toInt >= 1)
    assert(t2.read().count() == 0L)
  }

  test("prior position deletes: counts stay exact, dead entries fold away") {
    val t = QTable.create(TestSpark.tmpDir("mdel-prior"), spark, buckets = 1)
    AppendJob.append(t, batch(120, 55L, "p", "bmp"), filesPerBucket = 1)
    val someId = t.read().agg(min("image_id")).collect().head.getString(0)
    new DeleteJob(t).run(col("image_id") === someId)
    assert(t.currentSnapshot.deleteFiles.nonEmpty)

    val snap = new DeleteJob(t).run(col("fmt") === "bmp")
    assert(snap.summary("files-dropped").toInt >= 1)
    // one row was already dead — it must not be double-counted
    assert(snap.summary("deleted-rows").toLong == 119L)
    assert(snap.deleteFiles.isEmpty,
      "delete entries referencing only dropped files must fold away")
    assert(t.read().count() == 0L)
  }

  test("prefix predicates (LIKE 'P%', startsWith) drop whole files") {
    val t = QTable.create(TestSpark.tmpDir("mdel-prefix"), spark, buckets = 2)
    AppendJob.append(t, batch(150, 71L, "aa", "png"), filesPerBucket = 2)
    AppendJob.append(t, batch(150, 72L, "zz", "png"), filesPerBucket = 2)
    val s1 = new DeleteJob(t).run(expr("image_id LIKE 'zz-%'"))
    assert(s1.summary("files-dropped").toInt == 4)
    assert(s1.summary("new-delete-files").toInt == 0)
    assert(s1.summary("files-scanned").toInt == 0,
      "aa- files must be pruned by the prefix window, not scanned")
    assert(t.read().count() == 150L)
    // LIKE with inner wildcards must NOT be proven (falls to row scan)
    val s2 = new DeleteJob(t).run(expr("image_id LIKE 'aa-%7'"))
    assert(s2.summary("files-dropped").toInt == 0)
    assert(t.read().count() == 150L - 15L)
  }

  test("ranges, untouched-manifest reuse, and CDC visibility") {
    val t = QTable.create(TestSpark.tmpDir("mdel-range"), spark, buckets = 2)
    AppendJob.append(t, batch(150, 61L, "aa", "png"), filesPerBucket = 2)
    AppendJob.append(t, batch(150, 62L, "zz", "png"), filesPerBucket = 2)
    val v0 = t.currentSnapshot.version
    val preManifests = t.currentSnapshot.manifests.map(_.path).toSet

    // id-range DELETE: the zz- files' id ranges sit wholly above "zz-"
    val snap = new DeleteJob(t).run(col("image_id") >= "zz-")
    assert(snap.summary("files-dropped").toInt > 0)
    assert(snap.summary("new-delete-files").toInt == 0)
    assert(t.read().count() == 150L)
    // appends chunk manifests per commit: the aa-append's manifests are
    // untouched by the drops and must carry by reference
    assert(snap.manifests.map(_.path).toSet.intersect(preManifests).nonEmpty,
      "manifests with no dropped entries must be reused, not rewritten")

    // CDC: the metadata-dropped rows surface as ordinary delete changes
    val ch = t.readChanges(v0, snap.version)
    assert(ch.where(col("_change_type") === "delete").count() == 150L)
    assert(ch.count() == 150L)
  }
}
