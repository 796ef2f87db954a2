package graft.format

import graft.TestSpark
import graft.jobs.{AppendJob, CompactJob, MergeJob}
import graft.synth.DataGen
import graft.verify.ScanEquivalence
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only schema evolution: addColumn commits a new snapshot that
  * reuses every manifest; old data files surface nulls for the new field;
  * writers align their output to the evolved schema; maintenance jobs
  * keep working across the evolution boundary. */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("append -> addColumn -> append: unified schema, old rows null") {
    val t = QTable.create(TestSpark.tmpDir("evo"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 100, 42L, 2).toDF(), 2) // v1
    val filesBefore = t.entries(t.currentSnapshot).map(_.path).toSet

    val evo = t.addColumn("alt_text", "string") // v2, metadata-only
    assert(evo.operation == "add-column")
    assert(t.entries(evo).map(_.path).toSet == filesBefore,
      "addColumn must not touch data files")
    assert(evo.schemaFields.map(_.name).contains("alt_text"))
    // field id allocated past all base ids
    assert(evo.schemaFields.find(_.name == "alt_text").get.id ==
      graft.model.FieldDef.defaults.map(_.id).max + 1)

    // old rows read back with nulls for the new column
    val afterEvo = t.read()
    assert(afterEvo.columns.contains("alt_text"))
    assert(afterEvo.where(col("alt_text").isNotNull).count() == 0)

    // an append carrying the new column lands typed values
    val newRows = DataGen.generate(spark, 20, 99L, 1).toDF()
      .withColumn("image_id", concat(lit("new-"), col("image_id")))
      .withColumn("alt_text", concat(lit("alt for "), col("image_id")))
    AppendJob.append(t, newRows, 1) // v3
    val unified = t.read()
    assert(unified.count() == 120)
    assert(unified.where(col("alt_text").isNotNull).count() == 20)
    assert(unified.where(col("alt_text").isNull).count() == 100)
  }

  test("maintenance jobs are green across the evolution boundary") {
    val t = QTable.create(TestSpark.tmpDir("evo2"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 200, 42L, 4).toDF(), 4)
    t.addColumn("alt_text", "string")
    AppendJob.append(t,
      DataGen.generate(spark, 30, 7L, 1).toDF()
        .withColumn("image_id", concat(lit("new-"), col("image_id")))
        .withColumn("alt_text", lit("present")), 2)
    val pre = t.read()

    // compact rewrites small files across old+new; evolved column survives
    val c = new CompactJob(t, targetFileBytes = 8L << 20).run()
    val (okC, badC) = ScanEquivalence.check(pre, t.read(c))
    assert(okC, s"$badC violations after compacting an evolved table")
    val post = t.read(c)
    assert(post.where(col("alt_text") === "present").count() == 30)
    assert(post.where(col("alt_text").isNull).count() == 200)

    // a MERGE whose source predates the evolution (no alt_text column):
    // updates keep the stored alt_text, inserts land with nulls
    val corr = DataGen.correctionsDF(spark, 200, 42L, inserts = 2)
    assert(!corr.columns.contains("alt_text"))
    val m = new MergeJob(t).run(corr)
    val (okM, badM) = ScanEquivalence.checkMerged(pre, t.read(m), corr)
    assert(okM, s"$badM violations after merging into an evolved table")
    assert(t.read(m).count() == 232)
    assert(t.read(m).where(col("alt_text") === "present").count() == 30,
      "rewrite must not drop evolved-column values")
  }

  test("duplicate or invalid column is rejected") {
    val t = QTable.create(TestSpark.tmpDir("evo3"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 10, 42L, 1).toDF(), 1)
    intercept[IllegalArgumentException] { t.addColumn("caption", "string") }
    intercept[Exception] { t.addColumn("x", "not-a-type") }
  }

  test("rename-column is metadata-only: old and new files resolve under the new name") {
    val t = QTable.create(TestSpark.tmpDir("evo-ren"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 40, 42L, 2).toDF(), 1)      // v1
    t.addColumn("alt_text", "string")                                       // v2
    AppendJob.append(t,
      DataGen.generate(spark, 10, 7L, 1).toDF()
        .withColumn("image_id", concat(lit("n-"), col("image_id")))
        .withColumn("alt_text", lit("before-rename")), 1)                   // v3
    val filesBefore = t.entries(t.currentSnapshot).map(_.path).toSet

    val ren = t.renameColumn("alt_text", "alt")                             // v4
    assert(ren.operation == "rename-column")
    assert(t.entries(ren).map(_.path).toSet == filesBefore,
      "rename must not touch data files")
    val after = t.read()
    assert(after.columns.contains("alt") && !after.columns.contains("alt_text"))
    assert(after.where(col("alt") === "before-rename").count() == 10)

    // appends AFTER the rename write the same physical column, so a
    // rewrite mixing pre- and post-rename files stays consistent
    AppendJob.append(t,
      DataGen.generate(spark, 5, 9L, 1).toDF()
        .withColumn("image_id", concat(lit("p-"), col("image_id")))
        .withColumn("alt", lit("after-rename")), 1)                         // v5
    val pre = t.read()
    val c = new CompactJob(t, targetFileBytes = 8L << 20).run()
    val (ok, bad) = ScanEquivalence.check(pre, t.read(c))
    assert(ok, s"$bad violations after compacting a renamed table")
    assert(t.read(c).where(col("alt") === "before-rename").count() == 10)
    assert(t.read(c).where(col("alt") === "after-rename").count() == 5)
  }

  test("drop + re-add of the same name never resurrects dropped values") {
    val t = QTable.create(TestSpark.tmpDir("evo-drop"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 20, 42L, 1).toDF(), 1)      // v1
    t.addColumn("tag", "string")                                            // v2 (id 9)
    AppendJob.append(t,
      DataGen.generate(spark, 10, 7L, 1).toDF()
        .withColumn("image_id", concat(lit("n-"), col("image_id")))
        .withColumn("tag", lit("secret")), 1)                               // v3
    val dropped = t.dropColumn("tag")                                       // v4
    assert(dropped.operation == "drop-column")
    assert(!t.read().columns.contains("tag"))

    // re-add the SAME name: new field id (never reused) => new physical
    // name => the dropped column's stored values stay invisible
    val readd = t.addColumn("tag", "string")                                // v5
    val f = readd.schemaFields.find(_.name == "tag").get
    assert(f.id > 9, s"dropped field id must not be reused, got ${f.id}")
    assert(t.read().where(col("tag").isNotNull).count() == 0,
      "re-added column must NOT resurface dropped data")
  }

  test("widen-column int -> long: metadata-only, old files promote, skipping stays sound") {
    val t = QTable.create(TestSpark.tmpDir("evo-widen"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 40, 42L, 2).toDF(), 1)      // v1
    t.addColumn("views", "int")                                             // v2
    AppendJob.append(t,
      DataGen.generate(spark, 30, 7L, 1).toDF()
        .withColumn("image_id", concat(lit("a-"), col("image_id")))
        .withColumn("views", (pmod(xxhash64(col("image_id")), lit(1000)))
          .cast("int")), 1)                                                 // v3: int32 pages
    val filesBefore = t.entries(t.currentSnapshot).map(_.path).toSet
    val intSum = t.read().agg(sum(col("views").cast("long"))).head().getLong(0)

    val wid = t.widenColumn("views", "long")                                // v4
    assert(wid.operation == "widen-column")
    assert(t.entries(wid).map(_.path).toSet == filesBefore,
      "widen must not touch data files")
    assert(wid.schemaFields.find(_.name == "views").get.dtype == "long")

    // the unified read promotes old INT32 pages to the declared long
    val after = t.read()
    assert(after.schema("views").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(after.agg(sum("views")).head().getLong(0) == intSum,
      "promoted values must equal the stored int values")
    assert(after.where(col("views").isNull).count() == 40, "v1 rows stay null")

    // post-widening append with values only a long can hold
    AppendJob.append(t,
      DataGen.generate(spark, 30, 9L, 1).toDF()
        .withColumn("image_id", concat(lit("b-"), col("image_id")))
        .withColumn("views", lit(5_000_000_000L) +
          pmod(xxhash64(col("image_id")), lit(1000))), 1)                   // v5
    val mixed = t.read()
    assert(mixed.count() == 100)
    assert(mixed.where(col("views") > 4_000_000_000L).count() == 30)

    // stats skipping on the widened column: INT32-era files (max < 1000)
    // prune against a beyond-int filter, long-era files are kept, and the
    // indexed answer matches the plain read exactly
    val (idf, index) = t.readIndexed()
    val expected = mixed.where(col("views") > 4_000_000_000L)
      .select("image_id").collect().map(_.getString(0)).sorted
    val got = idf.where(col("views") > 4_000_000_000L)
      .select("image_id").collect().map(_.getString(0)).sorted
    assert(got.sameElements(expected))
    val (selected, all) = index.lastSelection
    assert(selected < all,
      s"int-era files must prune against a beyond-int filter ($selected/$all)")
    assert(selected >= 1, "the long-valued file must survive pruning")

    // rewrite across the widening boundary: compact mixes INT32- and
    // INT64-paged files; outputs store the widened type, values survive
    val pre = t.read()
    val c = new CompactJob(t, targetFileBytes = 8L << 20).run()
    val (ok, bad) = ScanEquivalence.check(pre, t.read(c))
    assert(ok, s"$bad violations after compacting a widened table")
    assert(t.read(c).agg(sum("views")).head().getLong(0) ==
      intSum + pre.where(col("views") > 4_000_000_000L)
        .agg(sum("views")).head().getLong(0))
  }

  test("widen-column float -> double keeps stored values bit-comparable") {
    val t = QTable.create(TestSpark.tmpDir("evo-widenf"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 10, 42L, 1).toDF(), 1)
    t.addColumn("score", "float")
    AppendJob.append(t,
      DataGen.generate(spark, 10, 7L, 1).toDF()
        .withColumn("image_id", concat(lit("a-"), col("image_id")))
        .withColumn("score", lit(1.5f)), 1)
    t.widenColumn("score", "double")
    val r = t.read()
    assert(r.schema("score").dataType == org.apache.spark.sql.types.DoubleType)
    // 1.5f is exactly representable: the promoted double compares exactly
    assert(r.where(col("score") === 1.5d).count() == 10)
  }

  test("widen-column rejects base columns and unsafe promotions") {
    val t = QTable.create(TestSpark.tmpDir("evo-widen-bad"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 10, 42L, 1).toDF(), 1)
    intercept[IllegalArgumentException] { t.widenColumn("w", "long") } // base
    t.addColumn("n", "long")
    intercept[IllegalArgumentException] { t.widenColumn("n", "int") } // narrow
    t.addColumn("s", "string")
    intercept[IllegalArgumentException] { t.widenColumn("s", "long") }
    intercept[IllegalArgumentException] { t.widenColumn("nope", "long") }
  }

  test("base columns cannot be renamed or dropped") {
    val t = QTable.create(TestSpark.tmpDir("evo-base"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 10, 42L, 1).toDF(), 1)
    intercept[IllegalArgumentException] { t.renameColumn("image_id", "id") }
    intercept[IllegalArgumentException] { t.dropColumn("caption") }
    intercept[IllegalArgumentException] { t.renameColumn("nope", "x") }
    t.addColumn("a", "string")
    intercept[IllegalArgumentException] { t.renameColumn("a", "caption") }
    intercept[IllegalArgumentException] { t.renameColumn("a", "bad name!") }
  }
}
