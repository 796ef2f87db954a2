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
}
