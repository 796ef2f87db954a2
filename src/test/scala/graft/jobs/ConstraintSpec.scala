package graft.jobs

import graft.TestSpark
import graft.format.QTable
import graft.synth.DataGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CHECK constraints ([[Constraints]]): property-carried, enforced on
  * every new-row writer, SQL three-valued logic, O(new rows) only. */
class ConstraintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshTable(n: Long = 300): QTable = {
    val t = QTable.create(TestSpark.tmpDir("constraint"), spark, 2)
    AppendJob.append(t, DataGen.generate(spark, n, 42L, 4).toDF(),
      filesPerBucket = 2)
    t
  }

  test("set commits a property; violating append refused, clean passes") {
    val t = freshTable()
    val snap = Constraints.set(t, "fmt-known", "fmt IN ('png','jpeg')")
    assert(snap.props("constraint.fmt-known") == "fmt IN ('png','jpeg')")
    val v = t.currentSnapshot.version
    val bad = DataGen.generate(spark, 10, 7L, 2).toDF()
      .withColumn("image_id", concat(lit("x-"), col("image_id")))
      .withColumn("fmt", lit("bmp"))
    val e = intercept[IllegalStateException] { AppendJob.append(t, bad) }
    assert(e.getMessage.contains("fmt-known"))
    assert(t.currentSnapshot.version == v, "refused append must not commit")
    val ok = DataGen.generate(spark, 10, 8L, 2).toDF()
      .withColumn("image_id", concat(lit("y-"), col("image_id")))
    val s2 = AppendJob.append(t, ok)
    assert(t.read(s2).count() == 310)
    // pure-layout rewrites never re-validate (and never fail): compact
    // runs on the constrained table
    val c = new CompactJob(t, targetFileBytes = 8L << 20).run()
    assert(t.read(c).count() == 310)
  }

  test("adding a constraint existing data violates is refused") {
    val t = freshTable()
    val e = intercept[IllegalArgumentException] {
      Constraints.set(t, "png-only", "fmt = 'png'")
    }
    assert(e.getMessage.contains("violates"))
    assert(!t.currentSnapshot.props.keys.exists(_.startsWith("constraint.")))
  }

  test("SQL 3VL: NULL predicate result passes, explicit violation refuses") {
    val t = freshTable(100)
    t.addColumn("views", "int")
    Constraints.set(t, "views-pos", "views > 0")
    // appended rows without the evolved column (typed-null fill): the
    // predicate evaluates NULL, which SQL CHECK accepts
    val s = AppendJob.append(t, DataGen.generate(spark, 10, 9L, 2).toDF()
      .withColumn("image_id", concat(lit("n-"), col("image_id"))))
    assert(t.read(s).count() == 110)
    intercept[IllegalStateException] {
      AppendJob.append(t, DataGen.generate(spark, 5, 10L, 2).toDF()
        .withColumn("image_id", concat(lit("z-"), col("image_id")))
        .withColumn("views", lit(-1)))
    }
  }

  test("MERGE enforcement: violating SET post-image and insert refuse, both strategies") {
    val t = freshTable(200)
    Constraints.set(t, "caption-tag", "NOT caption LIKE 'bad%'")
    val v = t.currentSnapshot.version
    val badUpd = t.read().limit(3).select("image_id")
      .withColumn("caption", lit("bad caption"))
    intercept[IllegalStateException] { new MergeJob(t).run(badUpd) }
    intercept[IllegalStateException] {
      new MergeJob(t, mergeOnRead = true).run(badUpd) }
    val badIns = DataGen.generate(spark, 2, 11L, 1).toDF()
      .withColumn("image_id", concat(lit("i-"), col("image_id")))
      .withColumn("caption", lit("bad insert"))
    intercept[IllegalStateException] { new MergeJob(t).run(badIns) }
    assert(t.currentSnapshot.version == v, "refused merges must not commit")
    val okSrc = DataGen.correctionsDF(spark, 200, 42L, inserts = 2)
    new MergeJob(t).run(okSrc)
    assert(t.read().count() == 202)
  }

  test("UPDATE enforcement: violating post-image refused on CoW and MOR") {
    val t = freshTable(150)
    Constraints.set(t, "w-pos", "w > 0")
    intercept[IllegalStateException] {
      new UpdateJob(t).run(Seq("w" -> lit(-5)), col("fmt") === "png") }
    intercept[IllegalStateException] {
      new UpdateJob(t, mergeOnRead = true).run(
        Seq("w" -> (col("w") * -1)), col("fmt") === "jpeg") }
    val v = t.currentSnapshot.version
    new UpdateJob(t).run(Seq("w" -> (col("w") + 1)), col("fmt") === "png")
    assert(t.currentSnapshot.version == v + 1)
    assert(t.read().where(col("w") <= 0).count() == 0)
  }

  test("upsert enforcement vetoes the batch") {
    val t = freshTable(100)
    Constraints.set(t, "fmt-known", "fmt IN ('png','jpeg')")
    intercept[IllegalStateException] {
      new UpsertJob(t).run(DataGen.generate(spark, 5, 12L, 1).toDF()
        .withColumn("fmt", lit("gif")))
    }
    new UpsertJob(t).run(DataGen.generate(spark, 5, 12L, 1).toDF())
    assert(t.read().count() == 100)
  }

  test("schema evolution refuses to drop/rename a constrained column") {
    val t = freshTable(60)
    t.addColumn("views", "int")
    Constraints.set(t, "views-pos", "views > 0")
    val eDrop = intercept[IllegalArgumentException] { t.dropColumn("views") }
    assert(eDrop.getMessage.contains("views-pos"))
    val eRen = intercept[IllegalArgumentException] {
      t.renameColumn("views", "hits") }
    assert(eRen.getMessage.contains("views-pos"))
    // after dropping the constraint both evolutions go through
    Constraints.drop(t, "views-pos")
    t.renameColumn("views", "hits")
    t.dropColumn("hits")
    assert(!t.currentSnapshot.schemaFields.exists(_.name == "hits"))
  }

  test("guard matches backtick-quoted identifiers in the predicate") {
    // `w` > 0 references w just as surely as w > 0 — the boundary class
    // must treat the backtick as a boundary, or drop/rename would pass
    // and every later writer's enforcement would fail at analysis (r5
    // advice fix)
    val t = freshTable(40)
    t.addColumn("views", "int")
    Constraints.set(t, "views-bt", "`views` IS NULL OR `views` > 0")
    val e = intercept[IllegalArgumentException] { t.dropColumn("views") }
    assert(e.getMessage.contains("views-bt"))
    val eRen = intercept[IllegalArgumentException] {
      t.renameColumn("views", "hits") }
    assert(eRen.getMessage.contains("views-bt"))
    Constraints.drop(t, "views-bt")
    t.dropColumn("views")
  }

  test("drop lifts enforcement; dropping a missing constraint refuses") {
    val t = freshTable(50)
    Constraints.set(t, "fmt-known", "fmt IN ('png','jpeg')")
    val bad = DataGen.generate(spark, 5, 13L, 1).toDF()
      .withColumn("image_id", concat(lit("g-"), col("image_id")))
      .withColumn("fmt", lit("gif"))
    intercept[IllegalStateException] { AppendJob.append(t, bad) }
    Constraints.drop(t, "fmt-known")
    AppendJob.append(t, bad)
    assert(t.read().where(col("fmt") === "gif").count() == 5)
    intercept[IllegalArgumentException] { Constraints.drop(t, "nope") }
  }
}
