package graft.format

import graft.TestSpark
import graft.jobs.{AppendJob, CompactJob, MergeJob, RollbackJob}
import graft.synth.DataGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Row-level changelog (CDC) semantics: the surface incremental scan
  * refuses — merges, rollbacks, multi-commit keys — resolved per commit
  * with copied-on-write rows suppressed. */
class ChangelogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import ChangelogScan.{ChangeTypeCol, CommitVersionCol}

  private def fresh(n: Long, buckets: Int = 2): QTable = {
    val t = QTable.create(TestSpark.tmpDir("cdc"), spark, buckets)
    AppendJob.append(t, DataGen.generate(spark, n, 42L, buckets).toDF(),
      filesPerBucket = 2)
    t
  }

  test("append-only range: every appended row is an insert at its commit version") {
    val t = fresh(100) // v1
    import spark.implicits._
    AppendJob.append(t, DataGen.generate(spark, 30, 7L, 2)
      .map(r => r.copy(image_id = "b2-" + r.image_id)).toDF(), 1) // v2
    AppendJob.append(t, DataGen.generate(spark, 20, 9L, 2)
      .map(r => r.copy(image_id = "b3-" + r.image_id)).toDF(), 1) // v3
    val ch = t.readChanges(1, 3).cache()
    assert(ch.count() == 50)
    assert(ch.where(col(ChangeTypeCol) =!= "insert").count() == 0)
    assert(ch.where(col("image_id").startsWith("b2-") &&
      col(CommitVersionCol) === 2).count() == 30)
    assert(ch.where(col("image_id").startsWith("b3-") &&
      col(CommitVersionCol) === 3).count() == 20)
    // agrees with the incremental append scan on its own domain
    val inc = t.readIncremental(1, 3).select("image_id")
    assert(ch.select("image_id").except(inc).count() == 0)
    assert(inc.except(ch.select("image_id")).count() == 0)
    ch.unpersist()
  }

  test("merge commit: exact insert/delete/update split, copied rows suppressed") {
    val n = 400L
    val t = fresh(n) // v1
    new CompactJob(t, targetFileBytes = 64L << 20).run() // v2: layout-only
    val pre = t.read().cache()
    import spark.implicits._
    val ids = pre.select("image_id").orderBy("image_id").limit(30)
      .as[String].collect().toSeq
    val (delIds, updIds) = ids.splitAt(10)
    val corr = (
      delIds.map(id => (id, "ignored", true)) ++
      updIds.map(id => (id, "fixed: " + id, false)) ++
      Seq(("zzz-new-1", "brand new", false))
    ).toDF("image_id", "caption", "is_delete")
      .withColumn("bytes", lit(Array[Byte](1)))
      .withColumn("w", lit(1)).withColumn("h", lit(1))
      .withColumn("fmt", lit("png")).withColumn("phash", lit(0L))
    val snap = new MergeJob(t, updateCols = Seq("caption"),
      deleteCol = Some("is_delete")).run(corr) // v3

    val ch = t.readChanges(1, snap.version).cache()
    // 1 insert + 10 deletes + 20 updates x 2 images; the compact and the
    // merge's copied rows contribute NOTHING
    assert(ch.count() == 1 + 10 + 2 * 20, s"got ${ch.count()} changes")
    assert(ch.where(col(CommitVersionCol) =!= snap.version).count() == 0)
    assert(ch.where(col(ChangeTypeCol) === "insert")
      .select("image_id").as[String].collect().toSeq == Seq("zzz-new-1"))
    assert(ch.where(col(ChangeTypeCol) === "delete")
      .select("image_id").as[String].collect().sorted.toSeq == delIds.sorted)
    val posts = ch.where(col(ChangeTypeCol) === "update_postimage").cache()
    assert(posts.select("image_id").as[String].collect().sorted.toSeq ==
      updIds.sorted)
    assert(posts.where(!col("caption").startsWith("fixed: ")).count() == 0)
    val pres = ch.where(col(ChangeTypeCol) === "update_preimage")
    assert(pres.count() == 20)
    assert(pres.where(col("caption").startsWith("fixed: ")).count() == 0,
      "preimage must carry the OLD caption")
    // preimages match the pre-merge table state exactly
    val wantPre = pre.where(col("image_id").isin(updIds: _*))
      .select("image_id", "caption")
    assert(pres.select("image_id", "caption").except(wantPre).count() == 0)
    ch.unpersist(); posts.unpersist(); pre.unpersist()
  }

  test("rollback: the forward commit's changes are the inverse of what it undid") {
    val t = fresh(150) // v1
    import spark.implicits._
    AppendJob.append(t, DataGen.generate(spark, 25, 5L, 2)
      .map(r => r.copy(image_id = "x-" + r.image_id)).toDF(), 1) // v2
    val snap = new RollbackJob(t).run(1L) // v3: restores v1's row set
    val ch = t.readChanges(2, snap.version).cache()
    assert(ch.count() == 25)
    assert(ch.where(col(ChangeTypeCol) =!= "delete").count() == 0,
      "rolling back an append must emit exactly its deletes")
    assert(ch.where(!col("image_id").startsWith("x-")).count() == 0)
    // and the whole range (append + rollback) nets the same 25+25 events
    assert(t.readChanges(1, snap.version).count() == 50)
    ch.unpersist()
  }

  test("a key changed by two commits emits one event per commit") {
    val n = 120L
    val t = fresh(n) // v1
    import spark.implicits._
    val id = t.read().select("image_id").orderBy("image_id")
      .limit(1).as[String].head()
    def corrFor(cap: String, del: Boolean) =
      Seq((id, cap, del)).toDF("image_id", "caption", "is_delete")
        .withColumn("bytes", lit(Array[Byte](1)))
        .withColumn("w", lit(1)).withColumn("h", lit(1))
        .withColumn("fmt", lit("png")).withColumn("phash", lit(0L))
    val m1 = new MergeJob(t, updateCols = Seq("caption"),
      deleteCol = Some("is_delete")).run(corrFor("first fix", del = false))
    val m2 = new MergeJob(t, updateCols = Seq("caption"),
      deleteCol = Some("is_delete")).run(corrFor("ignored", del = true))
    val ch = t.readChanges(1, m2.version)
      .where(col("image_id") === id)
      .select(CommitVersionCol, ChangeTypeCol)
      .as[(Long, String)].collect().sorted.toSeq
    assert(ch == Seq(
      (m1.version, "update_postimage"), (m1.version, "update_preimage"),
      (m2.version, "delete")).sorted, s"got $ch")
    // the delete preimage carries the FIRST merge's caption
    val delRow = t.readChanges(m1.version, m2.version)
      .where(col(ChangeTypeCol) === "delete")
    assert(delRow.select("caption").as[String].head() == "first fix")
  }

  test("empty and layout-only ranges yield an empty, well-typed frame") {
    val t = fresh(80)
    new CompactJob(t, targetFileBytes = 64L << 20).run()
    val ch = t.readChanges(1, t.currentVersion)
    assert(ch.count() == 0)
    assert(ch.columns.takeRight(2).toSeq == Seq(ChangeTypeCol, CommitVersionCol))
    assert(t.readChanges(1, 1).count() == 0)
  }
}
