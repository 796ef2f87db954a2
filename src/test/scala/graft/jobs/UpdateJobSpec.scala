package graft.jobs

import graft.TestSpark
import graft.format.QTable
import graft.synth.DataGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UpdateJobSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshTable(n: Long, buckets: Int = 4): QTable = {
    val t = QTable.create(TestSpark.tmpDir("update"), spark, buckets)
    AppendJob.append(t, DataGen.generate(spark, n, 42L, 8).toDF(), filesPerBucket = 4)
    t
  }

  test("CoW UPDATE: matched rows patched, unmatched untouched, files carried") {
    val t = freshTable(1000)
    val pre = t.currentSnapshot
    val preMatched = t.read().where(col("fmt") === "png").count()
    val preOther = t.read().where(col("fmt") =!= "png")
      .select("image_id", "caption").cache()
    assert(preMatched > 0)

    val snap = new UpdateJob(t).run(
      Seq("caption" -> concat(lit("upd: "), col("image_id"))),
      col("fmt") === "png")
    assert(snap.operation == "update")
    assert(snap.summary("strategy") == "copy-on-write")
    assert(snap.summary("rows-updated").toLong == preMatched)

    val post = t.read(snap)
    assert(post.count() == 1000, "UPDATE must preserve row count")
    assert(post.where(col("fmt") === "png" &&
      col("caption") =!= concat(lit("upd: "), col("image_id"))).count() == 0)
    // unmatched rows bit-identical
    assert(post.where(col("fmt") =!= "png").select("image_id", "caption")
      .exceptAll(preOther).count() == 0)
    preOther.unpersist()

    // hash-scattered layout: a broad predicate legitimately touches
    // every file — rewrite count must equal the matched-file count
    assert(snap.summary("files-rewritten").toInt <= t.entries(pre).size)
  }

  test("simultaneous-assignment semantics: SET w = h, h = w swaps") {
    val t = freshTable(300, buckets = 2)
    val preSum = t.read().agg(sum("w"), sum("h")).head()
    val snap = new UpdateJob(t).run(
      Seq("w" -> col("h"), "h" -> col("w")), lit(true))
    val postSum = t.read(snap).agg(sum("w"), sum("h")).head()
    assert(postSum.getLong(0) == preSum.getLong(1), "w must become old h")
    assert(postSum.getLong(1) == preSum.getLong(0), "h must become old w")
  }

  test("SET to NULL is literal (no MergeJob keep-old convention)") {
    val t = freshTable(200, buckets = 2)
    val matched = t.read().where(col("fmt") === "png").count()
    val snap = new UpdateJob(t).run(
      Seq("caption" -> lit(null).cast("string")), col("fmt") === "png")
    assert(t.read(snap).where(col("caption").isNull).count() == matched)
  }

  test("MOR UPDATE equals CoW UPDATE; commit rewrites zero files") {
    val cow = freshTable(500, buckets = 2)
    val mor = freshTable(500, buckets = 2)
    val sets = Seq("caption" -> concat(col("caption"), lit(" !")),
      "w" -> (col("w") + 1))
    val cond = col("phash") % 3 === 0
    new UpdateJob(cow).run(sets, cond)
    val morPre = mor.currentSnapshot
    val snap = new UpdateJob(mor, mergeOnRead = true).run(sets, cond)
    assert(snap.summary("strategy") == "merge-on-read")
    assert(snap.summary("files-rewritten") == "0")
    assert(snap.deleteFiles.nonEmpty)
    // every pre data file carried by reference
    assert(mor.entries(morPre).map(_.path).toSet
      .subsetOf(t2Paths(mor, snap)), "MOR must not drop or rewrite data files")
    val a = cow.read().select("image_id", "caption", "w", "h", "fmt", "phash")
    val b = mor.read().select("image_id", "caption", "w", "h", "fmt", "phash")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "CoW and MOR must produce the same logical table")
  }

  private def t2Paths(t: QTable, s: graft.model.Snapshot): Set[String] =
    t.entries(s).map(_.path).toSet

  test("stats pruning: targeted UPDATE scans a subset of files") {
    // cluster first so image_id ranges are tight per file, then update
    // one key — discovery must open far fewer files than the table has
    val t = freshTable(2000, buckets = 4)
    new ClusterJob(t, 1L << 20).run()
    val id = t.read().select("image_id").orderBy("image_id").head().getString(0)
    val snap = new UpdateJob(t).run(
      Seq("caption" -> lit("point-update")), col("image_id") === id)
    assert(snap.summary("rows-updated") == "1")
    assert(snap.summary("files-scanned").toInt < snap.summary("files-total").toInt,
      s"expected pruning: ${snap.summary("files-scanned")}/${snap.summary("files-total")}")
    // copy-on-write carry: every file without the key rides by reference
    assert(snap.summary("files-rewritten").toInt < snap.summary("files-total").toInt,
      "point UPDATE on a clustered table must not rewrite every file")
    assert(t.read().where(col("image_id") === id).head().getAs[String]("caption")
      == "point-update")
  }

  test("no matching rows commits nothing") {
    val t = freshTable(100, buckets = 2)
    val v0 = t.currentVersion
    val snap = new UpdateJob(t).run(
      Seq("caption" -> lit("x")), col("image_id") === "no-such-id")
    assert(snap.version == v0, "empty UPDATE must not commit")
  }

  test("refuses key, partition column, unknown column, empty sets") {
    val t = freshTable(50, buckets = 2)
    intercept[IllegalArgumentException] {
      new UpdateJob(t).run(Seq("image_id" -> lit("x")), lit(true)) }
    intercept[IllegalArgumentException] {
      new UpdateJob(t).run(Seq("pbucket" -> lit(1)), lit(true)) }
    intercept[IllegalArgumentException] {
      new UpdateJob(t).run(Seq("nope" -> lit(1)), lit(true)) }
    intercept[IllegalArgumentException] {
      new UpdateJob(t).run(Nil, lit(true)) }
  }

  test("CoW UPDATE is resumable per group: committed groups reused") {
    val t = freshTable(800)
    val jobId = "update-resume"
    val sets = Seq("caption" -> concat(lit("r: "), col("image_id")))
    // phash LSB is constant-odd in the generator; %3 splits ~1/3
    val cond = col("phash") % 3 === 0
    intercept[RuntimeException] {
      new UpdateJob(t, jobId).run(sets, cond, failAfterGroups = 1)
    }
    val committed = new Checkpoint(t, jobId).committed
    assert(committed.nonEmpty, "first attempt must have committed a group")
    val matched = t.read().where(cond).count()
    val snap = new UpdateJob(t, jobId).run(sets, cond)
    assert(t.read(snap).count() == 800)
    assert(t.read(snap).where(col("caption").startsWith("r: ")).count() == matched)
    assert(t.read(snap).where(cond &&
      !col("caption").startsWith("r: ")).count() == 0)
  }

  test("row lineage: updated rows keep their _row_id on both strategies") {
    for (morFlag <- Seq(false, true)) {
      val t = freshTable(300, buckets = 2)
      t.enableRowLineage()
      val pre = t.readWithRowId().select(col("image_id"), col("_row_id")).cache()
      val snap = new UpdateJob(t, mergeOnRead = morFlag).run(
        Seq("caption" -> lit("lin")), col("fmt") === "png")
      assert(snap.version == t.currentVersion)
      val post = t.readWithRowId().select(col("image_id"), col("_row_id").as("rid2"))
      val moved = pre.join(post, Seq("image_id"))
        .where(col("_row_id") =!= col("rid2")).count()
      assert(moved == 0, s"mor=$morFlag: $moved rows changed _row_id across UPDATE")
      pre.unpersist()
    }
  }
}
