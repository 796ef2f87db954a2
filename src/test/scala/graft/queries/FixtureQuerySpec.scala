package graft.queries

import graft.TestSpark
import graft.format.QTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the build-once oracle fixtures behind q31 (type-widening
  * scan) and q32 (streaming ingest). The driver's DuckDB compare checks
  * the RESULT rows; these tests pin the table-side properties the oracle
  * cannot see — that the widen commit really was metadata-only and that
  * the stream really committed one snapshot per micro-batch with the
  * replayed batch adding none. Without these, a q31/q32 hash-match could
  * in principle be produced by a rewrite-everything widen or a
  * non-streaming bulk copy. */
class FixtureQuerySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q31 fixture: widen is metadata-only and the scan unifies int32/int64 files") {
    val df = Queries.q31WidenScan(spark, dir)
    assert(df.schema("views").dataType == LongType)
    assert(df.count() == 150)
    // post-widen batch is only representable as int64
    assert(df.where(col("views") > Int.MaxValue.toLong).count() == 60)
    // pre-widen batch survives promotion with its int values intact
    assert(df.where(col("views") < 100000L and col("views") >= 0L).count() == 90)

    val t = QTable(s"${System.getProperty("java.io.tmpdir")}/graft_widen_scan_v1/table", spark)
    val ops = t.listVersions.map(v => t.snapshotAt(v).operation)
    assert(ops.count(_ == "widen-column") == 1, s"ops were $ops")
    val widen = t.listVersions.map(t.snapshotAt)
      .find(_.operation == "widen-column").get
    val parent = t.snapshotAt(widen.parentVersion)
    assert(t.entries(widen).map(_.path).toSet == t.entries(parent).map(_.path).toSet,
      "widen commit must not add, drop, or rewrite any data file")
    // the widen sits BETWEEN the two appends: files existed before it and
    // more arrived after, so the unified read genuinely mixes physical types
    assert(t.entries(parent).nonEmpty)
    assert(t.entries(t.currentSnapshot).size > t.entries(widen).size)
  }

  test("q45 fixture: default add is metadata-only; substitution and bake-in phases agree") {
    val df = Queries.q45DefaultScan(spark, dir).cache()
    val t = QTable(s"${System.getProperty("java.io.tmpdir")}/graft_default_scan_v1/table", spark)
    val add = t.listVersions.map(t.snapshotAt).find(_.operation == "add-column").get
    val parent = t.snapshotAt(add.parentVersion)
    assert(t.entries(add).map(_.path).toSet == t.entries(parent).map(_.path).toSet,
      "add-column with a default must not touch any data file")
    val f = add.schemaFields.find(_.name == "views").get
    assert(f.defaultOpt.contains("7") && f.defaultSeq == add.version)
    // the pre phase genuinely exercised the substitution path: live
    // pre-evolution files at the pre-compact version
    assert(t.entries(t.snapshotAt(3L)).exists(_.seq < f.defaultSeq))
    // both lifecycle phases produce the same rows
    val pre = df.where(col("phase") === "pre").drop("phase")
    val post = df.where(col("phase") === "post").drop("phase")
    assert(pre.exceptAll(post).isEmpty && post.exceptAll(pre).isEmpty,
      "substitution read and baked read must agree row-for-row")
    // explicit stored NULLs stayed null (initial-default, not coalesce)
    assert(pre.where(col("views").isNull).count() > 0)
    df.unpersist()
  }

  test("q35 fixture: delete commit is metadata-only, fold is partial, read matches recompute") {
    val df = Queries.q35MorDelete(spark, dir).cache()
    val t = QTable(s"${System.getProperty("java.io.tmpdir")}/graft_mor_delete_v1/table", spark)

    // the delete snapshot touched no data file
    val del = t.listVersions.map(t.snapshotAt).find(_.operation == "delete").get
    val parent = t.snapshotAt(del.parentVersion)
    assert(t.entries(del).map(_.path).toSet == t.entries(parent).map(_.path).toSet,
      "MOR delete must not add, drop, or rewrite any data file")
    assert(del.deleteFiles.nonEmpty)
    // the scoped compact folded SOME deletes but live entries remain, so
    // the oracled read crosses both folded files and the anti-join path
    val head = t.currentSnapshot
    assert(head.operation == "compact")
    assert(head.deleteFiles.nonEmpty)
    assert(head.deleteFiles.map(_.rowCount).sum < del.deleteFiles.map(_.rowCount).sum ||
      t.entries(head).map(_.path).toSet != t.entries(del).map(_.path).toSet,
      "scoped compact should have folded part of the table")

    // Spark-side recompute of the oracle semantics (same md5-derived
    // predicate over the exported pre-state)
    val pre = spark.read.parquet(
      s"${System.getProperty("java.io.tmpdir")}/graft_mor_delete_v1/exp/pre")
    val expected = pre.where(
      pmod(conv(substring(md5(col("image_id")), 1, 15), 16, 10).cast("long"),
        lit(7)) =!= 3)
    assert(df.count() == expected.count())
    assert(df.join(expected, Seq("image_id", "caption"), "left_anti").count() == 0)
    assert(expected.join(df, Seq("image_id", "caption"), "left_anti").count() == 0)
    df.unpersist()
  }

  test("q36 fixture: MOR merge carried every data file, result matches recompute") {
    val df = Queries.q36MorMerge(spark, dir).cache()
    val t = QTable(s"${System.getProperty("java.io.tmpdir")}/graft_mor_merge_v1/table", spark)

    val merge = t.listVersions.map(t.snapshotAt).find(_.operation == "merge").get
    assert(merge.summary("strategy") == "merge-on-read")
    assert(merge.summary("files-rewritten") == "0")
    val parentPaths = t.entries(t.snapshotAt(merge.parentVersion)).map(_.path).toSet
    assert(parentPaths.subsetOf(t.entries(merge).map(_.path).toSet),
      "MOR merge must carry every pre-merge data file by reference")
    assert(merge.deleteFiles.nonEmpty)

    // Spark-side recompute of the oracle's full-outer coalesce
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_mor_merge_v1"
    val pre = spark.read.parquet(s"$root/exp/pre").as("p")
    val corr = spark.read.parquet(s"$root/exp/corr").as("c")
    val expected = pre.join(corr, col("p.image_id") === col("c.image_id"), "full_outer")
      .where(!coalesce(col("c.is_delete"), lit(false)))
      .select(coalesce(col("p.image_id"), col("c.image_id")).as("image_id"),
        coalesce(col("c.caption"), col("p.caption")).as("caption"),
        coalesce(col("c.w"), col("p.w")).as("w"))
    assert(df.count() == expected.count())
    assert(df.join(expected, Seq("image_id", "caption", "w"), "left_anti").count() == 0)
    assert(expected.join(df, Seq("image_id", "caption", "w"), "left_anti").count() == 0)
    df.unpersist()
  }

  test("fixture builders are idempotent and crash-replay safe") {
    // The driver can re-invoke any entry mid-session (crash replay), so
    // every build-once fixture must (a) serve identical results from its
    // ready marker on a second same-JVM call, and (b) REBUILD to the
    // same results when the marker is missing over a stale/partial dir
    // (the deleteRecursive-then-build path). Three fixtures spanning the
    // shapes: metadata delete (q38), NDV sketches (q43), day partition
    // (q54).
    val cases: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame, String)] = Seq(
      ("q38", Queries.q38MetaDelete _, "graft_q38_v1"),
      ("q43", Queries.q43NdvSketch _, "graft_q43_v2"),
      ("q54", Queries.q54DayPruned _, "graft_q54_v1"))
    cases.foreach { case (name, fn, dirName) =>
      val first = fn(spark, dir).count()
      assert(first > 0, s"$name fixture produced no rows")
      // same-JVM re-call: ready-marker fast path, identical result
      assert(fn(spark, dir).count() == first, s"$name re-call diverged")
      // crash-replay shape: marker gone, dir still populated -> rebuild
      val root = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), dirName)
      val marker = root.resolve("_FIXTURE_READY")
      if (java.nio.file.Files.exists(marker)) {
        java.nio.file.Files.delete(marker)
        assert(fn(spark, dir).count() == first,
          s"$name rebuild over a stale dir diverged")
        assert(java.nio.file.Files.exists(marker),
          s"$name rebuild must restore its ready marker")
      } else fail(s"$name fixture has no ready marker at $marker")
    }
  }

  test("q32 fixture: one snapshot per micro-batch, replayed batch adds none") {
    val df = Queries.q32StreamIngest(spark, dir)
    assert(df.count() == 180)
    assert(df.select("image_id").distinct().count() == 180, "replay must not duplicate rows")

    val t = QTable(s"${System.getProperty("java.io.tmpdir")}/graft_stream_ingest_v1/table", spark)
    val appends = t.listVersions.map(t.snapshotAt)
      .filter(_.summary.get("job-id").exists(_.startsWith("stream-q32-fixture-b")))
    // 3 source files x maxFilesPerTrigger=1 => 3 micro-batch snapshots;
    // the post-run redelivery of batch 0 must not have produced a 4th
    assert(appends.size == 3, s"expected 3 micro-batch appends, got ${appends.size}")
    assert(appends.map(_.summary("job-id")).distinct.size == 3)
  }
}
