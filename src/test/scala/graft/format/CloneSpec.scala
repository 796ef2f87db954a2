package graft.format

import graft.TestSpark
import graft.jobs._
import graft.synth.DataGen
import graft.verify.ScanEquivalence
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shallow clone ([[QTable.cloneTo]]): zero-copy independent tables,
  * version-floor sequence safety, and the expiry ownership guard. */
class CloneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def dataFilesUnder(root: String): Seq[String] =
    ParquetStats.listParquet(s"$root/data",
      spark.sessionState.newHadoopConf())

  test("clone reads the source exactly, copies no data, adopts schema+props") {
    val src = QTable.create(TestSpark.tmpDir("clone-src"), spark, 4)
    AppendJob.append(src, DataGen.generate(spark, 400, 42L, 4).toDF(),
      filesPerBucket = 2)
    src.addColumn("alt", "string")
    Constraints.set(src, "w-pos", "w > 0")
    val targetRoot = TestSpark.tmpDir("clone-dst")
    val clone = src.cloneTo(targetRoot)

    val cs = clone.currentSnapshot
    assert(cs.operation == "clone")
    assert(cs.version == src.currentSnapshot.version + 1, "version floor")
    assert(cs.parentVersion == -1L)
    assert(cs.summary("source-table") == src.root)
    val (ok, bad) = ScanEquivalence.check(src.read(), clone.read())
    assert(ok, s"$bad violations between source and clone")
    assert(dataFilesUnder(targetRoot).isEmpty, "shallow: no data copied")
    assert(clone.currentSnapshot.schemaFields.map(_.name) ==
      src.currentSnapshot.schemaFields.map(_.name))
    assert(cs.props("constraint.w-pos") == "w > 0", "properties adopted")
    // constraints enforce on the clone too
    intercept[IllegalStateException] {
      AppendJob.append(clone, DataGen.generate(spark, 5, 7L, 1).toDF()
        .withColumn("image_id", concat(lit("c-"), col("image_id")))
        .withColumn("w", lit(-1)))
    }
  }

  test("clone and source evolve independently") {
    val src = QTable.create(TestSpark.tmpDir("clone-src2"), spark, 2)
    AppendJob.append(src, DataGen.generate(spark, 200, 43L, 2).toDF())
    val clone = src.cloneTo(TestSpark.tmpDir("clone-dst2"))
    val srcV = src.currentSnapshot.version

    AppendJob.append(clone, DataGen.generate(spark, 50, 44L, 2).toDF()
      .withColumn("image_id", concat(lit("c-"), col("image_id"))))
    assert(clone.read().count() == 250)
    assert(src.currentSnapshot.version == srcV, "clone write must not touch source")
    assert(src.read().count() == 200)

    AppendJob.append(src, DataGen.generate(spark, 30, 45L, 2).toDF()
      .withColumn("image_id", concat(lit("s-"), col("image_id"))))
    assert(src.read().count() == 230)
    assert(clone.read().count() == 250, "source write must not leak into clone")
  }

  test("maintenance on the clone localizes data; expiry skips source files") {
    val src = QTable.create(TestSpark.tmpDir("clone-src3"), spark, 2)
    AppendJob.append(src, DataGen.generate(spark, 300, 46L, 2).toDF(),
      filesPerBucket = 4)
    val srcFiles = src.entries(src.currentSnapshot).map(_.path)
    val cloneRoot = TestSpark.tmpDir("clone-dst3")
    val clone = src.cloneTo(cloneRoot)
    val pre = clone.read()

    // the analyze report prices the clone's external references (the
    // "localize before source cleanup" dial); a compact pays it down
    val repPre = new AnalyzeJob(clone, 8L << 20).run()
    assert(repPre.externalFiles == srcFiles.size,
      s"analyze must report ${srcFiles.size} externals, got ${repPre.externalFiles}")
    assert(repPre.externalBytes > 0)
    // the files metadata table exposes the same fact per file
    assert(clone.filesDF.where("external").count() == srcFiles.size)
    assert(src.filesDF.where("external").count() == 0)

    // compact LOCALIZES the clone: external entries are mandatory work
    // regardless of size, so afterwards every live entry is clone-local
    // and the external-debt dial reads zero
    val c = new CompactJob(clone, targetFileBytes = 8L << 20).run()
    val (ok, bad) = ScanEquivalence.check(pre, clone.read(c))
    assert(ok, s"$bad violations after clone compact")
    val rootPrefix = cloneRoot.stripSuffix("/") + "/"
    assert(clone.entries(c).forall(_.path.startsWith(rootPrefix)),
      "compact must localize every external reference")
    assert(new AnalyzeJob(clone, 8L << 20).run().externalFiles == 0)

    // expiring the clone's pre-compact history must delete NOTHING of
    // the source (the external guard) while sweeping clone-local debt
    val res = new ExpireSnapshotsJob(clone).run(keepLast = 1)
    assert(res.externalSkipped == srcFiles.size,
      s"expected ${srcFiles.size} external files skipped, got ${res.externalSkipped}")
    val conf = spark.sessionState.newHadoopConf()
    srcFiles.foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      assert(hp.getFileSystem(conf).exists(hp), s"source file deleted: $p")
    }
    assert(src.read().count() == 300, "source unharmed after clone expiry")
    assert(clone.read().count() == 300)
  }

  test("version floor keeps cloned equality deletes from killing new rows") {
    val src = QTable.create(TestSpark.tmpDir("clone-src4"), spark, 2)
    AppendJob.append(src, DataGen.generate(spark, 100, 47L, 2).toDF())
    // burn versions so the source head (and its eq-delete seq stamps)
    // sit well above the clone's first few local commits
    (1 to 3).foreach(i => src.setProperties(Map(s"burn.$i" -> "x")))
    // eq-upsert a batch: its keys land as an equality delete stamped
    // with the source's high version
    val batch = DataGen.generate(spark, 10, 47L, 1).toDF()
    new UpsertJob(src).run(batch)
    assert(src.currentSnapshot.eqDeleteFiles.nonEmpty, "fixture needs eq debt")

    val clone = src.cloneTo(TestSpark.tmpDir("clone-dst4"))
    assert(clone.read().count() == 100)
    // re-upsert the SAME keys into the clone: the new rows' seq must
    // exceed every cloned eq-delete seq, so they survive (a v0-based
    // clone would silently swallow them)
    new UpsertJob(clone).run(batch.withColumn("caption", lit("clone-upserted")))
    assert(clone.read().count() == 100)
    assert(clone.read().where(col("caption") === "clone-upserted").count() == 10,
      "upserted rows must survive the cloned equality deletes")
  }

  test("maintain --auto localizes a fresh clone in one tick") {
    val src = QTable.create(TestSpark.tmpDir("clone-src6"), spark, 2)
    AppendJob.append(src, DataGen.generate(spark, 200, 49L, 2).toDF(),
      filesPerBucket = 2)
    val clone = src.cloneTo(TestSpark.tmpDir("clone-dst6"))
    val res = AutoMaintain.run(clone, targetBytes = 8L << 20)
    assert(res.plan.compact, s"tick must plan a localize, got ${res.plan.actions}")
    assert(res.scanEquivalent.contains(true))
    assert(new AnalyzeJob(clone, 8L << 20).run().externalFiles == 0)
    // second tick: clean, commits nothing
    val res2 = AutoMaintain.run(clone, targetBytes = 8L << 20)
    assert(res2.plan.isNoop, s"second tick must be a no-op, got ${res2.plan.actions}")
  }

  test("clone birth is stream-, changelog-, and incrementally readable") {
    val src = QTable.create(TestSpark.tmpDir("clone-src7"), spark, 2)
    AppendJob.append(src, DataGen.generate(spark, 80, 50L, 2).toDF())
    val clone = src.cloneTo(TestSpark.tmpDir("clone-dst7"))
    val cloneV = clone.currentSnapshot.version

    // incremental scan: the cloned dataset IS the initial delta
    assert(clone.readIncremental(-1, cloneV).count() == 80)
    // changelog: every cloned row emits as an insert at the birth commit
    val ch = clone.readChanges(-1, cloneV)
    assert(ch.count() == 80)
    assert(ch.where(col(ChangelogScan.ChangeTypeCol) =!= "insert").count() == 0)
    assert(ch.select(ChangelogScan.CommitVersionCol).distinct()
      .collect().map(_.getLong(0)).toSeq == Seq(cloneV))
    // a fresh streaming read emits the clone as its initial micro-batch,
    // then follows clone-local appends exactly once
    val ckpt = TestSpark.tmpDir("clone-ckpt7")
    val out = TestSpark.tmpDir("clone-out7")
    def drain(): Long = {
      val q = spark.readStream.format("qtable").load(clone.root)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
      spark.read.parquet(out).count()
    }
    assert(drain() == 80L, "clone birth must stream as the initial snapshot")
    AppendJob.append(clone, DataGen.generate(spark, 15, 51L, 1).toDF()
      .withColumn("image_id", concat(lit("c-"), col("image_id"))))
    assert(drain() == 95L)
  }

  test("clone with adopted eq-delete debt: changelog applies it, incremental refuses") {
    val src = QTable.create(TestSpark.tmpDir("clone-src8"), spark, 2)
    AppendJob.append(src, DataGen.generate(spark, 60, 52L, 2).toDF())
    // eq-upsert leaves live equality-delete debt in the source head
    new UpsertJob(src).run(DataGen.generate(spark, 10, 52L, 1).toDF()
      .withColumn("caption", lit("patched")))
    assert(src.currentSnapshot.eqDeleteFiles.nonEmpty, "fixture needs eq debt")
    val clone = src.cloneTo(TestSpark.tmpDir("clone-dst8"))
    val cloneV = clone.currentSnapshot.version

    // the changelog emits LIVE rows only (adopted deletes applied): 60
    // keys, the 10 patched ones with their post-upsert caption
    val ch = clone.readChanges(-1, cloneV)
    assert(ch.count() == 60)
    assert(ch.where(col("caption") === "patched").count() == 10)
    // entries-as-appended would over-emit the 10 killed pre-images, so
    // the incremental/streaming shape refuses with the clone remedy
    val e = intercept[IllegalArgumentException] {
      clone.readIncremental(-1, cloneV)
    }
    assert(e.getMessage.contains("clone"), s"unexpected message: ${e.getMessage}")
  }

  test("clone by catalog name: resolve source, register the clone") {
    val cat = TestSpark.tmpDir("clone-cat")
    val srcRoot = TestSpark.tmpDir("clone-src9")
    val src = QTable.create(srcRoot, spark, 2)
    AppendJob.append(src, DataGen.generate(spark, 40, 53L, 1).toDF())
    Catalog.register(cat, "gold", srcRoot, spark)

    val s2 = spark.newSession()
    s2.conf.set(Catalog.ConfKey, cat)
    val resolved = Catalog.resolveTableArg(s2, "gold")
    val cloneRoot = TestSpark.tmpDir("clone-dst9")
    val clone = QTable(resolved, s2).cloneTo(cloneRoot)
    Catalog.register(cat, "gold_dev", cloneRoot, s2)

    // a third session sees both names and reads the clone zero-copy
    val s3 = spark.newSession()
    s3.conf.set(Catalog.ConfKey, cat)
    assert(Catalog.list(cat, s3).map(_._1) == Seq("gold", "gold_dev"))
    assert(QTable(Catalog.resolveTableArg(s3, "gold_dev"), s3).read().count() == 40)
    assert(clone.currentSnapshot.summary("source-table") == srcRoot)
  }

  test("clone refuses an existing target") {
    val src = QTable.create(TestSpark.tmpDir("clone-src5"), spark, 2)
    AppendJob.append(src, DataGen.generate(spark, 20, 48L, 1).toDF())
    val dst = TestSpark.tmpDir("clone-dst5")
    src.cloneTo(dst)
    intercept[IllegalArgumentException] { src.cloneTo(dst) }
  }
}
