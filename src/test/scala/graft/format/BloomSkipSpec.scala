package graft.format

import graft.TestSpark
import graft.jobs.{AppendJob, ClusterJob}
import graft.model.DataFileEntry
import graft.synth.DataGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** image_id Bloom skipping: harvest paths (file's own parquet bloom,
  * dictionary rebuild), FileIndex pruning where clustering defeats
  * min/max, and the soundness edges (no-bloom files kept, no false
  * negatives). */
class BloomSkipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("clustered point lookup: blooms prune files whose id ranges overlap") {
    val t = QTable.create(TestSpark.tmpDir("bloom"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 4000, 11L, 2).toDF(),
      filesPerBucket = 4)
    new ClusterJob(t, targetFileBytes = 2L << 20).run()
    val es = t.entries(t.currentSnapshot)
    assert(es.size >= 4, s"fixture needs several files, got ${es.size}")
    assert(es.forall(_.blooms.nonEmpty), "every rewritten file should carry a bloom")
    // clustering sorts by zkey: per-file id ranges overlap heavily, so
    // min/max alone keeps (nearly) everything — the bloom must not
    // a MID-RANGE id: min/max cannot prune it (it sits inside most
    // clustered files' id spans) — only the bloom can
    import spark.implicits._
    val id = t.read().select("image_id").orderBy("image_id")
      .limit(2000).as[String].collect().last

    val (df, idx) = t.readIndexed()
    assert(df.where(col("image_id") === id).count() == 1)
    val (sel, all) = idx.lastSelection
    assert(sel < all, s"bloom pruned nothing ($sel/$all)")
    assert(sel <= all / 2, s"expected strong pruning, got $sel/$all")

    // absent MID-RANGE key: ~zero files survive (1% FP allowance/file)
    val absent = id + "_nope"
    val (df2, idx2) = t.readIndexed()
    assert(df2.where(col("image_id") === absent).count() == 0)
    assert(idx2.lastSelection._1 <= 1,
      s"absent-key lookup kept ${idx2.lastSelection._1} files")

    // IN-list lookups prune through the same path
    val (df3, idx3) = t.readIndexed()
    assert(df3.where(col("image_id").isin(id, "zzz-not-there")).count() == 1)
    assert(idx3.lastSelection._1 < all)
  }

  test("no false negatives: every id in a file passes its blooms") {
    val t = QTable.create(TestSpark.tmpDir("bloom-fn"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 500, 3L, 2).toDF(), 1)
    val e = t.entries(t.currentSnapshot).head
    assert(e.blooms.nonEmpty)
    val filters = e.blooms.map(BloomIndex.decode)
    import spark.implicits._
    val ids = spark.read.schema(t.currentSnapshot.physicalSchema)
      .parquet(e.path).select("image_id").as[String].collect()
    assert(ids.nonEmpty)
    ids.foreach(id => assert(
      filters.exists(f => BloomIndex.mightContain(f, id)),
      s"false negative for $id"))
  }

  test("own-bloom harvest path: plain-encoded file carries the writer's bloom") {
    val dir = TestSpark.tmpDir("bloom-own")
    DataGen.generate(spark, 300, 5L, 1).toDF().coalesce(1).write
      .option("parquet.enable.dictionary", "false")
      .option("parquet.bloom.filter.enabled#image_id", "true")
      .option("parquet.bloom.filter.expected.ndv#image_id", "4096")
      .mode("overwrite").parquet(dir)
    val conf = spark.sessionState.newHadoopConf()
    val path = ParquetStats.listParquet(dir, conf).head
    val e = ParquetStats.entryFor(path, conf)
    assert(e.blooms.nonEmpty, "writer-emitted bloom not harvested")
    val f = e.blooms.map(BloomIndex.decode)
    import spark.implicits._
    val someId = spark.read.parquet(dir).select("image_id")
      .as[String].head()
    assert(f.exists(b => BloomIndex.mightContain(b, someId)))
  }

  test("files without bloom or complete dictionary are never pruned") {
    val dir = TestSpark.tmpDir("bloom-none")
    DataGen.generate(spark, 200, 7L, 1).toDF().coalesce(1).write
      .option("parquet.enable.dictionary", "false")
      .mode("overwrite").parquet(dir)
    val conf = spark.sessionState.newHadoopConf()
    val e = ParquetStats.entryFor(ParquetStats.listParquet(dir, conf).head, conf)
    assert(e.blooms.isEmpty)
    // and a null field (pre-bloom manifest) resolves to empty, file kept
    val legacy = e.copy(idBlooms = null)
    assert(legacy.blooms.isEmpty)
    val idx = new QTableFileIndex(Seq(legacy))
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.StringType
    val attr = AttributeReference("image_id", StringType, nullable = false)()
    // an id INSIDE the file's min/max range (min + suffix sorts between
    // min and max): only a bloom could prune it, and there is none
    idx.listFiles(Nil, Seq(EqualTo(attr, Literal(e.imageIdMin + "_absent"))))
    assert(idx.lastSelection == ((1, 1)),
      "a bloom-less file must survive id-equality pruning")
  }
}
