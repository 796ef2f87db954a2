package graft.format

import graft.TestSpark
import graft.jobs.{AppendJob, CompactJob, MergeJob}
import graft.synth.DataGen
import graft.verify.ScanEquivalence
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Reference in-memory [[ObjectStore]]: strongly consistent, atomic
  * putIfAbsent (ConcurrentHashMap) — the semantics GCS/S3 give via
  * conditional PUT and (since 2020) consistent listing. */
class InMemoryObjectStore extends ObjectStore {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  override def get(key: String): Option[Array[Byte]] = Option(m.get(key))
  override def put(key: String, bytes: Array[Byte]): Unit = m.put(key, bytes)
  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    m.putIfAbsent(key, bytes) == null
  override def list(prefix: String): Seq[String] =
    m.keySet().asScala.filter(_.startsWith(prefix)).toSeq.sorted
  override def delete(key: String): Boolean = m.remove(key) != null
  def keys: Seq[String] = m.keySet().asScala.toSeq.sorted
}

/** The object-store commit protocol contract, driven by the REAL table
  * lifecycle: metadata (snapshots, manifests, hint, checkpoints) lives
  * ONLY in the store — no rename, no directories, claims via
  * conditional PUT — while parquet data stays on the local FS. A
  * production GCS/S3 binding swaps the store impl; nothing above the
  * [[ObjectStore]] trait changes. */
class ObjectStoreCommitIOSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tableOn(store: InMemoryObjectStore, root: String): QTable =
    new QTable(root, spark) {
      override protected def makeIO: CommitIO = new ObjectStoreCommitIO(store)
    }

  private def createOn(store: InMemoryObjectStore, root: String, buckets: Int): QTable = {
    val t = tableOn(store, root)
    t.io.mkdirs(t.metadataDir)
    t.commitSnapshot(-1L, "create", Nil, Map("buckets" -> buckets.toString), buckets)
    t
  }

  test("full maintenance lifecycle with metadata exclusively in the object store") {
    val store = new InMemoryObjectStore
    val root = TestSpark.tmpDir("objstore")
    val t = createOn(store, root, buckets = 2)

    AppendJob.append(t, DataGen.generate(spark, 200, 42L, 4).toDF(), 4)  // v1
    AppendJob.append(t, DataGen.generate(spark, 50, 7L, 1).toDF()
      .withColumn("image_id",
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("b2-"),
          org.apache.spark.sql.functions.col("image_id"))), 2)           // v2
    val pre = t.read()
    assert(pre.count() == 250)

    val c = new CompactJob(t, targetFileBytes = 8L << 20).run()          // v3
    val (ok, bad) = ScanEquivalence.check(pre, t.read(c))
    assert(ok, s"$bad violations after compact on object-store metadata")

    val corr = DataGen.correctionsDF(spark, 200, 42L, inserts = 2)
    new MergeJob(t).run(corr)                                            // v4
    assert(t.read().count() == 252)

    // time travel + history still resolve from the store
    assert(t.read(t.snapshotAt(1)).count() == 200)
    assert(t.historyDF.count() == 5)

    // NO metadata ever touched the local filesystem
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(t.metadataDir)),
      "metadata leaked onto the local FS")
    assert(store.keys.exists(_.contains("version-hint")), "hint not in store")
    assert(store.keys.count(_.contains("/v")) >= 5, "snapshots not in store")

    // expiry deletes manifests/versions FROM THE STORE (io.delete route)
    val before = store.keys.size
    val res = new graft.jobs.ExpireSnapshotsJob(t).run(keepLast = 1)
    assert(res.expiredVersions.nonEmpty && res.deletedManifests > 0)
    assert(store.keys.size < before, "expire must shrink the store")
    assert(t.listVersions.size == 1)
    assert(t.read().count() == 252, "current snapshot must survive expiry")
  }

  test("conditional PUT: exactly one of two racing committers claims a version") {
    val store = new InMemoryObjectStore
    val root = TestSpark.tmpDir("objstore-race")
    val t = createOn(store, root, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 50, 42L, 1).toDF(), 1)   // v1
    val parent = t.currentSnapshot
    val files = t.entries(parent)

    // both commit off the SAME parent: the conditional PUT on v2.json
    // admits exactly one; the loser sees CommitConflictException
    val results = (1 to 2).map { i =>
      try { t.commit(Some(parent), s"racer-$i", files); "won" }
      catch { case _: CommitConflictException => "lost" }
    }
    assert(results.sorted == Seq("lost", "won"), s"got $results")
    assert(t.currentVersion == 2)
  }

  test("prefix listing semantics: names, dirs, exists, recursive delete") {
    val store = new InMemoryObjectStore
    val io = new ObjectStoreCommitIO(store)
    io.writeAtomic("/b/meta/v0.json", "a".getBytes)
    io.writeAtomic("/b/meta/checkpoints/j1/g1.json", "b".getBytes)
    assert(io.listNames("/b/meta").toSet == Set("v0.json", "checkpoints"))
    assert(io.listDirNames("/b/meta") == Seq("checkpoints"))
    assert(io.exists("/b/meta/v0.json") && io.exists("/b/meta/checkpoints"))
    assert(!io.exists("/b/meta/nope"))
    assert(io.writeNew("/b/meta/v1.json", "c".getBytes))
    assert(!io.writeNew("/b/meta/v1.json", "d".getBytes), "claim must be once-only")
    assert(new String(io.readBytes("/b/meta/v1.json")) == "c",
      "losing claim must not overwrite")
    io.deleteRecursive("/b/meta/checkpoints")
    assert(io.listDirNames("/b/meta").isEmpty)
  }
}
