package graft.format

import graft.TestSpark
import graft.jobs._
import graft.synth.DataGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Branches (writable refs): isolation from main, global version
  * claims, fast-forward publish with ancestry enforcement, expiry
  * interplay, the staged-commit window under the new claim rule, and
  * schema evolution riding a fast-forward. */
class BranchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fresh(n: Long, buckets: Int = 2): QTable = {
    val t = QTable.create(TestSpark.tmpDir("branch"), spark, buckets)
    AppendJob.append(t, DataGen.generate(spark, n, 42L, 4).toDF(),
      filesPerBucket = 2)
    t
  }

  private def prefixed(n: Long, seed: Long, tag: String) =
    DataGen.generate(spark, n, seed, 2).toDF()
      .withColumn("image_id", concat(lit(tag + "-"), col("image_id")))

  test("branch commits are invisible on main; both refs read their own head") {
    val t = fresh(300)
    val mainV = t.currentVersion
    Branches.create(t, "dev")
    val dev = t.onBranch("dev")
    assert(dev.currentVersion == mainV)

    AppendJob.append(dev, prefixed(50, 7L, "dev"))
    assert(dev.read().count() == 350)
    assert(dev.currentVersion > mainV, "branch head must advance")
    assert(t.currentVersion == mainV, "main head must not move")
    assert(t.read().count() == 300)
    // the branch commit is ref-marked and never mistaken for a staged claim
    assert(dev.currentSnapshot.summary.get("ref").contains("dev"))
    assert(t.stagedVersion.isEmpty)

    // full table semantics on the branch: maintenance + upsert commit
    // against the BRANCH head
    new UpsertJob(dev, deleteCol = Some("is_delete")).run(
      dev.read().drop("pbucket").where(col("image_id").endsWith("1"))
        .withColumn("caption", concat(lit("dev: "), col("image_id")))
        .withColumn("is_delete", lit(false)))
    val sC = new CompactJob(dev, targetFileBytes = 8L << 20).run()
    assert(sC.summary.get("ref").contains("dev"))
    assert(dev.read().where(col("caption").startsWith("dev: ")).count() == 35)
    assert(t.read().where(col("caption").startsWith("dev: ")).count() == 0)
  }

  test("cherry-pick applies one branch append to main; refusals guard the rest") {
    val t = fresh(200)
    Branches.create(t, "feed")
    val dev = t.onBranch("feed")
    AppendJob.append(dev, prefixed(40, 11L, "cp"))  // pickable
    val pickV = dev.currentVersion
    val merged = new MergeJob(dev).run(
      prefixed(10, 12L, "cp").drop("pbucket"))      // NOT pickable
    val mergeV = merged.version
    // main advanced past the fork -> fast-forward would refuse, but a
    // cherry-pick of the append still lands
    AppendJob.append(t, prefixed(30, 13L, "main"))
    intercept[IllegalArgumentException](new FastForwardJob(t).run("feed"))

    val picked = new CherryPickJob(t).run(pickV)
    assert(picked.operation == "cherry-pick")
    assert(t.read().count() == 270, "200 base + 30 main + 40 picked")
    assert(t.read().where(col("image_id").startsWith("cp-")).count() == 40)
    // metadata-only: every file the pick added is one of the branch's
    // very part files (referenced, not copied), re-stamped as new rows
    // of the pick commit (strictly newer than any pre-pick eq-delete;
    // the initial-default seq rule sees them as post-pick)
    val devPaths = dev.entries(dev.snapshotAt(pickV)).map(_.path).toSet
    val parentPaths = t.entries(t.snapshotAt(picked.parentVersion)).map(_.path).toSet
    val newOnMain = t.entries(picked).filterNot(e => parentPaths.contains(e.path))
    assert(newOnMain.nonEmpty)
    assert(newOnMain.forall(e => devPaths.contains(e.path)))
    assert(newOnMain.forall(_.seq == picked.parentVersion + 1))
    // downstream surfaces treat the pick as an append: incremental scan
    // emits exactly its rows, CDC tags them inserts
    val inc = t.readIncremental(picked.parentVersion, picked.version)
    assert(inc.count() == 40)
    assert(t.readChanges(picked.parentVersion, picked.version)
      .where(col("_change_type") === "insert").count() == 40)

    // refusals: non-append source, double pick, already-on-main source
    intercept[IllegalArgumentException](new CherryPickJob(t).run(mergeV))
    intercept[IllegalArgumentException](new CherryPickJob(t).run(pickV))
    intercept[IllegalArgumentException](
      new CherryPickJob(t).run(t.currentVersion))
  }

  test("fast-forward publishes the branch; refuses once main advanced past the fork") {
    val t = fresh(200)
    Branches.create(t, "ok")
    val dev = t.onBranch("ok")
    AppendJob.append(dev, prefixed(30, 9L, "ff"))
    val branchState = dev.read().select("image_id", "caption")

    val ff = new FastForwardJob(t).run("ok")
    assert(ff.operation == "fast-forward")
    assert(t.read().count() == 230)
    assert(t.read().select("image_id", "caption")
      .exceptAll(branchState).count() == 0)

    // diverge: main advances after a new fork -> fast-forward must refuse
    Branches.create(t, "stale")
    val st = t.onBranch("stale")
    AppendJob.append(st, prefixed(5, 11L, "st"))
    AppendJob.append(t, prefixed(5, 12L, "mn"))
    val ex = intercept[IllegalArgumentException] {
      new FastForwardJob(t).run("stale")
    }
    assert(ex.getMessage.contains("not an ancestor"))
  }

  test("fast-forward adopts the branch's delete sets; maintenance folds them on main") {
    val t = fresh(300)
    Branches.create(t, "fix")
    val dev = t.onBranch("fix")
    // scan-free upsert with flagged deletes ON THE BRANCH
    new UpsertJob(dev, deleteCol = Some("is_delete")).run(
      dev.read().drop("pbucket").where(col("image_id").endsWith("4"))
        .withColumn("is_delete", lit(true)))
    assert(dev.read().count() == 270)
    assert(t.read().count() == 300, "main must not see the branch's deletes")

    new FastForwardJob(t).run("fix")
    assert(t.read().count() == 270)
    assert(t.currentSnapshot.eqDeleteFiles.nonEmpty, "ff must adopt eq deletes")
    // main's next append stamps above every adopted seq: rows stay live
    AppendJob.append(t, prefixed(10, 13L, "post"))
    assert(t.read().count() == 280)
    val sC = new CompactJob(t, targetFileBytes = 8L << 20).run()
    assert(sC.eqDeleteFiles.isEmpty)
    assert(t.read().count() == 280)
  }

  test("staged claim still owns the main commit window; branch commits pass through") {
    val t = fresh(200)
    val staged = t.staged
    val sS = new RewriteManifestsJob(staged).run()
    assert(t.stagedVersion.contains(sS.version))

    // a main writer is blocked while the claim is unpublished
    intercept[CommitConflictException] {
      AppendJob.append(t, prefixed(5, 21L, "blocked"))
    }
    // a BRANCH writer is not: it advances its own ref
    Branches.create(t, "side", from = t.currentVersion)
    AppendJob.append(t.onBranch("side"), prefixed(5, 22L, "side"))
    assert(t.onBranch("side").read().count() == 205)
    assert(t.stagedVersion.contains(sS.version), "branch commit must not eat the claim")

    t.publishStaged()
    assert(t.currentVersion == sS.version)
    AppendJob.append(t, prefixed(5, 23L, "after"))
    assert(t.read().count() == 205)
  }

  test("expiry keeps branch heads and main's chain window; branch ancestors age out") {
    val t = fresh(100)
    Branches.create(t, "keepme")
    val dev = t.onBranch("keepme")
    val devMid = AppendJob.append(dev, prefixed(10, 31L, "d1"))
    val devHead = AppendJob.append(dev, prefixed(10, 32L, "d2"))
    AppendJob.append(t, prefixed(10, 33L, "m1"))
    AppendJob.append(t, prefixed(10, 34L, "m2"))

    val res = new ExpireSnapshotsJob(t).run(keepLast = 2)
    // main keeps its own last-2 BY CHAIN (not by global version number,
    // which the branch commits interleave); the branch HEAD survives,
    // its intermediate ancestor does not
    assert(res.expiredVersions.contains(devMid.version))
    assert(!res.expiredVersions.contains(devHead.version))
    assert(t.read().count() == 120)
    assert(dev.read().count() == 120, "branch head must stay readable after expiry")
    assert(dev.read().where(col("image_id").startsWith("d1-")).count() == 10)
  }

  test("changelog across a fast-forward emits the branch's net changes; cross-chain endpoints refuse") {
    val t = fresh(150)
    val v0 = t.currentVersion
    Branches.create(t, "cdc")
    val dev = t.onBranch("cdc")
    AppendJob.append(dev, prefixed(20, 41L, "c1"))
    val devHead = dev.currentVersion
    val ff = new FastForwardJob(t).run("cdc")

    val ch = t.readChanges(v0, ff.version)
    assert(ch.count() == 20)
    assert(ch.where(col("_change_type") === "insert").count() == 20)
    assert(ch.where(col("image_id").startsWith("c1-")).count() == 20)

    // main head is not on the BRANCH's chain below its head once main
    // advanced independently — a cross-chain range must refuse, not
    // silently mis-diff
    AppendJob.append(t, prefixed(5, 42L, "m"))
    intercept[IllegalArgumentException] {
      t.readChanges(devHead, t.currentVersion).count()
    }
  }

  test("concurrent main and branch writers both land under the global claim") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val t = fresh(100)
    Branches.create(t, "race")
    val fMain = Future(CommitRetry.withCommitRetry(8) {
      AppendJob.append(t, prefixed(10, 51L, "mn"))
    })
    val fBranch = Future(CommitRetry.withCommitRetry(8) {
      AppendJob.append(t.onBranch("race"), prefixed(10, 52L, "br"))
    })
    Await.result(Future.sequence(Seq(fMain, fBranch)), 5.minutes)
    assert(t.read().count() == 110)
    assert(t.read().where(col("image_id").startsWith("br-")).count() == 0)
    assert(t.onBranch("race").read().count() == 110)
    assert(t.onBranch("race").read()
      .where(col("image_id").startsWith("mn-")).count() == 0)
  }

  test("schema evolution on a branch rides fast-forward; dropped ids stay retired on main") {
    val t = fresh(80)
    Branches.create(t, "schema")
    val dev = t.onBranch("schema")
    dev.addColumn("score", "int")
    val devWithCol = dev.currentSnapshot
    val scoreId = devWithCol.schemaFields.find(_.name == "score").get.id
    dev.dropColumn("score")
    new FastForwardJob(t).run("schema")
    assert(t.currentSnapshot.schemaFields.forall(_.name != "score"))
    // a re-add on MAIN must allocate a fresh id, never the branch's
    val re = t.addColumn("score", "int")
    assert(re.schemaFields.find(_.name == "score").get.id > scoreId,
      "fast-forward lost the branch's retired field id — data aliasing hazard")
  }
}
