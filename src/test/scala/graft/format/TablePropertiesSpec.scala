package graft.format

import graft.TestSpark
import graft.jobs.{AppendJob, CompactJob, FastForwardJob}
import graft.synth.DataGen
import org.scalatest.funsuite.AnyFunSuite

/** Table properties (TBLPROPERTIES analogue): carried by every commit,
  * time-travelable, branch-scoped, row-preserving for CDC/streaming. */
class TablePropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("properties persist across commits, update and unset are commits") {
    val t = QTable.create(TestSpark.tmpDir("props"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 200, 42L, 2).toDF(), 2) // v1
    assert(t.property("write.target-mb").isEmpty)

    t.setProperties(Map("write.target-mb" -> "4", "owner" -> "pipeline")) // v2
    assert(t.property("write.target-mb").contains("4"))

    // later commits carry the properties untouched
    new CompactJob(t, targetFileBytes = 4L << 20).run()                 // v3
    assert(t.property("write.target-mb").contains("4"))
    assert(t.property("owner").contains("pipeline"))

    // update wins, unset removes, history keeps the old value
    t.setProperties(Map("write.target-mb" -> "8"))                      // v4
    t.unsetProperties(Seq("owner"))                                     // v5
    assert(t.property("write.target-mb").contains("8"))
    assert(t.property("owner").isEmpty)
    assert(t.snapshotAt(3).props("write.target-mb") == "4",
      "property history must be time-travelable")
    assert(t.snapshotAt(3).props.contains("owner"))

    // row-preserving: CDC and incremental consumers skip property commits
    assert(t.readChanges(1, 2).count() == 0)
    assert(t.readIncremental(1, 5).count() == 0)
    assert(t.read().count() == 200)
  }

  test("branch properties are scoped; fast-forward adopts them") {
    val t = QTable.create(TestSpark.tmpDir("props-br"), spark, buckets = 2)
    AppendJob.append(t, DataGen.generate(spark, 100, 42L, 2).toDF(), 1)
    Branches.create(t, "tune")
    t.onBranch("tune").setProperties(Map("write.target-mb" -> "64"))
    assert(t.property("write.target-mb").isEmpty,
      "a branch property must not leak to main before publish")
    new FastForwardJob(t).run("tune")
    assert(t.property("write.target-mb").contains("64"),
      "fast-forward must adopt the branch's properties like its schema")
  }
}
