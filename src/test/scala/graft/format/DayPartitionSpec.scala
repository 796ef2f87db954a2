package graft.format

import graft.TestSpark
import graft.jobs.{AppendJob, ClusterJob, CompactJob}
import graft.synth.DataGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg-style `days(ts)` partition transform ([[DayPartition]]):
  * appends land day-isolated files, date-range scans prune via the
  * column's per-file stats, and maintenance (compact/cluster) preserves
  * the layout by grouping work per (day, bucket). */
class DayPartitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val DayMs = 86400000L
  private val D0 = 20000L // epoch day of the fixture's first day

  /** Fresh table with an added epoch-ms `ts` column, the days(ts) spec,
    * and `n` rows spread deterministically over `days` days. */
  private def dayTable(tag: String, n: Long, days: Int,
      filesPerBucket: Int = 2): QTable = {
    val t = QTable.create(TestSpark.tmpDir(tag), spark, buckets = 4)
    t.addColumn("ts", "long")
    t.setProperties(Map(DayPartition.Prop -> "ts"))
    AppendJob.append(t, batch(n, 1L, days), filesPerBucket)
    t
  }

  private def batch(n: Long, seed: Long, days: Int) =
    DataGen.generate(spark, n, seed, 4).toDF()
      .withColumn("ts",
        (lit(D0) + pmod(xxhash64(col("image_id"), lit("day")), lit(days.toLong))) * DayMs
          + pmod(xxhash64(col("caption")), lit(DayMs)))

  /** Every file's ts stats span exactly one day (the layout invariant
    * the transform exists for). */
  private def assertDayIsolated(t: QTable): Unit = {
    val f = DayPartition.fieldOf(t.currentSnapshot).get
    t.entries(t.currentSnapshot).foreach { e =>
      val st = e.stats.get(f.phys)
      assert(st.isDefined, s"no ts stats on ${e.path}")
      val (dMin, dMax) = (Math.floorDiv(st.get.min.toLong, DayMs),
        Math.floorDiv(st.get.max.toLong, DayMs))
      assert(dMin == dMax, s"file straddles days $dMin..$dMax: ${e.path}")
    }
  }

  test("appends land day-isolated files; date-range scans prune") {
    val t = dayTable("daypart", 800, days = 5)
    assertDayIsolated(t)
    val total = t.entries(t.currentSnapshot).size
    assert(total >= 10, s"need several files, got $total")

    // one-day range predicate: must match the plain read AND skip files
    val lo = D0 * DayMs
    val hi = (D0 + 1) * DayMs - 1
    val (df, index) = t.readIndexed()
    val expected = t.read().where(col("ts").between(lo, hi))
      .select("image_id").collect().map(_.getString(0)).sorted
    val got = df.where(col("ts").between(lo, hi))
      .select("image_id").collect().map(_.getString(0)).sorted
    assert(got.sameElements(expected))
    val (selected, all) = index.lastSelection
    assert(all == total)
    assert(selected < all, s"date pruning did nothing: $selected/$all")
    assert(selected <= all / 2,
      s"a 1-of-5-days scan should skip most files: $selected/$all")
  }

  test("compact packs within days and never merges across them") {
    val t = dayTable("daypart-c", 600, days = 3, filesPerBucket = 3)
    val pre = t.read()
    val before = t.entries(t.currentSnapshot).size
    new CompactJob(t, targetFileBytes = 8L << 20).run()
    val after = t.entries(t.currentSnapshot).size
    assert(after < before, s"compact had no work: $before -> $after")
    assertDayIsolated(t)
    val (ok, bad) = graft.verify.ScanEquivalence.check(pre, t.read())
    assert(ok, s"$bad violations after day-aware compact")
    // at least one output per (day, bucket-group): 3 days can never
    // collapse below 3 files
    assert(after >= 3)
  }

  test("cluster sorts within days; date pruning survives a full cluster") {
    val t = dayTable("daypart-z", 600, days = 3, filesPerBucket = 3)
    val pre = t.read()
    new ClusterJob(t, targetFileBytes = 256L << 10, minGroupBytes = 1L).run()
    assertDayIsolated(t)
    val (ok, bad) = graft.verify.ScanEquivalence.check(pre, t.read())
    assert(ok, s"$bad violations after day-aware cluster")
    val (df, index) = t.readIndexed()
    df.where(col("ts") >= (D0 + 2) * DayMs).count()
    val (selected, all) = index.lastSelection
    assert(selected < all, s"pruning lost after cluster: $selected/$all")
  }

  test("timestamp-typed partition source prunes too") {
    val t = QTable.create(TestSpark.tmpDir("daypart-ts"), spark, buckets = 2)
    t.addColumn("evt", "timestamp")
    t.setProperties(Map(DayPartition.Prop -> "evt"))
    AppendJob.append(t, DataGen.generate(spark, 300, 2L, 4).toDF()
      .withColumn("evt", timestamp_millis(
        (lit(D0) + pmod(xxhash64(col("image_id")), lit(4L))) * DayMs)),
      filesPerBucket = 2)
    assertDayIsolated(t)
    val (df, index) = t.readIndexed()
    val cutoff = java.time.Instant.ofEpochMilli((D0 + 3) * DayMs)
    val n = df.where(col("evt") >= lit(cutoff)).count()
    assert(n == t.read().where(col("evt") >= lit(cutoff)).count())
    assert(n > 0)
    val (selected, all) = index.lastSelection
    assert(selected < all,
      s"timestamp stats not pruning: $selected/$all")
  }

  test("null-day rows land in their own cell and read back") {
    val t = QTable.create(TestSpark.tmpDir("daypart-null"), spark, buckets = 2)
    t.addColumn("ts", "long")
    t.setProperties(Map(DayPartition.Prop -> "ts"))
    val b = DataGen.generate(spark, 200, 3L, 4).toDF()
      .withColumn("ts", when(pmod(xxhash64(col("image_id")), lit(5L)) === 0,
        lit(null).cast("long")).otherwise(lit(D0 * DayMs)))
    AppendJob.append(t, b, filesPerBucket = 1)
    assert(t.read().count() == 200)
    assert(t.read().where(col("ts").isNull).count() ==
      b.where(col("ts").isNull).count())
  }

  test("retention: DELETE WHERE ts < cutoff drops whole days at metadata level") {
    // the day-partition layout makes age-based retention a METADATA
    // operation: every file's ts stats span one day, so a cutoff
    // predicate proves whole files and StatsDelete drops them with zero
    // delete rows and zero data reads — "delete day X" at any scale
    val t = dayTable("daypart-ret", 600, days = 4)
    val pre = t.read()
    val cutoff = (D0 + 1) * DayMs // retire day 0
    val dropped = pre.where(col("ts") < cutoff).count()
    assert(dropped > 0)
    val keep = pre.where(col("ts") >= cutoff).count()
    new graft.jobs.DeleteJob(t).run(col("ts") < cutoff)
    val snap = t.currentSnapshot
    assert(snap.summary("files-dropped").toInt > 0)
    assert(snap.summary("new-delete-files") == "0",
      s"expected a pure metadata delete, got ${snap.summary}")
    assert(snap.summary("files-scanned") == "0")
    assert(t.read().count() == keep)
  }

  test("maintain --auto converges on a day-partitioned table") {
    // cross-day zkey overlap is NOT debt the day-aware cluster can
    // reduce — analyze scopes the overlap dial to (bucket, day), so the
    // tick must settle instead of re-clustering forever
    val t = dayTable("daypart-auto", 400, days = 3, filesPerBucket = 2)
    val r1 = graft.jobs.AutoMaintain.run(t, targetBytes = 8L << 20)
    assert(!r1.plan.isNoop, "first tick should pay down small-file debt")
    val r2 = graft.jobs.AutoMaintain.run(t, targetBytes = 8L << 20)
    assert(r2.plan.isNoop,
      s"second tick must plan nothing, got ${r2.plan.actions}")
    assertDayIsolated(t)
  }

  test("merge, update, upsert, and rebucket all preserve day isolation") {
    // every writer that creates data files routes through a day-aware
    // layout (JobPlanning.dayBins/layoutNewRows + per-(day,bucket) CoW
    // groups) — without this, repeated DML would erode the date layout
    // file by file even though appends and compacts preserve it
    val t = dayTable("daypart-dml", 400, days = 3, filesPerBucket = 2)
    val keyDay = (lit(D0) + pmod(xxhash64(col("image_id"), lit("day")), lit(3L)))

    // CoW MERGE with inserts: patched groups and the insert file(s)
    val corr = t.read().limit(40)
      .select(col("image_id"), concat(lit("m: "), col("caption")).as("caption"))
      .unionByName(
        graft.synth.DataGen.generate(spark, 10, 9L, 1).toDF()
          .withColumn("image_id", concat(lit("ins-"), col("image_id")))
          .withColumn("ts", keyDay * DayMs)
          .select("image_id", "caption", "bytes", "w", "h", "fmt", "phash", "ts"),
        allowMissingColumns = true)
    new graft.jobs.MergeJob(t, "dml-merge").run(corr)
    assertDayIsolated(t)
    assert(t.read().count() == 410)

    // CoW UPDATE across every day
    new graft.jobs.UpdateJob(t).run(
      Seq("caption" -> concat(lit("u: "), col("caption"))),
      col("fmt") === "png")
    assertDayIsolated(t)

    // MOR UPDATE post-images
    new graft.jobs.UpdateJob(t, mergeOnRead = true).run(
      Seq("w" -> (col("w") + 1)), col("fmt") === "jpeg")
    assertDayIsolated(t)

    // equality upsert batch
    new graft.jobs.UpsertJob(t).run(t.read().limit(15)
      .withColumn("caption", lit("eq-upserted")))
    assertDayIsolated(t)

    // bucket-count spec evolution rewrites the whole table — and must
    // re-bin per (day, newBucket)
    new graft.jobs.RebucketJob(t, newBuckets = 8).run()
    assertDayIsolated(t)
    assert(t.read().count() == 410)
  }

  test("spec evolution validates; source column is drop/rename-protected") {
    val t = QTable.create(TestSpark.tmpDir("daypart-val"), spark, buckets = 2)
    // unknown column refuses at SET time
    intercept[IllegalArgumentException] {
      t.setProperties(Map(DayPartition.Prop -> "nope")) }
    // non-day-mappable type refuses
    intercept[IllegalArgumentException] {
      t.setProperties(Map(DayPartition.Prop -> "caption")) }
    t.addColumn("ts", "long")
    val v = t.setProperties(Map(DayPartition.Prop -> "ts")).version
    // the spec source cannot be dropped or renamed while referenced
    intercept[IllegalArgumentException] { t.dropColumn("ts") }
    intercept[IllegalArgumentException] { t.renameColumn("ts", "ts2") }
    // unsetting the spec (evolution back) frees the column
    t.unsetProperties(Seq(DayPartition.Prop))
    t.dropColumn("ts")
    assert(t.currentSnapshot.version > v)
  }
}
