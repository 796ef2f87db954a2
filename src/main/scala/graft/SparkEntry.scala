package graft

import graft.format.QTable
import graft.jobs._
import graft.queries.Queries
import graft.synth.DataGen
import graft.verify.ScanEquivalence
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full maintenance pipeline (append -> compact ->
    * z-order cluster -> MERGE) on a freshly synthesized image+caption
    * qtable. Returns the post-merge (image_id, caption) state — which is
    * DuckDB-oracle-able as a full-outer coalesce of the exported
    * pre-merge table and corrections — GATED on the engine's own
    * scan-equivalence/isolation/rollback/orphan checks: any failed check
    * empties the result, so the driver's row count still encodes
    * pass/fail for the halves (PSNR, bytes, snapshots) that no external
    * engine can recompute. */
  def entry(spark: SparkSession): DataFrame = maintenanceDemo(spark, 400)

  /** Export dir for m1's oracle inputs: the demo's pre-merge
    * (image_id, caption) and the corrections, as parquet DuckDB reads
    * directly (the q19 absolute-path pattern). Keyed by row count so the
    * 400-row smoke `entry` can never clobber the 300-row m1 exports
    * between Verify and the driver's DuckDB pass. */
  def m1ExportDir(rows: Long): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_m1_export_$rows"

  def maintenanceDemo(spark: SparkSession, rows: Long): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val t = QTable.create(root, spark, buckets = 4)
    AppendJob.append(t, DataGen.generate(spark, rows, 42L).toDF(), filesPerBucket = 4)
    val v1 = t.currentSnapshot
    val preDf = t.read(v1)

    val c = new CompactJob(t, targetFileBytes = 8L << 20).run()
    val (okC, badC) = ScanEquivalence.check(preDf, t.read(c))

    val z = new ClusterJob(t, targetFileBytes = 8L << 20).run()
    val (okZ, badZ) = ScanEquivalence.check(preDf, t.read(z))

    val corr = DataGen.correctionsDF(spark, rows, 42L, inserts = 3)
    // export the oracle inputs BEFORE merging: pre-merge captions and the
    // corrections, for the driver's DuckDB full-outer-coalesce check
    val exportDir = m1ExportDir(rows)
    preDf.select("image_id", "caption")
      .coalesce(1).write.mode("overwrite").parquet(s"$exportDir/pre")
    corr.select("image_id", "caption")
      .coalesce(1).write.mode("overwrite").parquet(s"$exportDir/corr")
    val m = new MergeJob(t).run(corr)
    val (okM, badM) = ScanEquivalence.checkMerged(preDf, t.read(m), corr)

    // pinned reader isolation: v1 still reads identically post-commits
    val pinnedOk = t.read(v1).count() == rows

    // rollback to the pre-merge snapshot restores it exactly, then roll
    // forward again so the final state keeps the merge
    val rb = new RollbackJob(t).run(z.version)
    val (okR, badR) = ScanEquivalence.check(preDf, t.read(rb))
    new RollbackJob(t).run(m.version)

    // orphan cleanup: a crashed uncommitted attempt's files are removed,
    // live data untouched
    DataGen.generate(spark, 10, 7L, 1).toDF()
      .write.parquet(t.newDataDir("crashed-demo", "b0"))
    val orph = new RemoveOrphanFilesJob(t, graceMs = 0L).run()
    val orphOk = orph.deleted > 0 && t.read().count() == rows + 3

    // GATED RESULT: the post-merge (image_id, caption) state — exactly
    // reproducible in DuckDB from the exports — but only if every
    // internal check passed. Any failure (PSNR regression, broken
    // isolation, bad rollback, orphan leak) empties the result, so the
    // driver's row count (rows+3 inserts vs 0) gates the non-SQL halves
    // while the caption half is hash-checked against a real oracle.
    val checks = Seq(
      ("compact_scan_equivalent", okC, badC),
      ("cluster_scan_equivalent", okZ, badZ),
      ("merge_scan_equivalent", okM, badM),
      ("snapshot_isolation_pinned_reader", pinnedOk, if (pinnedOk) 0L else 1L),
      ("rollback_restores_pre_merge", okR, badR),
      ("orphan_files_removed", orphOk, if (orphOk) 0L else 1L))
    checks.filterNot(_._2).foreach { case (name, _, bad) =>
      System.err.println(s"[maintenanceDemo] CHECK FAILED: $name ($bad violations)")
    }
    val post = t.read().select("image_id", "caption")
    if (checks.forall(_._2)) post else post.limit(0)
  }

  /** DuckDB oracle for the demo's caption half: MERGE semantics as a
    * full-outer coalesce over the exported pre-table and corrections. */
  def m1OracleSql(rows: Long): String =
    s"""SELECT COALESCE(p.image_id, c.image_id) AS image_id,
       |       COALESCE(c.caption, p.caption) AS caption
       |FROM read_parquet('${m1ExportDir(rows)}/pre/*.parquet') p
       |FULL OUTER JOIN read_parquet('${m1ExportDir(rows)}/corr/*.parquet') c
       |ON p.image_id = c.image_id""".stripMargin

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.withOracle.map { case (k, (fn, _)) => k -> fn } ++
      Queries.withoutOracle ++
      Map("m1_maintenance_e2e" ->
        ((s: SparkSession, _: String) => maintenanceDemo(s, 300)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables (m1's oracle reads the demo's exported
    * pre/corrections parquet by absolute path). Only m2 stays rows-only:
    * its image decode/pHash/PSNR kernels have no external recompute. */
  def oracleSql: Map[String, String] =
    Queries.withOracle.map { case (k, (_, sql)) => k -> sql } +
      ("m1_maintenance_e2e" -> m1OracleSql(300))
}
