package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Regression guards for the physical-plan properties the engine relies
  * on at scale: predicate pushdown into the parquet scan, column pruning
  * in ReadSchema, broadcast for small join sides, and whole-stage codegen
  * around the custom Z-order expression (no interpreted fallback). */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Collect FileSourceScanExec nodes, descending through AQE wrappers. */
  private def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scansOf(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scansOf(q.plan)
    case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(scansOf) ++
      other.subqueries.flatMap(scansOf)
  }

  test("q02: shipdate range predicate is pushed to the parquet scan") {
    val p = planOf(Queries.q02PrunedScan(spark, dir))
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(l_shipdate"),
      s"no pushed range filter in:\n$p")
  }

  test("q02: scan reads only the needed columns (column pruning)") {
    val p = planOf(Queries.q02PrunedScan(spark, dir))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_shipdate") && !readSchema.contains("l_orderkey"),
      s"scan not pruned: $readSchema")
  }

  test("q03 semi join broadcasts the small side") {
    val p = planOf(Queries.q03SemiJoin(spark, dir))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("q04 anti join broadcasts and pushes the date filter") {
    val p = planOf(Queries.q04AntiJoin(spark, dir))
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
  }

  test("q06: ZOrderKey runs inside whole-stage codegen (no fallback)") {
    val df = Queries.q06ZOrderKey(spark, dir)
    val p = planOf(df)
    // '*(n)' marks whole-stage-codegen subtrees; the zkey project must be
    // inside one, i.e. the custom expression compiled via doGenCode
    assert(p.contains("*("), s"no codegen stage in:\n$p")
    // and it must actually evaluate
    assert(df.limit(5).collect().length == 5)
  }

  test("q12 kNN broadcasts the query vector") {
    val p = planOf(Queries.q12KnnCosine(spark, dir))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q16 IVF probe prunes to the query's cell partition") {
    val df = Queries.q16KnnIvf(spark, dir)
    val p = planOf(df)
    assert(p.contains("PartitionFilters") && p.contains("cell"),
      s"no cell partition filter in:\n$p")
    // execute and check the scan actually read ~1/8 of the index files
    df.collect()
    val scan = scansOf(df.queryExecution.executedPlan).head
    val readFiles = scan.metrics("numFiles").value
    val allFiles = new java.io.File(Queries.ivfIndexDir(spark, dir))
      .listFiles().count(_.getName.startsWith("cell="))
    assert(allFiles == 8, s"expected 8 cell partitions, got $allFiles")
    val totalParquet = Queries.ivfIndexDir(spark, dir)
    assert(readFiles > 0 && readFiles < allFiles * 2,
      s"scan read $readFiles files across $allFiles cells — not pruned ($totalParquet)")
  }

  test("q20 date-range probe prunes event_date partitions") {
    val df = Queries.q20DatePruned(spark, dir)
    val p = planOf(df)
    assert(p.contains("PartitionFilters") && p.contains("event_date"),
      s"no event_date partition filter in:\n$p")
    df.collect()
    val scan = scansOf(df.queryExecution.executedPlan).head
    val readFiles = scan.metrics("numFiles").value
    val allDays = new java.io.File(Queries.q20EventsByDayDir(spark, dir))
      .listFiles().count(_.getName.startsWith("event_date="))
    // 7-day window out of ~30 days of events: scan must skip most days
    assert(allDays >= 28, s"expected ~30 day partitions, got $allDays")
    assert(readFiles <= 7, s"scan read $readFiles files for a 7-day window of $allDays days")
  }

  test("q07 bin-pack window is partitioned (no single-partition window)") {
    val p = planOf(Queries.q07BinpackPlan(spark, dir))
    val windowLine = p.linesIterator.find(_.contains("Window")).getOrElse("")
    assert(windowLine.contains("pbucket"),
      s"window not partitioned by pbucket: $windowLine")
  }
}
