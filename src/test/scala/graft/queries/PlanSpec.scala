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
}
