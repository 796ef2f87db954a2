package graft.jobs

import graft.TestSpark
import graft.format.QTable
import graft.synth.DataGen
import graft.verify.ScanEquivalence
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `write.sort-on-append` ([[AppendJob]]): batch-sorted appends land
  * files with tight key ranges; clustering stays sound on top. */
class SortOnAppendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Mean per-file phash span in the key's UNSIGNED domain, normalized
    * (lower = tighter). The zkey interleaves phash with two other
    * planes, so k z-slices fix only ~k/3 phash bits — tightening is
    * real but sub-linear in file count. */
  private def phashSpan(t: QTable): Double = {
    def u(x: Long): Double = (x ^ Long.MinValue).toDouble - Long.MinValue.toDouble
    val es = t.entries(t.currentSnapshot)
    es.map(e => (u(e.phashMax) - u(e.phashMin)) / math.pow(2, 64)).sum / es.size
  }

  test("sorted appends tighten per-file key ranges; reads unchanged") {
    val plain = QTable.create(TestSpark.tmpDir("soa-plain"), spark, 2)
    val sorted = QTable.create(TestSpark.tmpDir("soa-sorted"), spark, 2)
    sorted.setProperties(Map("write.sort-on-append" -> "true"))
    val batch = DataGen.generate(spark, 2400, 51L, 4).toDF()
    AppendJob.append(plain, batch, filesPerBucket = 16)
    AppendJob.append(sorted, batch, filesPerBucket = 16)

    val (ok, bad) = ScanEquivalence.check(plain.read(), sorted.read())
    assert(ok, s"$bad violations between plain and sorted appends")
    val (sp, ss) = (phashSpan(plain), phashSpan(sorted))
    assert(ss < sp * 0.7,
      f"sorted appends must tighten phash spans: plain $sp%.3f sorted $ss%.3f")
    // the tighter stats actually prune: a phash range probe reads fewer
    // files through the skipping index on the sorted table
    val (loQ, hiQ) = (Long.MinValue / 2, 0L)
    def filesRead(t: QTable): Int = {
      val (df, idx) = t.readIndexed()
      df.where(col("phash") >= loQ && col("phash") < hiQ).count()
      idx.lastSelection._1.toInt
    }
    assert(filesRead(sorted) < filesRead(plain),
      "sorted layout must prune more files on a key-range probe")
  }

  test("sort.order columns drive the append sort when set") {
    val t = QTable.create(TestSpark.tmpDir("soa-by"), spark, 2)
    t.setProperties(Map(
      "write.sort-on-append" -> "true", "sort.order" -> "w,h"))
    AppendJob.append(t, DataGen.generate(spark, 1000, 52L, 4).toDF(),
      filesPerBucket = 4)
    val rs = t.entries(t.currentSnapshot).flatMap(_.stats.get("w"))
      .map(s => (s.min.toDouble, s.max.toDouble))
    val span = rs.map(_._2).max - rs.map(_._1).min
    val score = rs.map { case (lo, hi) => (hi - lo) / span }.sum / rs.size
    assert(score < 0.6, f"w spans must tighten under sort.order=w,h: $score%.3f")
  }

  test("cluster over sorted appends: full-file sampling keeps outputs balanced") {
    val t = QTable.create(TestSpark.tmpDir("soa-cluster"), spark, 2)
    t.setProperties(Map("write.sort-on-append" -> "true"))
    // several sorted batches: classic LSM runs, each spanning the domain
    (0 until 4).foreach { i =>
      AppendJob.append(t, DataGen.generate(spark, 400, 60L + i, 2).toDF()
        .withColumn("image_id", concat(lit(s"b$i-"), col("image_id"))),
        filesPerBucket = 2)
    }
    val pre = t.read()
    val snap = new ClusterJob(t, targetFileBytes = 60L << 10).run()
    val (ok, bad) = ScanEquivalence.check(pre, t.read(snap))
    assert(ok, s"$bad violations")
    // sorted inputs are key slices — the full-file quantile sample must
    // still produce balanced output files (a biased every-4th sample
    // would skew sizes several-fold)
    val counts = t.entries(snap).map(_.rowCount)
    val mean = counts.sum.toDouble / counts.size
    assert(counts.max <= mean * 4,
      s"skewed outputs under sorted appends: max=${counts.max} mean=$mean%.1f")
  }
}
