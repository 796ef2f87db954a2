package graft.format

import graft.TestSpark
import graft.jobs.AppendJob
import graft.synth.DataGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case soundness of the generic column stats + skipping path:
  * string truncation must stay a valid bound and never emit lone
  * surrogates, orderings must match what Spark/Parquet actually use,
  * and schema-evolution naming cannot alias columns. */
class StatsEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def evolved(prefix: String): QTable = {
    val t = QTable.create(TestSpark.tmpDir(prefix), spark, buckets = 2)
    t.addColumn("note", "string")
    t.addColumn("score", "double")
    t
  }

  private def tagged(seed: Long, n: Long, tag: String) =
    DataGen.generate(spark, n, seed).toDF()
      .withColumn("image_id", concat(lit(tag + "-"), col("image_id")))

  test("long string stats are truncated to valid bounds; commits survive surrogate pairs at the cut") {
    val t = evolved("stats-trunc")
    // 63 ASCII chars + an emoji (surrogate pair) straddling the 64-char
    // cut, plus a >64-char tail — the old substring(0,64) would split the
    // pair and the manifest JSON write would throw
    val longNote = ("x" * 63) + "😀" + ("y" * 30)
    AppendJob.append(t, tagged(1L, 20, "a")
      .withColumn("note", lit(longNote))
      .withColumn("score", lit(1.5)), 1)
    val e = t.entries(t.currentSnapshot)
    assert(e.nonEmpty)
    val st = e.head.stats
    val noteStat = st.find(_._1.startsWith("note_fid")).map(_._2)
    assert(noteStat.isDefined, s"note stats missing: ${st.keys}")
    val (mn, mx) = (noteStat.get.min, noteStat.get.max)
    // bounds hold under UTF-8 byte order and contain no lone surrogate
    def wellFormed(s: String) = {
      var i = 0; var ok = true
      while (i < s.length) {
        if (Character.isHighSurrogate(s.charAt(i)))
          ok &= i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1))
        else ok &= !Character.isLowSurrogate(s.charAt(i))
        i += (if (Character.isHighSurrogate(s.charAt(i))) 2 else 1)
      }
      ok
    }
    assert(wellFormed(mn) && wellFormed(mx), s"lone surrogate in bounds: $mn / $mx")
    assert(mn.length <= 64 && mx.length <= 64)
    import org.apache.spark.unsafe.types.UTF8String
    assert(UTF8String.fromString(mn).compareTo(UTF8String.fromString(longNote)) <= 0)
    assert(UTF8String.fromString(longNote).compareTo(UTF8String.fromString(mx)) < 0)
  }

  test("double stats: -0.0 and NaN files are never pruned at the index layer") {
    val t = evolved("stats-zero")
    AppendJob.append(t, tagged(1L, 10, "z")
      .withColumn("note", lit("n"))
      .withColumn("score", lit(-0.0)), 1)
    AppendJob.append(t, tagged(2L, 10, "n")
      .withColumn("note", lit("n"))
      .withColumn("score", lit(Double.NaN)), 1)
    val (df, index) = t.readIndexed()
    // the index keeps BOTH files for an = 0.0 filter: the -0.0-stats file
    // because SQL equality treats -0.0 = 0.0 (Double.compare would have
    // pruned it), the NaN-stats file because NaN bounds carry no ordering.
    // (Row-level results equal the plain non-indexed read — Spark's own
    // parquet row-group pushdown separately drops -0.0 rows against a
    // 0.0 literal, identically on both paths; that layer is not ours.)
    val expectEq = t.read().where(col("score") === 0.0).count()
    assert(df.where(col("score") === 0.0).count() == expectEq)
    val (selEq, allEq) = index.lastSelection
    assert(selEq == allEq, s"index must keep -0.0/NaN files: $selEq/$allEq")
    // NaN-seeking reads are identical too (isNaN is an unsupported shape
    // for pruning => conservatively kept)
    assert(df.where(col("score").isNaN).count() ==
      t.read().where(col("score").isNaN).count())
    assert(df.where(col("score").isNaN).count() == 10)
  }

  test("add/rename cannot alias another field's stored name; unknown writer columns are rejected") {
    val t = evolved("stats-alias")
    val physNote = t.currentSnapshot.schemaFields.find(_.name == "note").get.phys
    intercept[IllegalArgumentException] { t.addColumn(physNote, "string") }
    intercept[IllegalArgumentException] { t.renameColumn("score", physNote) }
    // a stale / typo'd writer column fails fast instead of committing
    // nulls while silently dropping the real values
    val bad = tagged(3L, 5, "w").withColumn("notes", lit("typo"))
    val e = intercept[IllegalArgumentException] { AppendJob.append(t, bad, 1) }
    assert(e.getMessage.contains("notes"))
  }
}
