package graft.queries

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 optimization guard: the restructured q13/q14/q18/q22 plans
  * (explode+groupBy shuffles replaced by row-local array expressions, the
  * duplicated shingle pass fused, the duplicated JSON parse collapsed)
  * must produce BIT-IDENTICAL rows+schema to the round-5 implementations,
  * which the driver's DuckDB oracle proved correct. The legacy
  * implementations are copied here verbatim from the r5 tree; equality is
  * checked with exceptAll in both directions on two scale factors. */
class QueryRewriteEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dirs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")

  // ------------------------------------------------- legacy (r5) helpers
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def tWide(s: SparkSession, dir: String, name: String): DataFrame =
    t(s, dir, name).repartition(s.sparkContext.defaultParallelism)

  private def mdHash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private def shingles(c: Column) = {
    val words = split(c, " ")
    transform(
      sequence(lit(0), greatest(size(words) - 3, lit(0))),
      i => concat_ws(" ", slice(words, i + 1, lit(3))))
  }

  private def bandKey(a: Column, b: Column) =
    mdHash64(concat(a.cast("string"), lit("_"), b.cast("string")))

  private def minhashSigsLegacy(s: SparkSession, dir: String): DataFrame = {
    val d = tWide(s, dir, "documents")
      .select(col("doc_id"), explode(shingles(col("text"))).as("sh"))
    val sigCols = (0 until 8).map(k =>
      min(mdHash64(concat(lit(s"$k:"), col("sh")))).as(s"sig$k"))
    d.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
  }

  private def q13Legacy(s: SparkSession, dir: String): DataFrame = {
    val sig = minhashSigsLegacy(s, dir)
    sig.select(col("doc_id"),
      bandKey(col("sig0"), col("sig1")).as("band0"),
      bandKey(col("sig2"), col("sig3")).as("band1"),
      bandKey(col("sig4"), col("sig5")).as("band2"),
      bandKey(col("sig6"), col("sig7")).as("band3"))
  }

  private def q14Legacy(s: SparkSession, dir: String): DataFrame = {
    val d = tWide(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .withColumn("h", mdHash64(col("word")))
    val bitSums = (0 until 32).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$b")
    }
    val agg = d.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until 32).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("doc_id"), simhash.as("simhash"))
  }

  private def q18Legacy(s: SparkSession, dir: String): DataFrame = {
    val parsed = from_json(col("props"),
      org.apache.spark.sql.types.StructType.fromDDL("k INT"))
    t(s, dir, "events").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k_path"),
      parsed.getField("k").cast("long").as("k_parsed"),
      to_json(struct(col("event_type").as("t"), col("user_id").as("u")))
        .as("payload"))
  }

  private val LshBucketCap = 50

  private def q22Legacy(s: SparkSession, dir: String): DataFrame = {
    val sig = minhashSigsLegacy(s, dir).cache()
    val bands0 = sig.select(col("doc_id"),
      explode(map_from_arrays(
        array(lit(0), lit(1), lit(2), lit(3)),
        array(bandKey(col("sig0"), col("sig1")), bandKey(col("sig2"), col("sig3")),
          bandKey(col("sig4"), col("sig5")), bandKey(col("sig6"), col("sig7")))))
        .as(Seq("band", "bkey")))
    val okBuckets = bands0.groupBy("band", "bkey")
      .agg(count(lit(1)).as("bsz"))
      .where(col("bsz") <= LshBucketCap)
      .select("band", "bkey")
    val bands = bands0.join(okBuckets, Seq("band", "bkey"))
    val a = bands.as("a"); val b = bands.as("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_bands"))
    val sa = sig.toDF(sig.columns.map(_ + "_a").toIndexedSeq: _*)
    val sb = sig.toDF(sig.columns.map(_ + "_b").toIndexedSeq: _*)
    val simSigs = (0 until 8).map(k =>
      when(col(s"sig${k}_a") === col(s"sig${k}_b"), 1).otherwise(0))
      .reduce(_ + _)
    val sets = tWide(s, dir, "documents")
      .select(col("doc_id"), explode(shingles(col("text"))).as("sh"))
      .groupBy("doc_id").agg(collect_set("sh").as("ss"))
    val setsA = sets.toDF("sd_a", "ss_a")
    val setsB = sets.toDF("sd_b", "ss_b")
    val inter = size(array_intersect(col("ss_a"), col("ss_b")))
    val jac100 = inter * 100 / (size(col("ss_a")) + size(col("ss_b")) - inter)
    cand
      .join(sa, col("doc_a") === col("doc_id_a"))
      .join(sb, col("doc_b") === col("doc_id_b"))
      .join(setsA, col("doc_a") === col("sd_a"))
      .join(setsB, col("doc_b") === col("sd_b"))
      .select(col("doc_a"), col("doc_b"), col("n_bands"),
        simSigs.cast("int").as("sim_sigs"),
        jac100.cast("int").as("jaccard100"),
        (jac100 >= 50).cast("int").as("is_dup"))
  }

  // ------------------------------------------------------------ the gate
  private def assertSame(name: String, now: DataFrame, legacy: DataFrame): Unit = {
    assert(now.schema.map(f => (f.name, f.dataType)) ==
      legacy.schema.map(f => (f.name, f.dataType)),
      s"$name: schema drifted")
    val n = now.cache(); val l = legacy.cache()
    try {
      assert(n.count() == l.count(), s"$name: row count drifted")
      assert(n.exceptAll(l).isEmpty, s"$name: new rows not in legacy result")
      assert(l.exceptAll(n).isEmpty, s"$name: legacy rows missing from new result")
    } finally { n.unpersist(); l.unpersist() }
  }

  for (dir <- dirs) {
    val sf = dir.substring(dir.lastIndexOf('/') + 1)
    test(s"q13 minhash band keys: row-local sigs == exploded groupBy ($sf)") {
      assertSame("q13", Queries.q13MinhashLsh(spark, dir), q13Legacy(spark, dir))
    }
    test(s"q14 simhash: row-local bit fold == exploded groupBy ($sf)") {
      assertSame("q14", Queries.q14SimHash(spark, dir), q14Legacy(spark, dir))
    }
    test(s"q18 json payload: single parse == from_json + path pair ($sf)") {
      assertSame("q18", Queries.q18JsonPayload(spark, dir), q18Legacy(spark, dir))
    }
    test(s"q22 lsh pairs: fused single-pass == two-pass legacy ($sf)") {
      assertSame("q22", Queries.q22LshPairs(spark, dir), q22Legacy(spark, dir))
    }
  }
}
