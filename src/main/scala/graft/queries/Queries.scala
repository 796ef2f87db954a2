package graft.queries

import graft.expr.zfunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-checked query pack: each entry has a Spark implementation and
  * (where SQL-expressible) a DuckDB oracle over the same parquet tables.
  *
  * These exercise, on the generic testdata, the same operator classes the
  * maintenance engine uses internally — manifest-stats aggregation,
  * pruned scans, semi/anti joins (expired-file computation), the
  * MERGE-shaped full-outer upsert, the Z-order key expression, bin-pack
  * planning, last-writer-wins dedup — plus training-data-pipeline ops
  * (exact dedup, token/quality stats, language heuristics, MinHash,
  * SimHash, brute-force cosine kNN).
  *
  * Column names/types are aligned with the oracle SQL exactly (the driver
  * hash-compares by sorted column name). Floating aggregates are rounded
  * on both sides.
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // ---------------------------------------------------------------- q01
  /** Manifest-stats shaped aggregation (SURVEY §2.5): per-group count,
    * sums, min/max — the exact shape of per-file stats harvesting. */
  def q01ManifestStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").groupBy("l_returnflag", "l_linestatus").agg(
      count(lit(1)).as("n_rows"),
      round(sum("l_quantity"), 2).as("sum_qty"),
      round(sum("l_extendedprice"), 2).as("sum_price"),
      min("l_orderkey").as("min_ok"),
      max("l_orderkey").as("max_ok"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
      |ROUND(SUM(l_quantity),2) AS sum_qty,
      |ROUND(SUM(l_extendedprice),2) AS sum_price,
      |MIN(l_orderkey) AS min_ok, MAX(l_orderkey) AS max_ok
      |FROM lineitem GROUP BY 1,2""".stripMargin

  // ---------------------------------------------------------------- q02
  /** Predicate-pruned scan + revenue agg (partition-pruning analogue). */
  def q02PrunedScan(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))

  val q02Sql: String =
    """SELECT l_returnflag, COUNT(*) AS n_rows,
      |ROUND(SUM(l_extendedprice*(1.0-l_discount)),2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01'
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q03
  /** Left-semi join: customers that have orders (EXISTS). */
  def q03SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
  }

  val q03Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q04
  /** Left-anti join: parts with no recent shipment (the expired/orphan-
    * file computation shape, SURVEY §2.6). */
  def q04AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    val l = t(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit("2001-06-01").cast("timestamp"))
    p.join(l, p("p_partkey") === l("l_partkey"), "left_anti")
      .groupBy("p_brand").agg(count(lit(1)).as("n_parts"))
  }

  val q04Sql: String =
    """SELECT p_brand, COUNT(*) AS n_parts FROM part p
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
      |  WHERE l.l_partkey = p.p_partkey
      |    AND l.l_shipdate >= TIMESTAMP '2001-06-01')
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q05
  /** MERGE-shaped upsert: full-outer join + coalesce (MATCHED => update,
    * NOT MATCHED => insert) — the logical plan under MergeJob. */
  def q05MergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "orders").groupBy("o_custkey").agg(
      count(lit(1)).as("order_cnt"),
      round(sum("o_totalprice"), 2).as("total_spend"))
    val tgt = t(s, dir, "customer")
    tgt.join(src, tgt("c_custkey") === src("o_custkey"), "full_outer")
      .select(
        coalesce(tgt("c_custkey"), src("o_custkey")).as("custkey"),
        coalesce(col("order_cnt"), lit(0L)).as("order_cnt"),
        round(coalesce(col("total_spend"), lit(0.0)), 2).as("total_spend"),
        round(coalesce(col("c_acctbal"), lit(0.0)), 2).as("acctbal"))
  }

  val q05Sql: String =
    """WITH src AS (
      |  SELECT o_custkey, COUNT(*) AS order_cnt,
      |         ROUND(SUM(o_totalprice),2) AS total_spend
      |  FROM orders GROUP BY 1)
      |SELECT COALESCE(c.c_custkey, s.o_custkey) AS custkey,
      |       COALESCE(s.order_cnt, 0) AS order_cnt,
      |       ROUND(COALESCE(s.total_spend, 0.0),2) AS total_spend,
      |       ROUND(COALESCE(c.c_acctbal, 0.0),2) AS acctbal
      |FROM customer c FULL OUTER JOIN src s ON c.c_custkey = s.o_custkey""".stripMargin

  // ---------------------------------------------------------------- q06
  /** The custom Catalyst Z-order expression over 3 key columns; oracle is
    * the bit-interleave unrolled into portable SQL. */
  def q06ZOrderKey(s: SparkSession, dir: String): DataFrame = {
    val m = lit(1L << 21)
    t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      zfunctions.zorder_key(
        pmod(col("l_partkey"), m), pmod(col("l_suppkey"), m),
        pmod(col("l_orderkey"), m)).as("zkey"))
  }

  val q06Sql: String = {
    val terms = for {
      i <- 0 until 21
      (k, j) <- Seq("a" -> 0, "b" -> 1, "c" -> 2)
    } yield s"((($k >> $i) & 1) << ${3 * i + j})"
    s"""SELECT l_orderkey, l_linenumber, ${terms.mkString(" | ")} AS zkey
       |FROM (SELECT l_orderkey, l_linenumber,
       |  (l_partkey % 2097152) AS a, (l_suppkey % 2097152) AS b,
       |  (l_orderkey % 2097152) AS c FROM lineitem)""".stripMargin
  }

  // ---------------------------------------------------------------- q07
  /** Bin-packing plan as a query: cumulative-bytes window => bin id
    * (CompactJob's planner expressed relationally). */
  def q07BinpackPlan(s: SparkSession, dir: String): DataFrame = {
    val files = t(s, dir, "lineitem").groupBy("l_partkey")
      .agg(sum((col("l_quantity") * 100).cast("long")).as("bytes"))
    val w = Window.orderBy("l_partkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files.select(
      col("l_partkey").as("file_id"), col("bytes"),
      floor((sum("bytes").over(w) - col("bytes")).cast("double") / lit(50000.0))
        .cast("long").as("bin"))
  }

  val q07Sql: String =
    """WITH files AS (
      |  SELECT l_partkey AS file_id,
      |         CAST(SUM(CAST(l_quantity*100 AS BIGINT)) AS BIGINT) AS bytes
      |  FROM lineitem GROUP BY 1)
      |SELECT file_id, bytes,
      |  CAST(FLOOR(CAST(SUM(bytes) OVER (ORDER BY file_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bytes AS DOUBLE)
      |    / 50000.0) AS BIGINT) AS bin
      |FROM files""".stripMargin

  // ---------------------------------------------------------------- q08
  /** Exact deduplication by content hash (hash-groupBy dedup). */
  def q08DedupExact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))

  val q08Sql: String =
    """SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper,
      |COUNT(*) AS n_copies FROM documents GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q09
  /** Token counting + per-language stats (text analysis). */
  def q09TokenStats(s: SparkSession, dir: String): DataFrame = {
    val tokens = length(col("text")) - length(replace(col("text"), lit(" "), lit(""))) + lit(1)
    t(s, dir, "documents").groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum("n_chars").cast("long").as("sum_chars"),
      round(avg(tokens), 2).as("avg_tokens"))
  }

  val q09Sql: String =
    """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |ROUND(AVG(length(text) - length(replace(text,' ','')) + 1),2) AS avg_tokens
      |FROM documents GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q10
  /** Per-document quality scoring (length/word-shape heuristics). */
  def q10QualityScore(s: SparkSession, dir: String): DataFrame = {
    val nonspace = length(replace(col("text"), lit(" "), lit("")))
    val tokens = length(col("text")) - nonspace + lit(1)
    // integer division (x100) instead of round(): exact in both engines —
    // round() on doubles disagrees between half-up and half-even
    t(s, dir, "documents").select(
      col("doc_id"),
      tokens.cast("long").as("tokens"),
      expr("CAST(length(replace(text,' ','')) AS BIGINT) * 100 div " +
        "(length(text) - length(replace(text,' ','')) + 1)").as("avg_word_len_x100"),
      when(tokens.between(30, 300), lit(1)).otherwise(lit(0)).as("quality_ok"))
  }

  val q10Sql: String =
    """SELECT doc_id,
      |CAST(length(text) - length(replace(text,' ','')) + 1 AS BIGINT) AS tokens,
      |CAST(length(replace(text,' ','')) AS BIGINT) * 100
      |  // (length(text) - length(replace(text,' ','')) + 1) AS avg_word_len_x100,
      |CASE WHEN (length(text) - length(replace(text,' ','')) + 1) BETWEEN 30 AND 300
      |  THEN 1 ELSE 0 END AS quality_ok
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Last-writer-wins dedup via window row_number (the MERGE-source
    * multiple-corrections-per-key resolution, SURVEY §2.6). */
  def q11LastWins(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, dir, "events").withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("user_id", "event_id", "event_type")
  }

  val q11Sql: String =
    """SELECT user_id, event_id, event_type FROM events
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
      |  ORDER BY ts DESC, event_id DESC) = 1""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Brute-force cosine top-k over the embedding column (ANN baseline):
    * broadcast the query vector, codegen'd zip_with/aggregate dot. */
  def q12KnnCosine(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.where(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>").as("qv"))
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val ed = col("embedding").cast("array<double>")
    e.crossJoin(broadcast(q))
      .where(col("vec_id") =!= 0)
      .select(col("vec_id"),
        round(dot(ed, col("qv")) / (sqrt(dot(ed, ed)) * sqrt(dot(col("qv"), col("qv")))), 4)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(20)
  }

  val q12Sql: String =
    """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id,
      |  ROUND(list_inner_product(CAST(e.embedding AS DOUBLE[]), q.qv)
      |    / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
      |       * sqrt(list_inner_product(q.qv, q.qv))), 4) AS cosine
      |FROM embeddings e, q WHERE e.vec_id <> 0
      |ORDER BY cosine DESC, vec_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q13
  /** MinHash signatures + LSH band keys per document (near-dup dedup
    * plumbing; no SQL oracle — Spark's xxhash64 is engine-specific). */
  def q13MinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    val shingles = transform(
      sequence(lit(0), greatest(size(words) - 3, lit(0))),
      i => concat_ws(" ", slice(words, i + 1, lit(3))))
    val d = t(s, dir, "documents")
      .select(col("doc_id"), explode(shingles).as("sh"))
    val sigCols = (0 until 8).map(k => min(xxhash64(lit(k), col("sh"))).as(s"sig$k"))
    val sig = d.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    sig.select(col("doc_id"),
      xxhash64(col("sig0"), col("sig1")).as("band0"),
      xxhash64(col("sig2"), col("sig3")).as("band1"),
      xxhash64(col("sig4"), col("sig5")).as("band2"),
      xxhash64(col("sig6"), col("sig7")).as("band3"))
  }

  // ---------------------------------------------------------------- q14
  /** SimHash (32-bit) per document via word-hash bit majority. */
  def q14SimHash(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .withColumn("h", xxhash64(col("word")))
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

  // ---------------------------------------------------------------- q15
  /** N-gram-heuristic language scoring: occurrence counts of marker
    * tokens (language-ID shape; data is synthetic so markers are from
    * the shared wordlist). */
  def q15LangHeuristic(s: SparkSession, dir: String): DataFrame = {
    def occurrences(word: String) =
      ((length(col("text")) - length(replace(col("text"), lit(word), lit("")))) /
        lit(word.length)).cast("long")
    t(s, dir, "documents").select(
      col("doc_id"), col("lang"),
      occurrences("the").as("n_the"),
      occurrences("table").as("n_table"),
      occurrences("query").as("n_query"))
  }

  val q15Sql: String =
    """SELECT doc_id, lang,
      |CAST((length(text) - length(replace(text,'the',''))) / 3 AS BIGINT) AS n_the,
      |CAST((length(text) - length(replace(text,'table',''))) / 5 AS BIGINT) AS n_table,
      |CAST((length(text) - length(replace(text,'query',''))) / 5 AS BIGINT) AS n_query
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- q16
  /** IVF-style bucketed approximate kNN: coarse-quantize vectors into
    * sign-bit cells (first 3 dims), search only the query's cell — the
    * scale path next to q12's brute force. At 10^9+ vectors the cell
    * column is a table partition key and the probe prunes all other
    * cells via manifest stats. */
  def q16KnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    def cell(c: org.apache.spark.sql.Column) =
      (when(element_at(c, 1) > 0f, 4).otherwise(0) +
        when(element_at(c, 2) > 0f, 2).otherwise(0) +
        when(element_at(c, 3) > 0f, 1).otherwise(0)).cast("int")
    val q = e.where(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>").as("qv"),
        cell(col("embedding")).as("qcell"))
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val ed = col("embedding").cast("array<double>")
    e.withColumn("cell", cell(col("embedding")))
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= 0 && col("cell") === col("qcell"))
      .select(col("vec_id"), col("cell"),
        round(dot(ed, col("qv")) / (sqrt(dot(ed, ed)) * sqrt(dot(col("qv"), col("qv")))), 4)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
  }

  val q16Sql: String =
    """WITH q AS (
      |  SELECT CAST(embedding AS DOUBLE[]) AS qv,
      |    (CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END +
      |     CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END +
      |     CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END) AS qcell
      |  FROM embeddings WHERE vec_id = 0)
      |SELECT e.vec_id,
      |  (CASE WHEN e.embedding[1] > 0 THEN 4 ELSE 0 END +
      |   CASE WHEN e.embedding[2] > 0 THEN 2 ELSE 0 END +
      |   CASE WHEN e.embedding[3] > 0 THEN 1 ELSE 0 END) AS cell,
      |  ROUND(list_inner_product(CAST(e.embedding AS DOUBLE[]), q.qv)
      |    / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
      |       * sqrt(list_inner_product(q.qv, q.qv))), 4) AS cosine
      |FROM embeddings e, q
      |WHERE e.vec_id <> 0
      |  AND (CASE WHEN e.embedding[1] > 0 THEN 4 ELSE 0 END +
      |       CASE WHEN e.embedding[2] > 0 THEN 2 ELSE 0 END +
      |       CASE WHEN e.embedding[3] > 0 THEN 1 ELSE 0 END) = q.qcell
      |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q17
  /** Hilbert-curve key (the Z-order alternative) over the same keys as
    * q06 — rows-only check (the Skilling transform has no concise ANSI
    * SQL form). */
  def q17HilbertKey(s: SparkSession, dir: String): DataFrame = {
    val m = lit(1L << 21)
    t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      graft.expr.zfunctions.hilbert_key(
        pmod(col("l_partkey"), m), pmod(col("l_suppkey"), m),
        pmod(col("l_orderkey"), m)).as("hkey"))
  }

  // ---------------------------------------------------------------- m2
  /** Multimodal pipeline over a synthesized image table: decode, validate
    * metadata, thumbnail to 8x8, extract a mean-RGB feature, recompute
    * the pHash fingerprint. Rows-only (operates on the engine's own
    * synthetic table, not the shared testdata). */
  def m2ImageFeatures(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ImageFunctions._
    val imgs = graft.synth.DataGen.generate(s, 200, 42L, 4).toDF()
    imgs.select(
      col("image_id"), col("w"), col("h"), col("fmt"),
      decodeDims(col("bytes")).as("decoded"),
      length(thumbnail(col("bytes"), lit(8))).as("thumb_bytes"),
      round(element_at(meanRgb(col("bytes")), 1), 2).as("mean_r"),
      phashOf(col("bytes")).as("phash2"),
      col("phash"))
      .withColumn("dims_match",
        (col("decoded._1") === col("w") && col("decoded._2") === col("h")).cast("int"))
      .withColumn("phash_match", (col("phash2") === col("phash")).cast("int"))
      .drop("decoded")
  }

  // ------------------------------------------------------------ registry

  val withOracle: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q01_manifest_stats" -> ((q01ManifestStats _, q01Sql)),
    "q02_pruned_scan" -> ((q02PrunedScan _, q02Sql)),
    "q03_semi_join" -> ((q03SemiJoin _, q03Sql)),
    "q04_anti_join" -> ((q04AntiJoin _, q04Sql)),
    "q05_merge_upsert" -> ((q05MergeUpsert _, q05Sql)),
    "q06_zorder_key" -> ((q06ZOrderKey _, q06Sql)),
    "q07_binpack_plan" -> ((q07BinpackPlan _, q07Sql)),
    "q08_dedup_exact" -> ((q08DedupExact _, q08Sql)),
    "q09_token_stats" -> ((q09TokenStats _, q09Sql)),
    "q10_quality_score" -> ((q10QualityScore _, q10Sql)),
    "q11_lastwins_dedup" -> ((q11LastWins _, q11Sql)),
    "q12_knn_cosine" -> ((q12KnnCosine _, q12Sql)),
    "q15_lang_heuristic" -> ((q15LangHeuristic _, q15Sql)),
    "q16_knn_ivf" -> ((q16KnnIvf _, q16Sql)))

  val withoutOracle: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_minhash_lsh" -> (q13MinhashLsh _),
    "q14_simhash" -> (q14SimHash _),
    "q17_hilbert_key" -> (q17HilbertKey _),
    "m2_image_features" -> (m2ImageFeatures _))
}
