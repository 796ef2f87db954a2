package graft.format

import org.apache.parquet.column.values.bloomfilter.{BlockSplitBloomFilter, BloomFilter}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.BlockMetaData
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.{DataFrame, Row}

import scala.jdk.CollectionConverters._

/** Per-file Bloom filters on `image_id`, carried in manifest entries
  * ([[graft.model.DataFileEntry.idBlooms]]) and tested by
  * [[QTableFileIndex]] for id-equality predicates.
  *
  * Why: min/max id ranges prune point lookups well on freshly appended
  * (id-ordered) files, but a Z-order/Hilbert-clustered file is sorted by
  * zkey and spans most of the id domain — after maintenance, range stats
  * keep nearly every file in the lookup's bucket. A ~5 KB bloom per file
  * restores precise skipping, and because it rides IN the manifest, a
  * point lookup over a 10^12-row table stays pure in-memory metadata
  * work: zero file opens for pruned files (Iceberg reaches the same
  * point with puffin sidecars; inline is simpler at our entry sizes and
  * read on the driver only for the id-equality branch).
  *
  * Where the bits come from — no extra data scan, both paths read only
  * footer-adjacent metadata during the existing stats harvest:
  *  1. the file's OWN parquet bloom, written inline by the writer
  *     ([[TableWrite]] enables `parquet.bloom.filter.enabled#image_id`);
  *  2. parquet-mr deliberately SKIPS writing a bloom for a chunk whose
  *     pages are all dictionary-encoded (the dictionary already
  *     enumerates the distinct values) — typical for small early-life
  *     files — so the harvest rebuilds an equivalent bloom FROM the
  *     dictionary page. A chunk with non-dictionary pages and no bloom
  *     yields nothing (unknown = never pruned, sound).
  *
  * False positives only cost a wasted file read; false negatives are
  * impossible (membership of every written value is guaranteed by the
  * writer / the dictionary), so pruning is always sound.
  */
object BloomIndex {

  /** FPP for dictionary-rebuilt blooms; the writer-side parquet default
    * is also 0.01. */
  private val Fpp = 0.01

  /** Harvest the base64 bloom for one row group's image_id chunk, or None
    * when neither source is available. `reader` must be the open reader
    * the footer came from. */
  def harvest(reader: ParquetFileReader, block: BlockMetaData): Option[String] = {
    val col = block.getColumns.asScala.find(_.getPath.toDotString == "image_id")
      .getOrElse(return None)
    val own = Option(reader.getBloomFilterDataReader(block))
      .flatMap(r => Option(r.readBloomFilter(col)))
    val bf = own.orElse {
      val stats = col.getEncodingStats
      if (stats == null || stats.hasNonDictionaryEncodedPages) None
      else {
        // upcast: the concrete reader class is package-private, the
        // page-store interface is the public surface
        val store: org.apache.parquet.column.page.DictionaryPageReadStore =
          reader.getDictionaryReader(block)
        Option(store).flatMap { s =>
        val desc = reader.getFileMetaData.getSchema.getColumns.asScala
          .find(_.getPath.mkString(".") == "image_id")
        desc.flatMap(d => Option(s.readDictionaryPage(d)).map { page =>
          val dict = page.getEncoding.initDictionary(d, page)
          val n = dict.getMaxId + 1
          val filter = new BlockSplitBloomFilter(
            BlockSplitBloomFilter.optimalNumOfBits(n.toLong.max(1L), Fpp) / 8)
          var i = 0
          while (i <= dict.getMaxId) {
            filter.insertHash(filter.hash(dict.decodeToBinary(i)))
            i += 1
          }
          filter: BloomFilter
        })
        }
      }
    }
    bf.map { b =>
      val bos = new java.io.ByteArrayOutputStream(b.getBitsetSize)
      b.writeTo(bos)
      java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
    }
  }

  def decode(b64: String): BlockSplitBloomFilter =
    new BlockSplitBloomFilter(java.util.Base64.getDecoder.decode(b64))

  def mightContain(filter: BloomFilter, id: String): Boolean =
    filter.findHash(filter.hash(Binary.fromString(id)))
}

/** The one data-file write path: every job funnels here so table files
  * uniformly carry the image_id bloom (sized by `spark.graft.bloom.ndv`,
  * default 4096 ≈ rows in a target-sized file — an UNDERestimate only
  * raises the false-positive rate, never unsounds pruning; disable with
  * `spark.graft.bloom.enabled=false`, or env `GRAFT_BLOOM_OFF=1` for
  * A/B bench runs that cannot thread a conf). Measured free at bench
  * scale: 100k-row/64-file write and harvest times are identical with
  * and without the bloom (BENCH/NOTES.md round-4 addendum). */
object TableWrite {
  private val tsKey = "spark.sql.parquet.outputTimestampType"

  /** Per-session in-flight write count + the pre-engine conf value.
    * CompactJob/MergeJob/UpdateJob run group writes CONCURRENTLY
    * (GroupRunner, default concurrency 4): a naive per-write
    * save/restore lets one thread's finally-restore unset the key while
    * another write is in flight — that write falls back to INT96 and
    * emits timestamp columns with no usable stats, silently blinding
    * the footer harvest and days(ts) pruning (r5 advice fix). The first
    * writer in records the original value and sets TIMESTAMP_MICROS;
    * the last writer out restores — no restore can ever run while a
    * sibling write is in flight. Keyed weakly by session so short-lived
    * job sessions do not accumulate. */
  private val inFlight =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      (Array[Int], Option[String])]()

  private def enterTs(s: org.apache.spark.sql.SparkSession): Unit =
    inFlight.synchronized {
      val st = Option(inFlight.get(s)).getOrElse {
        val fresh = (Array(0), s.conf.getOption(tsKey))
        inFlight.put(s, fresh); fresh
      }
      if (st._1(0) == 0) s.conf.set(tsKey, "TIMESTAMP_MICROS")
      st._1(0) += 1
    }

  private def exitTs(s: org.apache.spark.sql.SparkSession): Unit =
    inFlight.synchronized {
      Option(inFlight.get(s)).foreach { st =>
        st._1(0) -= 1
        if (st._1(0) <= 0) {
          st._2 match {
            case Some(v) => s.conf.set(tsKey, v)
            case None => s.conf.unset(tsKey)
          }
          inFlight.remove(s)
        }
      }
    }

  def parquet(df: DataFrame, dir: String): Unit = {
    val conf = df.sparkSession.conf
    // the engine's files store timestamps as INT64 micros, never the
    // legacy INT96: parquet-mr writes NO usable stats for INT96, which
    // would blind the footer harvest — and with it stats skipping and
    // the days(ts) partition pruning — on any timestamp column. Session
    // conf (no per-write option exists); reference-counted set/restore
    // (see [[enterTs]]), and rewrites of old INT96 files migrate them
    // to micros.
    enterTs(df.sparkSession)
    try {
      var w = df.write
      if (conf.get("spark.graft.bloom.enabled", "true").toBoolean &&
          !sys.env.get("GRAFT_BLOOM_OFF").contains("1"))
        w = w.option("parquet.bloom.filter.enabled#image_id", "true")
          .option("parquet.bloom.filter.expected.ndv#image_id",
            conf.get("spark.graft.bloom.ndv", "4096"))
      // zstd effort dial (`spark.graft.parquet.zstd.level`, env
      // GRAFT_ZSTD_LEVEL for A/B runs; default 1): parquet-mr's default
      // level 3 spends compression search on the fat `bytes` column,
      // which holds ALREADY-COMPRESSED image payloads where no level
      // finds anything — measured on the 1.1 GiB bench table, level 1
      // cuts compact write wall ~8-12% for +1.8% output size
      // (OPTIMIZATION_r06.md, guide §6). Deployments with compressible
      // payloads can raise it per-table economics via the conf.
      val zl = sys.env.get("GRAFT_ZSTD_LEVEL")
        .orElse(conf.getOption("spark.graft.parquet.zstd.level"))
        .getOrElse("1")
      w = w.option("parquet.compression.codec.zstd.level", zl)
      w.parquet(dir)
    } finally exitTs(df.sparkSession)
  }
}
