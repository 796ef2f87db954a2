package graft.format

import graft.model.DataFileEntry
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import scala.collection.parallel.CollectionConverters._
import scala.jdk.CollectionConverters._

/** Harvests per-file row counts and column min/max stats straight from
  * Parquet footers — no second data scan (the Iceberg approach). At
  * cluster scale this is O(files) tiny metadata reads, parallelized.
  */
object ParquetStats {

  def entryFor(pathStr: String, conf: Configuration): DataFileEntry = {
    val hp = new HPath(pathStr)
    val fs = hp.getFileSystem(conf)
    val size = fs.getFileStatus(hp).getLen
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(hp, conf))
    try {
      val footer = reader.getFooter
      var rows = 0L
      var pbMin = Int.MaxValue; var pbMax = Int.MinValue
      var phMin = Long.MaxValue; var phMax = Long.MinValue
      var idMin: String = null; var idMax: String = null
      footer.getBlocks.asScala.foreach { block =>
        rows += block.getRowCount
        block.getColumns.asScala.foreach { col =>
          val name = col.getPath.toDotString
          val st = col.getStatistics
          if (st != null && !st.isEmpty && st.hasNonNullValue) name match {
            case "pbucket" =>
              pbMin = math.min(pbMin, st.genericGetMin.asInstanceOf[Number].intValue())
              pbMax = math.max(pbMax, st.genericGetMax.asInstanceOf[Number].intValue())
            case "phash" =>
              phMin = math.min(phMin, st.genericGetMin.asInstanceOf[Number].longValue())
              phMax = math.max(phMax, st.genericGetMax.asInstanceOf[Number].longValue())
            case "image_id" =>
              val mn = st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
              val mx = st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
              if (idMin == null || mn < idMin) idMin = mn
              if (idMax == null || mx > idMax) idMax = mx
            case _ =>
          }
        }
      }
      DataFileEntry(
        path = pathStr,
        rowCount = rows,
        byteCount = size,
        pbucketMin = if (pbMin == Int.MaxValue) 0 else pbMin,
        pbucketMax = if (pbMax == Int.MinValue) 0 else pbMax,
        phashMin = phMin,
        phashMax = phMax,
        imageIdMin = if (idMin == null) "" else idMin,
        imageIdMax = if (idMax == null) "" else idMax)
    } finally reader.close()
  }

  /** Footer reads for a batch of files, parallelized on the driver (cheap
    * metadata I/O; at 1000-executor scale this would be a small Spark job
    * over the file list instead). */
  def entriesFor(paths: Seq[String], conf: Configuration): Seq[DataFileEntry] =
    paths.par.map(p => entryFor(p, conf)).seq.sortBy(_.path)

  /** List the part-*.parquet files under a directory (recursive). */
  def listParquet(dir: String, conf: Configuration): Seq[String] = {
    val hp = new HPath(dir)
    val fs = hp.getFileSystem(conf)
    if (!fs.exists(hp)) return Nil
    val it = fs.listFiles(hp, true)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (f.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
        out += f.getPath.toUri.getPath
    }
    out.toSeq.sorted
  }
}
