// Upsert-vs-MOR-merge A/B (see NOTES.md "scan-free claim, measured").
// Run: /opt/spark/bin/spark-shell --master 'local[8]' --driver-memory 8g \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.adaptive.enabled=true \
//   --jars target/scala-2.13/quanterrapipelinespark_2.13-0.1.0.jar -i BENCH/ab_upsert.scala
// Clean /dev/shm/ab_* between runs. Each batch lands as parquet first and
// each job reads its OWN copy: sharing one cached frame lets MergeJob's
// source.unpersist() silently re-materialize the generator inside the
// second job's timed window (the pitfall documented in NOTES.md).
import graft.format.QTable
import graft.jobs._
import graft.synth.DataGen
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("WARN")
def ab(tag: String, rows: Long, fpb: Int, pm: String, pu: String): Unit = {
  def mk(p: String) = { val t = QTable.create(p, spark, 32); AppendJob.append(t, DataGen.generate(spark, rows, 42L).toDF(), fpb); t }
  val tm = mk(pm); val tu = mk(pu)
  val nFiles = tm.entries(tm.currentSnapshot).size
  val sets = tm.storedSchema.fieldNames.toSeq.filterNot(c => c == "image_id" || c == "pbucket")
  for (i <- 1 to 3) {
    // batch lands as parquet first (the realistic CDC source shape); each
    // job reads its own copy - no shared-cache interference
    val srcDir = s"/dev/shm/ab_src_${tag}_$i"
    DataGen.generate(spark, rows, 42L).toDF()
      .where(pmod(xxhash64(col("image_id"), lit(i)), lit(100)) === 0)
      .withColumn("caption", concat(lit(s"b$i: "), col("image_id")))
      .write.mode("overwrite").parquet(srcDir)
    val n = spark.read.parquet(srcDir).count()
    var t0 = System.nanoTime()
    new MergeJob(tm, updateCols = sets, mergeOnRead = true).run(spark.read.parquet(srcDir))
    val tMor = (System.nanoTime()-t0)/1e9
    t0 = System.nanoTime()
    new UpsertJob(tu).run(spark.read.parquet(srcDir))
    val tEq = (System.nanoTime()-t0)/1e9
    println(f"AB $tag files=$nFiles batch$i rows=$n mor=$tMor%.2f s eq=$tEq%.2f s")
  }
}
ab("100k", 100000L, 8, "/dev/shm/ab_mor", "/dev/shm/ab_eq")
ab("200kx32", 200000L, 32, "/dev/shm/ab2_mor", "/dev/shm/ab2_eq")
sys.exit(0)
