package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance primitive a 100 TB
  * pipeline runs continuously: streaming/incremental writers emit
  * many small files, and scan throughput collapses when the file count
  * dwarfs the executor count (per-file open cost, tiny row groups, no
  * effective column-chunk IO).
  *
  * Strategy: size the output file count from the INPUT BYTES (not row
  * counts — row width varies), then `coalesce` down to it: coalesce
  * merges partitions without a shuffle, so compaction is a pure
  * read-concat-write at scan speed. `repartition` (full shuffle) is
  * deliberately avoided — rebalancing content across files is a
  * different, far more expensive operation than packing files, and at
  * compaction's typical cadence the shuffle would dominate the
  * pipeline's write amplification.
  *
  * The write also sets `maxRecordsPerFile` as a guard: if the caller's
  * target implies fewer partitions than the data's natural row skew
  * supports, no single output file balloons past roughly twice the
  * target (row-count proxy derived from the observed average row
  * size).
  */
object Compaction {

  final case class Result(
      filesBefore: Int, bytesBefore: Long, filesAfter: Int, bytesAfter: Long)

  private def parquetFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    // Recursive walk: spark.read.parquet(dir) reads nested/partitioned
    // layouts, so the byte sizing must see the same files — a top-level
    // listing on a partitioned table would report 0 bytes and disable
    // both the output-count sizing and the maxRecordsPerFile guard.
    val it = fs.listFiles(p, true)
    val buf = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && s.getPath.getName.endsWith(".parquet"))
        buf += ((s.getPath.toString, s.getLen))
    }
    buf.result()
  }

  /** Rewrites `inDir`'s parquet files into `outDir` packed to
    * ~`targetBytes` per file. Returns before/after file stats.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): Result = {
    require(targetBytes > 0, "targetBytes must be positive")
    val before = parquetFiles(spark, inDir)
    val totalBytes = before.map(_._2).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inDir)
    val rows = df.count()
    // rows-per-file guard from the observed average row size; 0 rows →
    // no guard needed (empty write). Divide BEFORE multiplying:
    // 2*targetBytes*rows overflows Long at exactly the table sizes
    // this module exists for (1 GiB target × ~4.3e9 rows), and Spark
    // silently ignores a non-positive maxRecordsPerFile.
    val maxRecords =
      if (rows == 0 || totalBytes == 0) Long.MaxValue
      else {
        val avgRowBytes = math.max(1L, totalBytes / rows)
        math.max(1L, 2L * targetBytes / avgRowBytes)
      }
    df.coalesce(nOut)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecords)
      .parquet(outDir)
    val after = parquetFiles(spark, outDir)
    Result(before.size, totalBytes, after.size, after.map(_._2).sum)
  }
}
