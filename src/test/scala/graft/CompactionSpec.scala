package graft

import java.nio.file.Files

import graft.sources.Compaction

/** Compaction packs a many-small-files table into ~target-sized files
  * without losing or reordering-away any data.
  */
class CompactionSpec extends SparkSpec {

  private def tmp(name: String) =
    Files.createTempDirectory(s"graft-compact-$name").toString

  test("packs 64 small files down to the byte-sized count, data intact") {
    val in = tmp("in"); val out = tmp("out")
    val src = Tables(spark, "/root/testdata/sf0.01", "documents")
    src.repartition(64).write.mode("overwrite").parquet(in)

    val inFiles = new java.io.File(in).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(inFiles == 64)

    val totalBytes = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val res = Compaction.compactParquet(spark, in, out, totalBytes / 4)

    assert(res.filesBefore == 64)
    assert(res.filesAfter <= 6, s"expected ≤6 files, got ${res.filesAfter}")
    assert(res.filesAfter >= 4, s"expected ≥4 files, got ${res.filesAfter}")

    // content identical (same rows, not just same count)
    val a = spark.read.parquet(in).orderBy("doc_id").collect()
    val b = spark.read.parquet(out).orderBy("doc_id").collect()
    assert(a.length == b.length && a.sameElements(b))
  }

  test("already-compact input stays a single file; empty target guard") {
    val in = tmp("one"); val out = tmp("oneout")
    Tables(spark, "/root/testdata/sf0.01", "region")
      .coalesce(1).write.mode("overwrite").parquet(in)
    val res = Compaction.compactParquet(spark, in, out, 1L << 30)
    assert(res.filesBefore == 1 && res.filesAfter == 1)
    assert(spark.read.parquet(out).count() ==
      spark.read.parquet(in).count())
  }
}
