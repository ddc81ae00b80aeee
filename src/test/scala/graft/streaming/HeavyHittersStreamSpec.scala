package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming Misra–Gries summaries must honor the sketch's
  * guarantees against EXACT counts — no false negatives above the
  * n/(k+1) support bound, and undercount-only counters — whether the
  * tokens arrive in one micro-batch or split across several. (Exact
  * equality across arrivals is NOT an MG property; the guarantee is.)
  */
class HeavyHittersStreamSpec extends SparkSpec {

  private val K = 20
  private val P = 8

  private def tokenRows(): Seq[(Int, String)] = {
    import spark.implicits._
    graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(pmod(hash(col("tok")), lit(P)).cast("int").as("b"), col("tok"))
      .as[(Int, String)].collect().toSeq
  }

  private def runStream(batches: Seq[Seq[(Int, String)]]): Map[(Int, String), (Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Int, String)]
    val q = HeavyHittersStream(input.toDS(), K)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode(HeavyHittersStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // Update mode appends every batch's emission; keep each
      // (bucket, token)'s LAST (lower_count, processed) pair
      spark.table("hh_out").collect().zipWithIndex
        .map { case (r, i) =>
          ((r.getInt(0), r.getString(1)), (r.getLong(2), r.getLong(3)), i) }
        .groupBy(_._1)
        .map { case (key, vs) => key -> vs.maxBy(_._3)._2 }
    } finally q.stop()
  }

  private def checkGuarantees(summary: Map[(Int, String), (Long, Long)],
      rows: Seq[(Int, String)]): Unit = {
    val exact = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val perBucket = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    // 1) a final-summary counter never exceeds the true count
    summary.foreach { case (key, (c, _)) =>
      assert(c <= exact.getOrElse(key, 0L),
        s"$key overcounts: $c > ${exact.getOrElse(key, 0L)}")
    }
    // 2) no false negatives: true count > n_bucket/(K+1) ⇒ present
    val mustHave = exact.filter { case ((b, _), c) => c > perBucket(b) / (K + 1.0) }
    val missing = mustHave.keySet -- summary.keySet
    assert(missing.isEmpty,
      s"${missing.size} heavy hitters missing, e.g. ${missing.take(3)}")
    // non-vacuity: the bound actually selects tokens on this corpus
    assert(mustHave.nonEmpty)
  }

  test("one micro-batch: MG guarantees hold against exact counts") {
    val rows = tokenRows()
    checkGuarantees(runStream(Seq(rows)), rows)
  }

  test("multi-batch arrival: state carries and guarantees still hold") {
    val rows = tokenRows()
    val (a, rest) = rows.splitAt(rows.size / 3)
    val (b, c) = rest.splitAt(rest.size / 3)
    checkGuarantees(runStream(Seq(a, b, c)), rows)
  }
}
