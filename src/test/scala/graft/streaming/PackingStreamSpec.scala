package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming packer must produce EXACTLY the batch
  * q_sequence_packing result — same recurrence, window-close rule, and
  * per-shard doc order — whether each shard's docs arrive in one
  * micro-batch or split across several in doc_id order (the
  * KalmanStreamSpec parity contract, for the open-window state).
  */
class PackingStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def batchRows(): Seq[(String, Long, Long)] = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        least(size(graft.functions.TextFunctions.tokens(col("text"))),
          lit(512)).cast("long").as("l"))
      .as[(String, Long, Long)]
      .collect().toSeq.sortBy(_._2)
  }

  private def expected(): Map[String, (Long, Long, Long, Long)] =
    SparkEntry.queries("q_sequence_packing")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getAs[Long]("waste_tokens")))
      .toMap

  private def runStream(batches: Seq[Seq[(String, Long, Long)]])
      : Map[String, (Long, Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val q = PackingStream(input.toDS())
      .writeStream.format("memory").queryName("pack_out")
      .outputMode(PackingStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("pack_out")
        .collect()
        .zipWithIndex
        .map { case (r, i) =>
          (r.getString(0),
            (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)), i) }
        .groupBy(_._1)
        .map { case (k, vs) => k -> vs.maxBy(_._3)._2 }
    } finally q.stop()
  }

  private def assertParity(got: Map[String, (Long, Long, Long, Long)]): Unit = {
    val exp = expected()
    assert(got.keySet == exp.keySet)
    for ((k, e) <- exp)
      assert(got(k) == e, s"shard $k: ${got(k)} vs $e")
  }

  test("one micro-batch reproduces the batch q_sequence_packing exactly") {
    assertParity(runStream(Seq(batchRows())))
  }

  test("doc-ordered multi-batch arrival carries the open window to the same result") {
    val rows = batchRows()
    val cut1 = rows.size / 3
    val cut2 = 2 * rows.size / 3
    assertParity(runStream(Seq(
      rows.slice(0, cut1), rows.slice(cut1, cut2), rows.slice(cut2, rows.size))))
  }
}
