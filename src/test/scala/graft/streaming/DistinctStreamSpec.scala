package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming HLL distinct estimate must be BIT-IDENTICAL to the
  * batch `hll_sketch_estimate(hll_sketch_agg(user_id))` over the same
  * window's rows — same library, same lgK, and HLL state is a pure
  * function of the inserted value set, so arrival order and batch
  * splits cannot move it. Late rows behind the watermark must neither
  * re-open nor re-emit a finalized window.
  */
class DistinctStreamSpec extends SparkSpec {

  import DistinctStream.UserEvent

  private val WindowSec = 60L

  private def ev(sec: Long, uid: Long) = UserEvent(new Timestamp(sec * 1000), uid)

  private def expected(rows: Seq[UserEvent]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    rows.toDS()
      .groupBy(((col("ts").cast("long") / WindowSec).cast("long") * WindowSec * 1000)
        .as("w"))
      .agg(count(lit(1)).as("n"),
        hll_sketch_estimate(hll_sketch_agg(col("userId"))).as("est"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  private def runStream(batches: Seq[Seq[UserEvent]]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = DistinctStream(input.toDS(), WindowSec, "10 seconds")
      .writeStream.format("memory").queryName("dist_out")
      .outputMode(DistinctStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // watermark from batch N drives timeouts during batch N+1
      input.addData(Seq(ev(100000, 1L))); q.processAllAvailable()
      input.addData(Seq(ev(100600, 1L))); q.processAllAvailable()
      spark.table("dist_out").collect()
        .map(r => r.getTimestamp(0).getTime -> (r.getLong(1), r.getLong(2)))
        .toMap
    } finally q.stop()
  }

  // window A [60,120): users 1,2,3 (user 2 twice); window B [120,180): 4..53
  private val windowA = Seq(ev(61, 1L), ev(70, 2L), ev(80, 2L), ev(110, 3L))
  private val windowB = (0 until 50).map(i => ev(125 + (i % 40), 4L + i))

  test("one micro-batch: estimates equal the batch HLL aggregation exactly") {
    val exp = expected(windowA ++ windowB)
    val got = runStream(Seq(windowA ++ windowB))
    for ((w, (n, est)) <- exp) {
      assert(got.contains(w), s"missing window $w")
      assert(got(w)._1 == n, s"window $w events ${got(w)._1} vs $n")
      assert(got(w)._2 == est, s"window $w estimate ${got(w)._2} vs $est")
    }
  }

  test("multi-batch arrival: sketch state carries and the estimate is unchanged") {
    val exp = expected(windowA ++ windowB)
    val got = runStream(Seq(windowA.take(2), windowA.drop(2) ++ windowB.take(10),
      windowB.drop(10)))
    for ((w, (n, est)) <- exp)
      assert(got.get(w).contains((n, est)), s"window $w: ${got.get(w)} vs ($n, $est)")
  }

  test("late row behind the watermark neither re-opens nor re-emits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = DistinctStream(input.toDS(), WindowSec, "10 seconds")
      .writeStream.format("memory").queryName("dist_late")
      .outputMode(DistinctStream.outputMode).start()
    try {
      input.addData(windowA); q.processAllAvailable()
      input.addData(Seq(ev(100000, 9L))); q.processAllAvailable()
      input.addData(Seq(ev(100600, 9L))); q.processAllAvailable()
      input.addData(Seq(ev(75, 99L))); q.processAllAvailable() // late for window A
      input.addData(Seq(ev(101200, 9L))); q.processAllAvailable()
      input.addData(Seq(ev(101800, 9L))); q.processAllAvailable()
      val aRows = spark.table("dist_late").collect()
        .filter(_.getTimestamp(0).getTime == 60000L)
      assert(aRows.length == 1, s"windowA emitted ${aRows.length} times")
      assert(aRows.head.getLong(1) == 4L, s"late row changed windowA: ${aRows.head}")
    } finally q.stop()
  }
}
