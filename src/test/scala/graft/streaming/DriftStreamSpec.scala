package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming drift monitor must emit exactly one JSD row per
  * finalized window, equal to a BATCH recomputation over the same
  * rows (independent grouping machinery, shared divergence formula) —
  * whether a window's rows arrive in one micro-batch or split across
  * several, and a late row behind the watermark must neither re-open
  * a finalized window nor change its emitted value.
  */
class DriftStreamSpec extends SparkSpec {

  import DriftStream.TypedEvent

  private val WindowSec = 60L
  private val Ref = Map("view" -> 0.5, "click" -> 0.3, "purchase" -> 0.2)

  private def ev(sec: Long, typ: String) = TypedEvent(new Timestamp(sec * 1000), typ)

  /** Batch expectation: Spark-aggregated per-window counts, then the
    * shared formula on the driver. */
  private def expected(rows: Seq[TypedEvent]): Map[Long, (Long, Double)] = {
    import spark.implicits._
    rows.toDS()
      .groupBy((col("ts").cast("long") / WindowSec).cast("long").as("w"),
        col("typ"))
      .count()
      .collect()
      .groupBy(_.getLong(0))
      .map { case (w, rs) =>
        val counts = rs.map(r => r.getString(1) -> r.getLong(2)).toMap
        w * WindowSec * 1000 -> (counts.values.sum,
          DriftStream.jsdBits(counts, Ref))
      }
  }

  private def runStream(batches: Seq[Seq[TypedEvent]]): Map[Long, (Long, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TypedEvent]
    val q = DriftStream(input.toDS(), Ref, WindowSec, "10 seconds")
      .writeStream.format("memory").queryName("drift_out")
      .outputMode(DriftStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // two empty-ish nudge batches: the watermark computed at the end
      // of batch N drives timeouts during batch N+1
      input.addData(Seq(ev(100000, "view"))); q.processAllAvailable()
      input.addData(Seq(ev(100600, "view"))); q.processAllAvailable()
      spark.table("drift_out").collect()
        .map(r => r.getTimestamp(0).getTime -> (r.getLong(1), r.getDouble(2)))
        .toMap
    } finally q.stop()
  }

  private val windowA = Seq(ev(60, "view"), ev(65, "view"), ev(70, "click"),
    ev(90, "purchase"), ev(110, "view"))
  private val windowB = Seq(ev(120, "click"), ev(125, "click"), ev(170, "error"))

  test("one micro-batch: one exact JSD row per finalized window") {
    val exp = expected(windowA ++ windowB)
    val got = runStream(Seq(windowA ++ windowB))
    // sentinel windows excluded: compare only the data windows
    for ((w, (n, j)) <- exp) {
      assert(got.contains(w), s"missing window $w in ${got.keySet}")
      assert(got(w)._1 == n, s"window $w count ${got(w)._1} vs $n")
      assert(math.abs(got(w)._2 - j) < 1e-12, s"window $w jsd ${got(w)._2} vs $j")
    }
  }

  test("multi-batch arrival: counts carry across batches within a window") {
    val exp = expected(windowA ++ windowB)
    val got = runStream(Seq(windowA.take(2), windowA.drop(2), windowB))
    for ((w, (n, j)) <- exp) {
      assert(got.contains(w) && got(w)._1 == n && math.abs(got(w)._2 - j) < 1e-12,
        s"window $w: ${got.get(w)} vs ($n, $j)")
    }
  }

  test("late row behind the watermark neither re-opens nor double-emits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TypedEvent]
    val q = DriftStream(input.toDS(), Ref, WindowSec, "10 seconds")
      .writeStream.format("memory").queryName("drift_late")
      .outputMode(DriftStream.outputMode).start()
    try {
      input.addData(windowA); q.processAllAvailable()
      // advance the watermark far past windowA, firing its timeout
      input.addData(Seq(ev(100000, "view"))); q.processAllAvailable()
      input.addData(Seq(ev(100600, "view"))); q.processAllAvailable()
      val afterFinalize = spark.table("drift_late").collect()
      val aRows = afterFinalize.filter(_.getTimestamp(0).getTime == 60000L)
      assert(aRows.length == 1, s"expected one row for windowA, got ${aRows.length}")
      // a LATE row for windowA (watermark is now ~100590s)
      input.addData(Seq(ev(75, "view"))); q.processAllAvailable()
      input.addData(Seq(ev(101200, "view"))); q.processAllAvailable()
      input.addData(Seq(ev(101800, "view"))); q.processAllAvailable()
      val fin = spark.table("drift_late").collect()
        .filter(_.getTimestamp(0).getTime == 60000L)
      assert(fin.length == 1, s"late row re-emitted windowA: ${fin.length} rows")
      assert(fin.head.getLong(1) == 5L, s"late row changed the count: ${fin.head}")
    } finally q.stop()
  }
}
