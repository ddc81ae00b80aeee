package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming burst detector must emit exactly one row per
  * finalized window with the count/z/flag a batch recomputation over
  * the same rows produces — whether the window's rows arrive in one
  * micro-batch or split across several — and a late row behind the
  * watermark must neither re-open a finalized window nor double-emit.
  */
class BurstStreamSpec extends SparkSpec {

  import BurstStream.Stamped

  private val WindowSec = 60L
  private val Mu = 3.0

  private def ev(sec: Long) = Stamped(new Timestamp(sec * 1000))

  private def expected(rows: Seq[Stamped]): Map[Long, (Long, Double, Boolean)] =
    rows.groupBy(e => e.ts.getTime / 1000 / WindowSec * WindowSec).map {
      case (w, es) =>
        val n = es.size.toLong
        w * 1000 -> (n, BurstStream.zScore(n, Mu), BurstStream.isBurst(n, Mu))
    }

  private def runStream(batches: Seq[Seq[Stamped]]): Map[Long, (Long, Double, Boolean)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Stamped]
    val q = BurstStream(input.toDS(), Mu, WindowSec, "10 seconds")
      .writeStream.format("memory").queryName("burst_out")
      .outputMode(BurstStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // watermark from batch N drives timeouts during batch N+1
      input.addData(Seq(ev(100000))); q.processAllAvailable()
      input.addData(Seq(ev(100600))); q.processAllAvailable()
      spark.table("burst_out").collect()
        .map(r => r.getTimestamp(0).getTime ->
          (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
        .toMap
    } finally q.stop()
  }

  // window 60: 7 events (burst at μ=3: 7 > 3 + 3·√3 ≈ 8.196? no —
  // NOT a burst); window 120: 12 events (12 > 8.196 — burst);
  // window 180: 2 events (quiet)
  private val rows =
    (61L to 67L).map(ev) ++ (121L to 132L).map(ev) ++ Seq(ev(181), ev(230))

  test("one micro-batch: per-window count, z, and burst flag match batch") {
    val exp = expected(rows)
    val got = runStream(Seq(rows))
    for ((w, (n, z, b)) <- exp) {
      assert(got.contains(w), s"missing window $w in ${got.keySet}")
      assert(got(w)._1 == n && math.abs(got(w)._2 - z) < 1e-12 && got(w)._3 == b,
        s"window $w: ${got(w)} vs ($n, $z, $b)")
    }
    // the test corpus exercises both flag values
    assert(exp.values.exists(_._3) && exp.values.exists(!_._3))
  }

  test("multi-batch arrival: counts carry across batches within a window") {
    val exp = expected(rows)
    val got = runStream(Seq(rows.take(4), rows.slice(4, 15), rows.drop(15)))
    for ((w, (n, z, b)) <- exp)
      assert(got.contains(w) && got(w)._1 == n
        && math.abs(got(w)._2 - z) < 1e-12 && got(w)._3 == b)
  }

  test("a late row behind the watermark neither re-opens nor double-emits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Stamped]
    val q = BurstStream(input.toDS(), Mu, WindowSec, "10 seconds")
      .writeStream.format("memory").queryName("burst_late")
      .outputMode(BurstStream.outputMode).start()
    try {
      input.addData(rows); q.processAllAvailable()
      input.addData(Seq(ev(100000))); q.processAllAvailable()
      input.addData(Seq(ev(100600))); q.processAllAvailable()
      val before = spark.table("burst_late").collect()
        .map(r => r.getTimestamp(0).getTime).toSeq
      // a row for long-finalized window 60, far behind the watermark
      input.addData(Seq(ev(62))); q.processAllAvailable()
      input.addData(Seq(ev(100700))); q.processAllAvailable()
      val after = spark.table("burst_late").collect()
        .map(r => r.getTimestamp(0).getTime).toSeq
      assert(after.count(_ == 60000L) == before.count(_ == 60000L),
        "late row re-emitted a finalized window")
      assert(after.count(_ == 60000L) == 1)
    } finally q.stop()
  }
}
