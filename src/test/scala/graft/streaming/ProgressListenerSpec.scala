package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The A8 progress transport wired to a real listener bus: a
  * MemoryStream query advances over micro-batches and the
  * [[ProgressListener]] gauge must be monotone, capped at 100, and
  * capped by producer progress — the same invariants ProgressSpec
  * proves on the pure arithmetic, observed end-to-end here. */
class ProgressListenerSpec extends SparkSpec {

  import spark.implicits._

  private def await(timeoutMs: Long = 20000L)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50L)
    assert(cond, "timed out waiting for listener")
  }

  test("listener reports monotone capped progress across micro-batches (A8)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Int]
    val listener = new ProgressListener(
      expectedTotal = 40L, queryName = Some("progress_probe"))
    val capped = new ProgressListener(
      expectedTotal = 40L, producerPct = () => 60.0,
      queryName = Some("progress_probe"))
    spark.streams.addListener(listener)
    spark.streams.addListener(capped)
    val query = input.toDS().writeStream
      .format("memory").queryName("progress_probe")
      .outputMode("append").start()
    try {
      input.addData(1 to 10: _*); query.processAllAvailable()
      await()(listener.pct >= 25.0)
      assert(listener.pct == 25.0)
      input.addData(1 to 10: _*); query.processAllAvailable()
      await()(listener.pct >= 50.0)
      assert(listener.pct == 50.0)
      // overshoot: 70 rows against an expected 40 — gauge caps at 100
      input.addData(1 to 30: _*); query.processAllAvailable()
      await()(listener.pct >= 100.0)
      assert(listener.pct == 100.0)
      // the producer-capped twin never passes the producer
      assert(capped.pct == 60.0)
    } finally {
      query.stop()
      await()(listener.history.nonEmpty && listener.history.last == 100.0)
      // finalize with a finished producer pins 100; the capped gauge
      // stays frozen at the producer's cap
      await()(capped.history.nonEmpty && capped.history.last == 60.0)
      spark.streams.removeListener(listener)
      spark.streams.removeListener(capped)
      val h = listener.history
      assert(h.sliding(2).forall { case Seq(a, b) => b >= a; case _ => true })
      assert(h.forall(_ <= 100.0))
      assert(capped.history.forall(_ <= 60.0))
    }
  }
}
