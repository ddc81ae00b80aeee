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
      // await BOTH listeners: the bus delivers in registration order,
      // so gating only on `listener` races `capped`'s delivery
      await()(listener.pct >= 100.0 && capped.pct >= 60.0)
      assert(listener.pct == 100.0)
      // the producer-capped twin never passes the producer
      assert(capped.pct == 60.0)
    } finally query.stop()
    // post-stop assertions OUTSIDE the finally: an assert (or await
    // timeout) inside finally would supersede the primary failure
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

  test("a restarted query (new runId) does not double-count replayed rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Int]
    val listener = new ProgressListener(
      expectedTotal = 40L, queryName = Some("progress_restart"))
    spark.streams.addListener(listener)
    def start() = input.toDS().writeStream
      .format("memory").queryName("progress_restart")
      .outputMode("append").start()
    val q1 = start()
    try {
      input.addData(1 to 10: _*); q1.processAllAvailable()
      await()(listener.pct >= 25.0)
      assert(listener.pct == 25.0)
    } finally {
      // detach across the restart: termination-finalize is the
      // "consumer finished" signal, which a supervised restart is not
      spark.streams.removeListener(listener)
      q1.stop()
    }
    spark.streams.addListener(listener)
    // no checkpoint: the restarted run re-reads all 10 rows from the
    // MemoryStream. The per-runId reset keeps the replay from
    // double-counting (without it: (10+10+6)/40 = 65%).
    val q2 = start()
    try {
      q2.processAllAvailable() // replayed batch
      input.addData(1 to 6: _*); q2.processAllAvailable()
      await()(listener.pct >= 40.0)
      assert(listener.pct == 40.0, s"replay double-counted: ${listener.pct}")
    } finally {
      q2.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("a restart with the listener still attached re-arms the finalized gauge") {
    // the crash-recovery shape: nothing detaches a listener before an
    // unsupervised restart, so the previous run's finalize (pct=100)
    // must not pin the monotone gauge over the whole recovery run
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Int]
    val listener = new ProgressListener(
      expectedTotal = 40L, queryName = Some("progress_rearm"))
    spark.streams.addListener(listener)
    def start() = input.toDS().writeStream
      .format("memory").queryName("progress_rearm")
      .outputMode("append").start()
    val q1 = start()
    try {
      input.addData(1 to 10: _*); q1.processAllAvailable()
      await()(listener.pct >= 25.0)
    } finally q1.stop() // listener stays attached: clean-stop finalizes to 100
    await()(listener.pct == 100.0)
    val q2 = start()
    try {
      q2.processAllAvailable() // replays the 10 rows into the new run
      await()(listener.pct == 25.0) // re-armed: 10/40, not pinned at 100
      input.addData(1 to 6: _*); q2.processAllAvailable()
      await()(listener.pct == 40.0)
    } finally {
      q2.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("a crash termination (exception present) does not finalize the gauge") {
    // synthetic listener-bus events: a crashed run must not report
    // "consumer finished" — the supervisor restarts it from checkpoint
    import org.apache.spark.sql.streaming.StreamingQueryListener.{
      QueryStartedEvent, QueryTerminatedEvent}
    val id = java.util.UUID.randomUUID()
    val run1 = java.util.UUID.randomUUID()
    val listener = new ProgressListener(
      expectedTotal = 40L, queryName = Some("crash_probe"))
    listener.onQueryStarted(new QueryStartedEvent(id, run1, "crash_probe", "t0"))
    listener.onQueryTerminated(new QueryTerminatedEvent(id, run1, Some("boom")))
    assert(listener.pct == 0.0 && listener.history.isEmpty,
      "crash must not pin the gauge")
    // the same run id terminating CLEANLY does finalize
    listener.onQueryTerminated(new QueryTerminatedEvent(id, run1, None))
    assert(listener.pct == 100.0 && listener.history == Seq(100.0))
  }

  test("a replaced run's stale queued events cannot steal ownership back") {
    // QueryStartedEvent is delivered synchronously but the async bus
    // can drain a previous run's queued events AFTER a restart adopted
    // the new runId — a stale event must not re-adopt the old run
    import org.apache.spark.sql.streaming.StreamingQueryListener.{
      QueryStartedEvent, QueryTerminatedEvent}
    val id = java.util.UUID.randomUUID()
    val run1 = java.util.UUID.randomUUID()
    val run2 = java.util.UUID.randomUUID()
    val listener = new ProgressListener(
      expectedTotal = 40L, queryName = Some("steal_probe"))
    listener.onQueryStarted(new QueryStartedEvent(id, run1, "steal_probe", "t0"))
    listener.onQueryStarted(new QueryStartedEvent(id, run2, "steal_probe", "t1"))
    // stale re-delivery of the replaced run: must be inert
    listener.onQueryStarted(new QueryStartedEvent(id, run1, "steal_probe", "t0"))
    // run2 must still own the gauge: its clean termination finalizes
    listener.onQueryTerminated(new QueryTerminatedEvent(id, run2, None))
    assert(listener.pct == 100.0, "stale run stole the gauge back")
  }

  test("an unnamed listener that finalized before first adoption re-arms on adopt") {
    // unrelated query stops cleanly before the intended query starts:
    // the close-out-on-teardown finalize must not pin the gauge at 100
    // for the run the listener then latches onto
    import org.apache.spark.sql.streaming.StreamingQueryListener.{
      QueryStartedEvent, QueryTerminatedEvent}
    val listener = new ProgressListener(expectedTotal = 40L, queryName = None)
    listener.onQueryTerminated(new QueryTerminatedEvent(
      java.util.UUID.randomUUID(), java.util.UUID.randomUUID(), None))
    assert(listener.pct == 100.0) // teardown close-out, nothing latched yet
    listener.onQueryStarted(new QueryStartedEvent(
      java.util.UUID.randomUUID(), java.util.UUID.randomUUID(), "late_query", "t0"))
    assert(listener.pct == 0.0, "gauge stayed pinned at 100 after adoption")
  }

  test("an unnamed listener latches onto its first run and ignores other queries") {
    implicit val sqlCtx = spark.sqlContext
    val inputA = MemoryStream[Int]
    val inputB = MemoryStream[Int]
    val listener = new ProgressListener(expectedTotal = 20L, queryName = None)
    val qa = inputA.toDS().writeStream
      .format("memory").queryName("anon_first").outputMode("append").start()
    try {
      // register AFTER qa started; latch happens on qa's first progress
      spark.streams.addListener(listener)
      inputA.addData(1 to 5: _*); qa.processAllAvailable()
      await()(listener.pct >= 25.0)
      val qb = inputB.toDS().writeStream
        .format("memory").queryName("anon_second").outputMode("append").start()
      try {
        inputB.addData(1 to 20: _*); qb.processAllAvailable()
        Thread.sleep(500L) // give the bus time to (wrongly) deliver
        assert(listener.pct == 25.0, s"foreign query counted: ${listener.pct}")
        inputA.addData(1 to 5: _*); qa.processAllAvailable()
        await()(listener.pct >= 50.0)
        assert(listener.pct == 50.0)
      } finally qb.stop()
    } finally {
      qa.stop()
      spark.streams.removeListener(listener)
    }
  }
}
