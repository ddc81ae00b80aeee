package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** The A8 progress transport: the reference publishes a per-video
  * stream-progress percentage through an fcntl-locked file that both
  * producer and consumer write (/root/reference
  * streams/pipeline/progress.py:18-49). On Spark the equivalent
  * signal already flows through the engine — every micro-batch emits
  * a `StreamingQueryProgress` — so the transport is a
  * [[StreamingQueryListener]] fed by the listener bus, and the pure
  * [[Progress]] arithmetic (monotone, producer-capped, ≤ 100) is
  * applied to the cumulative input-row count.
  *
  * `expectedTotal` plays the producer's frame-count role;
  * `producerPct` is the producer-progress cap (a constant 100 when
  * the producer already finished, or a live gauge while it runs).
  */
class ProgressListener(
    expectedTotal: Long,
    producerPct: () => Double = () => 100.0,
    queryName: Option[String] = None)
  extends StreamingQueryListener {

  private val seen = new java.util.concurrent.atomic.AtomicLong(0L)
  private val log = new java.util.concurrent.CopyOnWriteArrayList[java.lang.Double]()
  @volatile private var current: Double = 0.0
  @volatile private var trackedRunId: Option[java.util.UUID] = None
  // Runs this gauge has already moved past; bounded by restart count.
  private val retired = scala.collection.mutable.Set.empty[java.util.UUID]

  /** Latest progress percentage (monotone WITHIN a run, ≤ 100; a
    * restart re-arms the gauge at 0 for the new run). */
  def pct: Double = current

  /** Every value `pct` has taken, in listener-bus order. */
  def history: Seq[Double] = {
    import scala.jdk.CollectionConverters._
    log.asScala.toSeq.map(_.doubleValue())
  }

  // Gauge ownership is per-RUN: a named listener owns every run of that
  // query name (a restart = new runId resets the ROW COUNTER AND THE
  // GAUGE, so replayed micro-batches after recovery don't double-count
  // and a finalize from the previous run can't pin a monotone 100 over
  // the whole recovery — the reference rewrites its progress file per
  // run, progress.py:18-49); an unnamed listener latches onto the FIRST
  // run it observes and ignores every other query on the session.
  private def adopt(runId: java.util.UUID, name: String): Boolean = synchronized {
    if (trackedRunId.contains(runId)) true
    else if (retired.contains(runId)) false // stale queued event of a replaced run
    else {
      val owns = queryName match {
        case Some(n) => name != null && n == name // restart of the named query
        case None => trackedRunId.isEmpty // anonymous: first run wins
      }
      if (owns) {
        // A replaced run can never adopt again: QueryStartedEvent is
        // delivered synchronously but progress/termination drain from
        // the async bus, so the previous run's queued events arrive
        // AFTER the restart adopted the new runId — without the
        // retired set they would steal ownership back, double-count
        // stale rows, and finalize the gauge mid-recovery.
        trackedRunId.foreach(retired += _)
        // Re-arm unconditionally: also covers an unnamed listener that
        // finalized on an unrelated query's termination BEFORE first
        // adoption (current pinned at 100 otherwise).
        seen.set(0L)
        current = 0.0
        trackedRunId = Some(runId)
      }
      owns
    }
  }

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    // adopt here too: a tracked query that dies before its first
    // progress event must still finalize on termination
    adopt(event.runId, event.name)

  override def onQueryProgress(event: QueryProgressEvent): Unit =
    if (adopt(event.progress.runId, event.progress.name)) {
      val total = seen.addAndGet(event.progress.numInputRows)
      val raw =
        if (expectedTotal <= 0L) 100.0 else total * 100.0 / expectedTotal
      current = Progress.update(current, raw, producerPct())
      log.add(current)
    }

  override def onQueryIdle(event: QueryIdleEvent): Unit = ()

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    // QueryTerminatedEvent carries no name — match on the adopted runId
    // (terminations of other queries must not finalize this gauge); an
    // unnamed listener that never saw a run finalizes on any
    // termination, preserving the close-out-on-teardown behavior.
    // Finalize is the CLEAN-stop "consumer finished" signal only: a
    // crash (exception present) must not report completion — the
    // supervisor restarts from checkpoint and the new run's adopt()
    // re-arms the gauge.
    if (event.exception.isEmpty &&
        (trackedRunId.contains(event.runId) ||
          (queryName.isEmpty && trackedRunId.isEmpty))) {
      current = Progress.finalizeValue(current, producerPct())
      log.add(current)
    }
}
