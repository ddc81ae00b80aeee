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

  /** Latest progress percentage (monotone, ≤ 100). */
  def pct: Double = current

  /** Every value `pct` has taken, in listener-bus order. */
  def history: Seq[Double] = {
    import scala.jdk.CollectionConverters._
    log.asScala.toSeq.map(_.doubleValue())
  }

  private def tracks(name: String): Boolean = queryName.forall(_ == name)

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    // capture the runId here too: a tracked query that dies before its
    // first progress event must still finalize on termination
    if (event.name != null && tracks(event.name)) trackedRunId = Some(event.runId)

  override def onQueryProgress(event: QueryProgressEvent): Unit =
    if (tracks(event.progress.name)) {
      trackedRunId = Some(event.progress.runId)
      val total = seen.addAndGet(event.progress.numInputRows)
      val raw =
        if (expectedTotal <= 0L) 100.0 else total * 100.0 / expectedTotal
      current = Progress.update(current, raw, producerPct())
      log.add(current)
    }

  override def onQueryIdle(event: QueryIdleEvent): Unit = ()

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    // QueryTerminatedEvent carries no name — match on the runId seen
    // in progress events (terminations of other queries must not
    // finalize this gauge).
    if (queryName.isEmpty || trackedRunId.contains(event.runId)) {
      current = Progress.finalizeValue(current, producerPct())
      log.add(current)
    }
}
