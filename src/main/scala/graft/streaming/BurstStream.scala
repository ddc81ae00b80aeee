package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming burst detector — the streaming twin of the batch
  * `q_burst_detect` operator: per event-time window, the event count
  * tested against a broadcast homogeneous-Poisson baseline μ (fitted
  * offline, e.g. by the batch query), emitting the window's count,
  * z-score (c − μ)/√μ, and burst flag once the watermark finalizes
  * the window. The paging alarm a monitoring pipeline runs against
  * its ingest stream.
  *
  * Mechanics (the [[DriftStream]] contract): `flatMapGroupsWithState`
  * keyed by window start with an event-time timeout at window end —
  * O(1) state per open window (a single counter), late rows behind
  * the watermark dropped explicitly so a finalized window can never
  * re-open and double-emit in append mode. At scale this is one
  * shuffle on the window key; a composite (source, window) key
  * monitors every source concurrently with the identical plan.
  */
object BurstStream {

  case class Stamped(ts: Timestamp)
  case class CountState(n: Long)
  case class WindowBurst(window_start: Timestamp, n: Long, z: Double, burst: Boolean)

  /** The same test as the batch operator: burst ⇔ c > μ + 3√μ. */
  def zScore(c: Long, mu: Double): Double = (c - mu) / math.sqrt(mu)
  def isBurst(c: Long, mu: Double): Boolean = c > mu + 3 * math.sqrt(mu)

  /** windowSec-wide tumbling event-time windows over `ds`; emits one
    * [[WindowBurst]] row per window once the watermark passes its
    * end (every window, so downstream can also see the all-clear). */
  def apply(ds: Dataset[Stamped], mu: Double, windowSec: Long,
      watermarkDelay: String): Dataset[WindowBurst] = {
    implicit val stateEnc = Encoders.product[CountState]
    implicit val outEnc = Encoders.product[WindowBurst]
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(e => e.ts.getTime / 1000 / windowSec * windowSec)(Encoders.scalaLong)
      .flatMapGroupsWithState[CountState, WindowBurst](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wstartSec, it, state: GroupState[CountState]) =>
          val endMs = (wstartSec + windowSec) * 1000
          if (state.hasTimedOut) {
            val n = state.get.n
            state.remove()
            Iterator.single(WindowBurst(new Timestamp(wstartSec * 1000), n,
              zScore(n, mu), isBurst(n, mu)))
          } else if (endMs <= state.getCurrentWatermarkMs()) {
            // late rows for a finalized window: drop, never re-open
            Iterator.empty
          } else {
            val n = state.getOption.map(_.n).getOrElse(0L) + it.size
            state.update(CountState(n))
            state.setTimeoutTimestamp(endMs)
            Iterator.empty
          }
      }
  }

  /** The output mode this operator requires downstream. */
  val outputMode: OutputMode = OutputMode.Append()
}
