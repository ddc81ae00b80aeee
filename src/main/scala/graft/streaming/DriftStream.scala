package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming drift monitor — the streaming twin of the batch
  * `q_js_divergence` / `q_drift_timeline` operators: per event-time
  * window, the Jensen–Shannon divergence (in bits) between the
  * window's event-type distribution and a broadcast REFERENCE
  * distribution (e.g. the training-mix baseline), emitted exactly once
  * when the watermark finalizes the window. The alerting shape a
  * data-quality pipeline runs against its ingest stream: "did this
  * hour's mix drift from the corpus I trained on?"
  *
  * Mechanics: `flatMapGroupsWithState` keyed by window start with an
  * EVENT-time timeout at window end — counts accumulate across
  * micro-batches (O(#types) state per open window, bounded by the
  * type vocabulary; an unbounded vocabulary would swap in the
  * Misra–Gries summary from [[HeavyHittersStream]] and monitor the
  * heavy-hitter mix), and the JSD math runs once per window on the
  * tiny final map. Late rows behind the watermark are dropped
  * explicitly — a finalized window can never re-open and double-emit
  * (the same append-mode contract as a windowed aggregation).
  *
  * At scale this is one shuffle on the window key; with a composite
  * (source, window) key it monitors every ingest source concurrently
  * with the identical plan.
  */
object DriftStream {

  case class TypedEvent(ts: Timestamp, typ: String)
  case class WindowState(counts: Map[String, Long])
  case class WindowDrift(window_start: Timestamp, n: Long, jsd_bits: Double)

  /** Pinned (see q_js_divergence: both engines' ln(2) stay out of it). */
  private val Ln2 = 0.6931471805599453

  /** JSD in bits between observed counts and a reference distribution
    * over the union vocabulary — same term shape as the batch
    * operator (zero-probability terms contribute 0). */
  def jsdBits(obs: Map[String, Long], ref: Map[String, Double]): Double = {
    val n = obs.values.sum.toDouble
    var s = 0.0
    (obs.keySet ++ ref.keySet).foreach { k =>
      val pa = if (n > 0) obs.getOrElse(k, 0L) / n else 0.0
      val pb = ref.getOrElse(k, 0.0)
      val m = (pa + pb) / 2.0
      if (pa > 0) s += pa * math.log(pa / m)
      if (pb > 0) s += pb * math.log(pb / m)
    }
    s / 2.0 / Ln2
  }

  /** windowSec-wide tumbling event-time windows over `ds`; emits one
    * [[WindowDrift]] row per window once the watermark passes its end.
    */
  def apply(ds: Dataset[TypedEvent], ref: Map[String, Double],
      windowSec: Long, watermarkDelay: String): Dataset[WindowDrift] = {
    implicit val stateEnc = Encoders.product[WindowState]
    implicit val outEnc = Encoders.product[WindowDrift]
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(e => e.ts.getTime / 1000 / windowSec * windowSec)
      .flatMapGroupsWithState[WindowState, WindowDrift](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wstartSec, it, state: GroupState[WindowState]) =>
          val endMs = (wstartSec + windowSec) * 1000
          if (state.hasTimedOut) {
            val counts = state.get.counts
            state.remove()
            Iterator.single(WindowDrift(new Timestamp(wstartSec * 1000),
              counts.values.sum, jsdBits(counts, ref)))
          } else if (endMs <= state.getCurrentWatermarkMs()) {
            // late rows for an already-finalized window: drop, never
            // re-open (a fresh state here would eventually time out
            // and emit the window a SECOND time in append mode)
            Iterator.empty
          } else {
            val counts = state.getOption.map(_.counts).getOrElse(Map.empty[String, Long])
            val merged = it.foldLeft(counts) { (m, e) =>
              m.updated(e.typ, m.getOrElse(e.typ, 0L) + 1L)
            }
            state.update(WindowState(merged))
            // fire when the watermark passes window end (this branch
            // is only reachable with endMs > current watermark, so the
            // timestamp is always legally ahead of it)
            state.setTimeoutTimestamp(endMs)
            Iterator.empty
          }
      }
  }

  /** The output mode this operator requires downstream. */
  val outputMode: OutputMode = OutputMode.Append()
}
