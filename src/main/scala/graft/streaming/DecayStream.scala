package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `q_decay_agg` operator: a per-key
  * exponentially time-decayed sum (s(T) = Σ vᵢ·e^(−λ(T−tᵢ)), the
  * metric-store "current value"), carried across micro-batches as
  * O(1) state per key — (acc, horizon) — and updated in EVENT time.
  *
  * Unlike the EWMA recurrence (arrival-order-dependent across
  * batches, documented there), the decayed sum is ORDER-INDEPENDENT:
  * a row ahead of the horizon advances it
  * (acc·e^(−λΔ) + v), a late row behind the horizon folds in already
  * discounted (acc + v·e^(−λΔ)) — both paths are algebraically the
  * same Σ v·e^(−λ(T−t)), so arbitrary arrival order, batching, and
  * late data all converge to the batch formula exactly (up to double
  * associativity — the parity spec pins 1e-9). This is the property
  * that makes decayed counters THE streaming freshness metric: no
  * watermark, no window state, no reordering buffer.
  */
object DecayStream {

  case class Obs(key: String, ts: Timestamp, value: Double)
  case class DecayState(acc: Double, horizonUs: Long)
  case class DecayOut(key: String, decayed_sum: Double, as_of_us: Long)

  private def usOf(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  /** Batch reference: the closed-form decayed sum at the key's max
    * event time (shared by the spec). */
  def batchDecayedSum(rows: Seq[(Timestamp, Double)], lambdaPerUs: Double): (Double, Long) = {
    val horizon = rows.map(r => usOf(r._1)).max
    (rows.map { case (t, v) => v * math.exp(-lambdaPerUs * (horizon - usOf(t))) }.sum,
      horizon)
  }

  /** Emits each key's decayed sum at its current event-time horizon on
    * every batch that touches it (Update mode downstream). */
  def apply(ds: Dataset[Obs], lambdaPerUs: Double): Dataset[DecayOut] = {
    implicit val stateEnc = Encoders.product[DecayState]
    implicit val outEnc = Encoders.product[DecayOut]
    ds.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[DecayState, DecayOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key, it, state: GroupState[DecayState]) =>
          var (acc, horizon) = state.getOption
            .map(s => (s.acc, s.horizonUs)).getOrElse((0.0, Long.MinValue))
          it.foreach { o =>
            val t = usOf(o.ts)
            if (t >= horizon) {
              acc = (if (horizon == Long.MinValue) 0.0
                     else acc * math.exp(-lambdaPerUs * (t - horizon))) + o.value
              horizon = t
            } else {
              // late row: fold in pre-discounted — same algebra,
              // horizon unchanged
              acc += o.value * math.exp(-lambdaPerUs * (horizon - t))
            }
          }
          state.update(DecayState(acc, horizon))
          Iterator.single(DecayOut(key, acc, horizon))
      }
  }

  /** The output mode this operator requires downstream. */
  val outputMode: OutputMode = OutputMode.Update()
}
