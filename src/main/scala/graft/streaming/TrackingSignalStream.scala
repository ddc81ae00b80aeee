package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `q_tracking_signal` operator (the 26th
  * batch/stream twin): the live forecast-bias control chart. Per
  * series, consume the VALUE sequence, derive the naive-forecast
  * error e_t = y_t − y_{t−1}, and emit the tracking signal
  * TS_t = (Σe)/(Σ|e|/n) after every value, flagged past the
  * conventional ±4 control limit the batch query pins.
  *
  * The state is O(1)/key — (prev value, n, Σe, Σ|e|) — and the fold
  * adds errors in arrival order, which is EXACTLY how both engines'
  * batch cumulative windows accumulate (a running frame is a
  * sequential left-to-right add), so for a time-ordered arrival every
  * TS_t is bit-identical to the batch day-frame read whether the
  * series lands in one micro-batch or many ([[TrackingSignalStreamSpec]]
  * pins the final/extreme/breach-count reads against the BATCH
  * QUERY'S OWN output and the composition across batch splits).
  * Like the other sequential-recurrence twins (Holt, PageHinkley,
  * Hmm, Acf), the signal is a function of the value SEQUENCE:
  * batches must arrive time-ordered for cross-batch state to
  * compose; within a batch rows sort by t. Update mode: each batch
  * emits a row per folded value — the live bias read an ops
  * dashboard polls.
  */
object TrackingSignalStream {

  case class TsState(prev: Double, hasPrev: Boolean, n: Long,
      ce: Double, sae: Double)
  case class TsOut(series: String, t: Long, err: Double, ts: Double,
      breach: Boolean)

  /** Fold one value; emits None for the first value of a series
    * (no error yet — the batch side's NULL-lag row). */
  def step(st: TsState, y: Double): (TsState, Option[(Double, Double)]) =
    if (!st.hasPrev)
      (TsState(y, hasPrev = true, st.n, st.ce, st.sae), None)
    else {
      val err = y - st.prev
      val n = st.n + 1
      val ce = st.ce + err
      val sae = st.sae + math.abs(err)
      (TsState(y, hasPrev = true, n, ce, sae),
        Some((err, ce / (sae / n))))
    }

  /** rows: (series, t, y) — t orders values within a series. */
  def apply(rows: Dataset[(String, Long, Double)]): Dataset[TsOut] = {
    implicit val stateEnc = Encoders.product[TsState]
    implicit val outEnc = Encoders.product[TsOut]
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_._1)
      .flatMapGroupsWithState[TsState, TsOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (series, it, state: GroupState[TsState]) =>
          val batch = it.toArray.sortBy(_._2)
          var st = state.getOption.getOrElse(
            TsState(0.0, hasPrev = false, 0L, 0.0, 0.0))
          val out = batch.flatMap { case (_, t, y) =>
            val (st2, emitted) = step(st, y)
            st = st2
            emitted.map { case (err, ts) =>
              TsOut(series, t, err, ts, math.abs(ts) > 4.0)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  val outputMode: OutputMode = OutputMode.Update()
}
