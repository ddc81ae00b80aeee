package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `q_page_hinkley` drift detector (the
  * 18th batch/stream pair). Page–Hinkley is the change detector that
  * EXISTS for streams — m_t = Σ(x_i − x̄_i) tracked against its running
  * minimum needs only O(1) state per series (n, Σx, m, min m), unlike
  * the global-moment CUSUM — so the twin is the operator's natural
  * habitat and the batch query is its offline replay.
  *
  * Recurrence matches the batch window math exactly: x̄_i = S_i/i off
  * the exact integer prefix sum, m accumulates (x_i − x̄_i) in day
  * order (the same sequential double additions the ordered window
  * performs), PH_t = m_t − min_{i≤t} m_i; λ = 5·√(S₁₀/10) armed at the
  * 10th point; alarms score only past the burn-in. Same seed, same
  * order, same constants → bit-identical to the batch computation
  * whether the series arrives in one micro-batch or many (time-ordered
  * across batches; like EWMA/Kalman/Holt the recurrence is
  * order-sensitive).
  */
object PageHinkleyStream {

  case class PHState(n: Long, s: Long, m: Double, minM: Double,
      lambda: Double, nAlarms: Long, firstAlarmD: Long, maxPh: Double)
  case class PHOut(event_type: String, n_days: Long, lambda: Double,
      n_alarms: Long, first_alarm_d: Long, max_ph: Double)

  val BurnIn = 10L

  /** rows: (event_type, epochDay, count) — the collapsed daily series. */
  def apply(rows: Dataset[(String, Long, Long)]): Dataset[PHOut] = {
    implicit val stateEnc = Encoders.product[PHState]
    implicit val outEnc = Encoders.product[PHOut]
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_._1)
      .mapGroupsWithState[PHState, PHOut](GroupStateTimeout.NoTimeout) {
        (key, it, state: GroupState[PHState]) =>
          val batch = it.toArray.sortBy(_._2)
          var st = state.getOption.getOrElse(
            PHState(0L, 0L, 0.0, Double.PositiveInfinity, Double.NaN,
              0L, -1L, Double.NegativeInfinity))
          batch.foreach { case (_, d, c) =>
            val n = st.n + 1
            val s = st.s + c
            val m = st.m + (c - s.toDouble / n)
            val minM = math.min(st.minM, m)
            val ph = m - minM
            val lambda =
              if (n == BurnIn) 5.0 * math.sqrt(s.toDouble / 10) else st.lambda
            val alarm = n > BurnIn && ph > lambda
            st = PHState(n, s, m, minM, lambda,
              st.nAlarms + (if (alarm) 1L else 0L),
              if (alarm && st.firstAlarmD < 0) d else st.firstAlarmD,
              math.max(st.maxPh, ph))
          }
          state.update(st)
          PHOut(key, st.n, st.lambda, st.nAlarms, st.firstAlarmD, st.maxPh)
      }
      // batch q_page_hinkley inner-joins on the t = 10 burn-in row, so
      // series shorter than the burn-in never appear there; emit the
      // same surface here instead of NaN-lambda rows (r10 ADVICE).
      // State is still kept, so a series crossing the burn-in in a
      // later batch starts emitting with the correct full history.
      .filter(_.n_days >= BurnIn)
  }

  val outputMode: OutputMode = OutputMode.Update()
}
