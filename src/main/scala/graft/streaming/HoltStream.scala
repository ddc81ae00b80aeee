package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `q_holt_forecast` fold (the 15th
  * batch/stream pair): the Holt double-exponential level+trend
  * recurrence (l' = 0.5y + 0.5(l+b); b' = 0.3(0.5y − 0.5l + 0.5b) +
  * 0.7b — the EXPANDED trend form, shape-identical to the batch fold
  * and its recursive-CTE oracle) carried across micro-batches with
  * per-series state. Same seed (l₁ = y₁, b₁ = 0), same in-batch day
  * ordering, same α=0.5/β=0.3 constants, so the double recurrence is
  * bit-identical whether the series arrives in one batch or many
  * (time-ordered across batches; like EWMA/Kalman the recurrence is
  * order-sensitive — the commutative-state counterpart is CdcStream).
  *
  * State is (l, b, n, seeded) per series key — O(1)/key.
  */
object HoltStream {

  case class HState(l: Double, b: Double, n: Long, seeded: Boolean)
  case class HOut(event_type: String, n_days: Long, level: Double,
    trend: Double, fc_1: Double)

  /** rows: (event_type, epochDay, y) — the collapsed daily series. */
  def apply(rows: Dataset[(String, Long, Double)]): Dataset[HOut] = {
    implicit val stateEnc = Encoders.product[HState]
    implicit val outEnc = Encoders.product[HOut]
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_._1)
      .mapGroupsWithState[HState, HOut](GroupStateTimeout.NoTimeout) {
        (key, it, state: GroupState[HState]) =>
          val batch = it.toArray.sortBy(_._2)
          var st = state.getOption.getOrElse(HState(0.0, 0.0, 0L, seeded = false))
          batch.foreach { r =>
            st =
              if (!st.seeded) HState(r._3, 0.0, st.n + 1, seeded = true)
              else {
                val lp = 0.5 * r._3 + 0.5 * (st.l + st.b)
                val bp = 0.3 * (0.5 * r._3 - 0.5 * st.l + 0.5 * st.b) + 0.7 * st.b
                HState(lp, bp, st.n + 1, seeded = true)
              }
          }
          state.update(st)
          HOut(key, st.n, st.l, st.b, st.l + 1 * st.b)
      }
  }

  val outputMode: OutputMode = OutputMode.Update()
}
