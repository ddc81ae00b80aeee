package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `q_kalman_1d` operator: the local-
  * level Kalman recurrence (P' = P+q; K = P'/(P'+r); x += K(z−x);
  * P = (1−K)P') carried across micro-batches with per-key state —
  * same seed (x₀ = z₀, P₀ = 1), same (us, event_id) in-batch
  * ordering, same q=1/r=4 constants as the batch fold, so the
  * double recurrence is bit-identical whether the stream arrives in
  * one batch or many (time-ordered across batches; like EWMA, the
  * recurrence itself is order-sensitive — the commutative-state
  * counterpart is CdcStream).
  *
  * State is (x, P, cnt, seeded) per key — O(1)/key.
  */
object KalmanStream {

  case class KState(x: Double, p: Double, cnt: Long, seeded: Boolean)
  case class KOut(user_id: Long, n_events: Long, x_hat: Double, p_var: Double)

  /** rows: (user_id, us, event_id, value). q=1, r=4 as in q_kalman_1d. */
  def apply(rows: Dataset[(Long, Long, Long, Double)]): Dataset[KOut] = {
    implicit val stateEnc = Encoders.product[KState]
    implicit val outEnc = Encoders.product[KOut]
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_._1)
      .mapGroupsWithState[KState, KOut](GroupStateTimeout.NoTimeout) {
        (uid, it, state: GroupState[KState]) =>
          val batch = it.toArray.sortBy(r => (r._2, r._3))
          var st = state.getOption.getOrElse(KState(0.0, 1.0, 0L, seeded = false))
          batch.foreach { r =>
            st =
              if (!st.seeded) KState(r._4, 1.0, st.cnt + 1, seeded = true)
              else {
                val pp = st.p + 1.0
                val k = pp / (pp + 4.0)
                KState(st.x + k * (r._4 - st.x), (1.0 - k) * pp,
                  st.cnt + 1, seeded = true)
              }
          }
          state.update(st)
          KOut(uid, st.cnt, st.x, st.p)
      }
  }

  val outputMode: OutputMode = OutputMode.Update()
}
