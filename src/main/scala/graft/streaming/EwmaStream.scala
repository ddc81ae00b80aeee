package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `q_ewma` operator: the same
  * exponential-smoothing recurrence (s = αx + (1−α)s_prev, seeded
  * s_0 = x_0) carried across micro-batches with per-key state — the
  * batch/streaming parity pattern the video pipeline uses, applied to
  * a numeric recurrence. Within a micro-batch rows are sorted by
  * (us, event_id) before folding, so arrival order inside a batch
  * doesn't matter; ACROSS batches the fold applies in arrival order
  * (late rows would need event-time reordering state — same semantics
  * boundary the reference's gap-check has, documented there).
  *
  * State is one (acc, cnt) pair per key — O(1)/key, mergeable only in
  * the trivial sense, which is exactly why this is a stateful stream
  * op and not a windowed aggregation.
  */
object EwmaStream {

  case class EwmaState(acc: Double, cnt: Long)
  case class EwmaOut(user_id: Long, n_events: Long, ewma: Double)

  /** rows: (user_id, us, event_id, value). Emits the running EWMA per
    * key on every batch (Update mode downstream).
    */
  def apply(rows: Dataset[(Long, Long, Long, Double)], alpha: Double): Dataset[EwmaOut] = {
    implicit val stateEnc = Encoders.product[EwmaState]
    implicit val outEnc = Encoders.product[EwmaOut]
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_._1)
      .mapGroupsWithState[EwmaState, EwmaOut](GroupStateTimeout.NoTimeout) {
        (uid, it, state: GroupState[EwmaState]) =>
          val batch = it.toArray.sortBy(r => (r._2, r._3))
          var (acc, cnt, seeded) = state.getOption match {
            case Some(s) => (s.acc, s.cnt, true)
            case None => (0.0, 0L, false)
          }
          batch.foreach { r =>
            if (!seeded) { acc = r._4; seeded = true }
            else acc = alpha * r._4 + (1 - alpha) * acc
            cnt += 1
          }
          state.update(EwmaState(acc, cnt))
          EwmaOut(uid, cnt, acc)
      }
  }

  /** The output mode this operator requires downstream. */
  val outputMode: OutputMode = OutputMode.Update()
}
