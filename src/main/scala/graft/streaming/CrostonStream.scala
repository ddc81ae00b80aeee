package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `q_croston` fold (the 20th batch/stream
  * pair): Croston's intermittent-demand recurrence — dual EWMA over
  * nonzero demand sizes and inter-arrival intervals — carried across
  * micro-batches with O(1) state per part (z, p, previous occurrence
  * day, count). Same seeds (z₁ = first size, p₁ = days-to-first-
  * demand), same α = 0.2, same in-batch day ordering, so the double
  * recurrence is bit-identical whether a part's demand history arrives
  * in one batch or many (time-ordered across batches; the
  * HoltStream/KalmanStream order-sensitivity contract).
  */
object CrostonStream {

  case class CState(z: Double, p: Double, prev: Long, n: Long,
      seeded: Boolean)
  case class COut(part: Long, n_occ: Long, size_z: Double,
      interval_p: Double, fc_croston: Double)

  /** rows: (part, offsetDay ≥ 1, demand) — nonzero demand occurrences,
    * offset in days from the corpus start (the batch query's frame). */
  def apply(rows: Dataset[(Long, Long, Double)]): Dataset[COut] = {
    implicit val stateEnc = Encoders.product[CState]
    implicit val outEnc = Encoders.product[COut]
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_._1)
      .mapGroupsWithState[CState, COut](GroupStateTimeout.NoTimeout) {
        (part, it, state: GroupState[CState]) =>
          val batch = it.toArray.sortBy(_._2)
          var st = state.getOption.getOrElse(
            CState(0.0, 0.0, 0L, 0L, seeded = false))
          batch.foreach { case (_, off, q) =>
            st =
              if (!st.seeded) CState(q, off.toDouble, off, 1L, seeded = true)
              else CState(0.2 * q + 0.8 * st.z,
                0.2 * (off - st.prev).toDouble + 0.8 * st.p,
                off, st.n + 1, seeded = true)
          }
          state.update(st)
          COut(part, st.n, st.z, st.p, st.z / st.p)
      }
  }

  val outputMode: OutputMode = OutputMode.Update()
}
