package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `q_hmm_forward` operator (the 24th
  * batch/stream twin): the normalized 2-state HMM forward recursion —
  * pinned transitions (.9/.1, .2/.8), pinned emissions (.8/.2, .3/.7
  * for a high/low observation), uniform prior — carried across
  * micro-batches as per-series keyed state. The fold runs the batch
  * query's EXACT expression order (normalize previous alphas, mix
  * with transitions, scale by today's emission), so for a
  * time-ordered arrival the per-step posterior P(high | obs so far)
  * is bit-identical to the batch recursive-CTE/mapPartitions result
  * whether the sequence lands in one batch or many
  * ([[HmmStreamSpec]] pins this against the BATCH QUERY'S OWN
  * emission). Like the other sequential-recurrence twins (Holt,
  * Kalman, PageHinkley, ACF), the filter is a function of the
  * observation SEQUENCE: batches must arrive time-ordered for
  * cross-batch state to compose; within a batch rows are sorted by
  * (t). Update mode: each batch emits the posterior for every row it
  * folded — the live regime read a monitoring dashboard polls.
  *
  * State is (a1, a2, n, started) per series — O(1)/key.
  */
object HmmStream {

  case class HmmState(a1: Double, a2: Double, n: Long, started: Boolean)
  case class HmmOut(series: String, t: Long, obs: Long, p_high: Double)

  /** One forward step in the batch query's operation order. */
  def step(st: HmmState, obs: Long): HmmState = {
    val b1 = if (obs == 1) 0.8 else 0.2
    val b2 = if (obs == 1) 0.3 else 0.7
    if (!st.started) HmmState(b1 * 0.5, b2 * 0.5, st.n + 1, started = true)
    else {
      val s0 = st.a1 + st.a2
      val p1 = st.a1 / s0; val p2 = st.a2 / s0
      HmmState(b1 * (p1 * 0.9 + p2 * 0.2), b2 * (p1 * 0.1 + p2 * 0.8),
        st.n + 1, started = true)
    }
  }

  /** rows: (series, t, obs) with obs in {0, 1}. */
  def apply(rows: Dataset[(String, Long, Long)]): Dataset[HmmOut] = {
    implicit val stateEnc = Encoders.product[HmmState]
    implicit val outEnc = Encoders.product[HmmOut]
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_._1)
      .flatMapGroupsWithState[HmmState, HmmOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (series, it, state: GroupState[HmmState]) =>
          val batch = it.toArray.sortBy(_._2)
          var st = state.getOption.getOrElse(
            HmmState(0.0, 0.0, 0L, started = false))
          val out = batch.map { case (_, t, obs) =>
            st = step(st, obs)
            HmmOut(series, t, obs, st.a1 / (st.a1 + st.a2))
          }
          state.update(st)
          out.iterator
      }
  }

  val outputMode: OutputMode = OutputMode.Update()
}
