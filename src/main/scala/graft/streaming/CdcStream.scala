package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `q_cdc_apply` operator: last-writer-
  * wins changelog compaction carried across micro-batches with per-key
  * state. Unlike the EWMA/Kalman recurrences this state merge is
  * COMMUTATIVE — the winner is the max (ts_us, event_id) record and
  * n_ops is a plain count — so arrival order across micro-batches
  * cannot change the result at all (no in-batch sort needed either;
  * the fold tracks the max as it scans). This is the always-
  * consistent half of the streaming-twin family, and the spec proves
  * parity under a SHUFFLED multi-batch split, not just a time-ordered
  * one.
  *
  * State is one (ts, eid, op, value, n) record per key — O(1)/key.
  */
object CdcStream {

  case class CdcState(tsUs: Long, eid: Long, op: String, value: Double, n: Long)
  case class CdcOut(user_id: Long, n_ops: Long, last_op: String,
      is_live: Boolean, last_value: Double, last_ts_us: Long)

  /** rows: (user_id, op, value, ts_us, event_id). Emits the compacted
    * record per key on every batch (Update mode downstream). */
  def apply(rows: Dataset[(Long, String, Double, Long, Long)]): Dataset[CdcOut] = {
    implicit val stateEnc = Encoders.product[CdcState]
    implicit val outEnc = Encoders.product[CdcOut]
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_._1)
      .mapGroupsWithState[CdcState, CdcOut](GroupStateTimeout.NoTimeout) {
        (uid, it, state: GroupState[CdcState]) =>
          var st = state.getOption.getOrElse(CdcState(Long.MinValue, Long.MinValue, "", 0.0, 0L))
          it.foreach { case (_, op, value, tsUs, eid) =>
            val newer = tsUs > st.tsUs || (tsUs == st.tsUs && eid > st.eid)
            st = CdcState(
              if (newer) tsUs else st.tsUs,
              if (newer) eid else st.eid,
              if (newer) op else st.op,
              if (newer) value else st.value,
              st.n + 1)
          }
          state.update(st)
          // HALF_UP to match the batch side's round(value, 2)
          // (Spark round = BigDecimal HALF_UP, not rint's half-even)
          CdcOut(uid, st.n, st.op, st.op != "D",
            BigDecimal(st.value).setScale(2, BigDecimal.RoundingMode.HALF_UP)
              .toDouble, st.tsUs)
      }
  }

  val outputMode: OutputMode = OutputMode.Update()
}
