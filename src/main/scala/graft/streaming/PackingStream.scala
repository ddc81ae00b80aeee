package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `q_sequence_packing` fold (the 16th
  * batch/stream pair): the greedy context-window packer as a stateful
  * per-shard stream — exactly how a streaming tokenizer shard packs
  * an unbounded doc feed. State per shard is the OPEN window's used
  * token count plus the running totals; each micro-batch folds its
  * docs in (doc_id) order with the same integer recurrence as the
  * batch operator (C = 512, docs pre-truncated by the caller, a doc
  * that doesn't fit closes the window), so windows/fill/waste are
  * bit-identical whether the shard's docs arrive in one batch or many
  * (time-ordered across batches; order-sensitive like EWMA/Kalman —
  * the commutative-state counterpart is CdcStream).
  *
  * State is (used, bins, nDocs, total) per shard — O(1)/key.
  */
object PackingStream {

  val C = 512L

  case class PState(used: Long, bins: Long, nDocs: Long, total: Long)
  case class POut(source: String, n_docs: Long, total_tokens: Long,
    n_windows: Long, waste_tokens: Long)

  /** rows: (source, doc_id, len) with len ≤ C already applied. */
  def apply(rows: Dataset[(String, Long, Long)]): Dataset[POut] = {
    implicit val stateEnc = Encoders.product[PState]
    implicit val outEnc = Encoders.product[POut]
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_._1)
      .mapGroupsWithState[PState, POut](GroupStateTimeout.NoTimeout) {
        (src, it, state: GroupState[PState]) =>
          val batch = it.toArray.sortBy(_._2)
          var st = state.getOption.getOrElse(PState(0L, 0L, 0L, 0L))
          batch.foreach { r =>
            st =
              if (st.bins == 0L || st.used + r._3 > C)
                PState(r._3, st.bins + 1, st.nDocs + 1, st.total + r._3)
              else
                PState(st.used + r._3, st.bins, st.nDocs + 1, st.total + r._3)
          }
          state.update(st)
          POut(src, st.nDocs, st.total, st.bins, st.bins * C - st.total)
      }
  }

  val outputMode: OutputMode = OutputMode.Update()
}
