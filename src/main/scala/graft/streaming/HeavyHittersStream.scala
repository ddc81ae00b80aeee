package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `q_freq_items` sketch: per-bucket
  * Misra–Gries heavy-hitter summaries carried across micro-batches
  * with O(k) state per bucket — find the hot tokens in an unbounded
  * stream without ever holding a full token-frequency table.
  *
  * Parallelism: the caller buckets tokens (hash(token) % P), giving P
  * independent summaries that Spark distributes as ordinary keyed
  * state. Each token lives in EXACTLY ONE bucket, so per-bucket
  * guarantees stand alone — this is a partitioned MG, not a merged
  * one, and no cross-bucket reconciliation is needed (the same
  * partition-by-key shape the batch `freqItems` uses per executor).
  *
  * Guarantee (classic MG, preserved by the batched merge used here —
  * Agarwal et al., "Mergeable Summaries", PODS'12): after any prefix
  * of the stream, a token whose true count in its bucket exceeds
  * n_bucket/(k+1) is PRESENT in that bucket's summary, and every
  * reported lower_count satisfies
  * true − n_bucket/(k+1) ≤ lower_count ≤ true (undercount-only).
  * `HeavyHittersStreamSpec` pins both properties against exact counts
  * under one-batch and multi-batch arrival.
  *
  * Per batch the group folds its rows into exact in-batch counts
  * first (one hash map), merges them into the k counters, and applies
  * ONE collective decrement by the (k+1)-largest value — O(batch +
  * k log k) per bucket per batch, independent of stream length.
  */
object HeavyHittersStream {

  case class MgState(tokens: Array[String], counts: Array[Long], processed: Long)
  case class MgOut(bucket: Int, token: String, lower_count: Long, processed: Long)

  /** rows: (bucket, token). Emits every bucket's current summary on
    * each batch that touches it (Update mode downstream). */
  def apply(rows: Dataset[(Int, String)], k: Int): Dataset[MgOut] = {
    implicit val stateEnc = Encoders.product[MgState]
    implicit val outEnc = Encoders.product[MgOut]
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_._1)
      .flatMapGroupsWithState[MgState, MgOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (bucket, it, state: GroupState[MgState]) =>
          val acc = scala.collection.mutable.HashMap.empty[String, Long]
          state.getOption.foreach { s =>
            s.tokens.indices.foreach(i => acc(s.tokens(i)) = s.counts(i))
          }
          var n = state.getOption.map(_.processed).getOrElse(0L)
          it.foreach { case (_, tok) =>
            acc(tok) = acc.getOrElse(tok, 0L) + 1L
            n += 1L
          }
          if (acc.size > k) {
            // batched MG decrement: subtract the (k+1)-largest value
            // from everything; ≤ k survivors keep the error bound
            val t = acc.values.toArray.sorted(Ordering[Long].reverse).apply(k)
            val dead = acc.collect { case (w, c) if c - t <= 0 => w }
            dead.foreach(acc.remove)
            acc.keys.toArray.foreach(w => acc(w) = acc(w) - t)
          }
          val (toks, cnts) = acc.toArray.sortBy(_._1).unzip
          state.update(MgState(toks, cnts, n))
          toks.indices.iterator.map(i => MgOut(bucket, toks(i), cnts(i), n))
      }
  }

  /** The output mode this operator requires downstream. */
  val outputMode: OutputMode = OutputMode.Update()
}
