package graft.streaming

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-window KMV bottom-k sketch — the streaming twin of
  * the batch `q_bottomk_sample` operator (AggregateQueries): the k
  * smallest md5-uniform hashes of the window's DISTINCT user ids,
  * carried as keyed state and finalized exactly once when the
  * watermark passes window end. Like the batch side, the sketch is
  * simultaneously a deterministic uniform sample of the key space
  * (the ids ride along) and a distinct-count estimator
  * n̂ = (k−1)/u_(k); two streams' sketches merge by keeping the k
  * smallest of the union, so cross-source reconciliation exchanges
  * k hashes, not key sets.
  *
  * KMV state is a pure function of the inserted value SET — arrival
  * order, batch splits, and duplicate re-insertions cannot move it —
  * so for the same window's rows the streaming output is BIT-IDENTICAL
  * to the batch computation, which is what [[KmvStreamSpec]] asserts.
  * State is O(k) per open window regardless of cardinality (the
  * `dropDuplicates` alternative grows with the true distinct count).
  *
  * Hashing matches the batch query exactly: the first 15 hex chars of
  * md5(id.toString) as a 60-bit integer, normalized by 2^60.
  */
object KmvStream {

  case class UserEvent(ts: Timestamp, userId: Long)
  case class WindowKmv(window_start: Timestamp, n_events: Long, k_seen: Long,
      kth_hash: Double, est_distinct: Double, sample_id_sum: Long)
  /** k smallest (hash, id) pairs, ascending by hash; nEvents audit. */
  case class KmvState(hashes: Array[Double], ids: Array[Long], nEvents: Long)

  val K = 100

  /** The batch query's hash, reproduced byte-for-byte: 60-bit prefix
    * of md5(id.toString), uniform in [0, 1). */
  def hashOf(id: Long): Double = {
    val d = MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes(StandardCharsets.UTF_8))
    val hex = d.take(8).map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16) / 1152921504606846976.0
  }

  private def estimate(hashes: Array[Double], seen: Long): Double =
    if (hashes.length < K) seen.toDouble
    else (K - 1) / hashes.last

  def apply(ds: Dataset[UserEvent], windowSec: Long, watermarkDelay: String)
      : Dataset[WindowKmv] = {
    implicit val stateEnc = Encoders.product[KmvState]
    implicit val outEnc = Encoders.product[WindowKmv]
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(e => e.ts.getTime / 1000 / windowSec * windowSec)
      .flatMapGroupsWithState[KmvState, WindowKmv](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wstartSec, it, state: GroupState[KmvState]) =>
          val endMs = (wstartSec + windowSec) * 1000
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(WindowKmv(new Timestamp(wstartSec * 1000),
              s.nEvents, s.hashes.length.toLong,
              if (s.hashes.isEmpty) 0.0 else s.hashes.last,
              estimate(s.hashes, s.hashes.length.toLong), s.ids.sum))
          } else if (endMs <= state.getCurrentWatermarkMs()) {
            Iterator.empty // late rows never re-open a finalized window
          } else {
            val s0 = state.getOption.getOrElse(
              KmvState(Array.empty, Array.empty, 0L))
            // insert by (hash, id), dedup on id, cap at K smallest —
            // a sorted merge over O(k + batch) pairs
            var pairs = s0.hashes.zip(s0.ids)
            var n = s0.nEvents
            val incoming = scala.collection.mutable.ArrayBuffer[(Double, Long)]()
            it.foreach { e => n += 1; incoming += ((hashOf(e.userId), e.userId)) }
            // (hash, id) sort matches the batch ORDER BY hu, user_id
            pairs = (pairs ++ incoming).distinct
              .sortBy(p => (p._1, p._2)).take(K)
            state.update(KmvState(pairs.map(_._1), pairs.map(_._2), n))
            state.setTimeoutTimestamp(endMs)
            Iterator.empty
          }
      }
  }

  val outputMode: OutputMode = OutputMode.Append()
}
