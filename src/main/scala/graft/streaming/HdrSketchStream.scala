package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-window PORTABLE HDR-histogram quantiles — the
  * streaming twin of the batch `q_hdr_quantiles` operator (the 17th
  * batch/stream twin, and the 4th sketch family's stream side next to
  * DistinctStream/HllPortableStream, HeavyHittersStream, and
  * KmvStream): the same all-integer base-2/HdrHistogram bucketing
  * (bucket = (bitlen(v), next 6 bits), relative error ≤ 2⁻⁶), carried
  * as O(live buckets) keyed state per open window and finalized
  * exactly once when the watermark passes window end.
  *
  * The histogram is a pure function of the inserted value MULTISET
  * (per-bucket count-sum): arrival order and micro-batch splits cannot
  * move it — so for the same window's rows the streaming histogram,
  * and therefore every emitted quantile bucket bound, is BIT-IDENTICAL
  * to the batch computation, which is what [[HdrSketchStreamSpec]]
  * asserts against the batch query's own SQL expressions. Two streams'
  * windows merge by per-bucket ADD — O(buckets) counters exchanged,
  * never values — the same merge theorem `q_hdr_quantiles` checks as
  * data.
  *
  * Bucket math matches the batch query exactly: integer cents v ≥ 1,
  * bl = bitlength(v); v < 2⁷ gets the exact singleton bucket idx = v,
  * else idx = bl·64 + (v >> (bl−7)) − 64 with lower bound
  * (v >> (bl−7)) << (bl−7). Rank r_p = ⌈p·n/100⌉ via the shared
  * integer formula (p·n + 99) div 100; the emitted quantile is the
  * LOWER BOUND of the first bucket whose cumulative count reaches r_p
  * — within 2⁻⁶ of the true order statistic by the bucket guarantee.
  */
object HdrSketchStream {

  case class PriceEvent(ts: Timestamp, cents: Long)
  case class WindowQuantiles(window_start: Timestamp, n: Long,
      buckets_used: Long, p50_lb: Long, p95_lb: Long, p99_lb: Long)
  /** Parallel unsorted (idx, cnt) arrays — O(live buckets) bytes. */
  case class HdrState(idx: Array[Long], cnt: Array[Long], n: Long)

  val SubBits = 6

  /** (idx, lb, ub) of one value ≥ 1 — the batch query's bucket math,
    * reproduced integer-for-integer (bitlen via numberOfLeadingZeros
    * = length(bin(v)) for v ≥ 1). */
  def bucketOf(v: Long): (Long, Long, Long) = {
    require(v >= 1, s"HDR bucket of non-positive value $v")
    val bl = 64 - java.lang.Long.numberOfLeadingZeros(v)
    if (bl <= SubBits + 1) (v, v, v)
    else {
      val shift = bl - 1 - SubBits
      val top = v >>> shift
      val lb = top << shift
      (bl.toLong * 64 + top - 64, lb, lb + (1L << shift) - 1)
    }
  }

  /** Lower bound of a bucket index (inverse of [[bucketOf]]'s idx). */
  def lbOf(idx: Long): Long =
    if (idx < 128) idx
    else {
      val bl = (idx / 64).toInt
      ((idx % 64) + 64) << (bl - 1 - SubBits)
    }

  /** The batch rank formula: r_p = (p·n + 99) div 100, 1-based. */
  def rankOf(p: Int, n: Long): Long = (p * n + 99) / 100

  /** Quantile bucket lower bound off a finalized histogram. */
  def quantileLb(hist: Map[Long, Long], p: Int): Long = {
    val n = hist.valuesIterator.sum
    val r = rankOf(p, n)
    var cum = 0L
    hist.toSeq.sortBy(_._1).foreach { case (idx, c) =>
      cum += c
      if (cum >= r) return lbOf(idx)
    }
    -1L // empty histogram — callers only finalize non-empty windows
  }

  def apply(ds: Dataset[PriceEvent], windowSec: Long, watermarkDelay: String)
      : Dataset[WindowQuantiles] = {
    implicit val stateEnc = Encoders.product[HdrState]
    implicit val outEnc = Encoders.product[WindowQuantiles]
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(e => e.ts.getTime / 1000 / windowSec * windowSec)
      .flatMapGroupsWithState[HdrState, WindowQuantiles](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wstartSec, it, state: GroupState[HdrState]) =>
          val endMs = (wstartSec + windowSec) * 1000
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            val hist = s.idx.zip(s.cnt).toMap
            Iterator.single(WindowQuantiles(new Timestamp(wstartSec * 1000),
              s.n, hist.size.toLong, quantileLb(hist, 50),
              quantileLb(hist, 95), quantileLb(hist, 99)))
          } else if (endMs <= state.getCurrentWatermarkMs()) {
            Iterator.empty // late rows never re-open a finalized window
          } else {
            val s0 = state.getOption.getOrElse(
              HdrState(Array.empty, Array.empty, 0L))
            val hist = scala.collection.mutable.HashMap.empty[Long, Long]
            s0.idx.indices.foreach(i => hist.update(s0.idx(i), s0.cnt(i)))
            var n = s0.n
            it.foreach { e =>
              val (idx, _, _) = bucketOf(e.cents)
              hist.update(idx, hist.getOrElse(idx, 0L) + 1L)
              n += 1
            }
            val ks = hist.keysIterator.toArray
            state.update(HdrState(ks, ks.map(hist), n))
            state.setTimeoutTimestamp(endMs)
            Iterator.empty
          }
      }
  }

  /** The output mode this operator requires downstream. */
  val outputMode: OutputMode = OutputMode.Append()
}
