package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-window distribution drift vs a FIXED reference — the
  * streaming twin of the batch `q_wasserstein_1d`/`q_ks_drift` pair
  * (the 19th batch/stream twin): each open window carries its
  * cent-value histogram as keyed state (the HdrSketchStream state
  * shape, exact values instead of log buckets since the support is
  * domain-bounded) and, when the watermark closes the window, emits
  * the SAME integer-exact drift numerators the batch operators
  * compute — W₁ = Σ|cum_w·n_ref − cum_ref·n_w|·gap and
  * KS = max|cum_w·n_ref − cum_ref·n_w| over the merged support —
  * against a reference histogram fixed at stream start (yesterday's
  * distribution, a golden sample: the production drift-monitor
  * setup).
  *
  * The histogram is a pure function of the window's value multiset,
  * so arrival order and micro-batch splits cannot move the output —
  * [[DriftStreamSpec]] pins bit-equality against the batch
  * q_wasserstein_1d computation over the same rows.
  */
object DriftStream {

  case class ValueEvent(ts: Timestamp, cents: Long)
  case class WindowDrift(window_start: Timestamp, n: Long,
      w1_scaled: Long, ks_scaled: Long, w1: Double, ks_stat: Double)
  case class DriftState(vals: Array[Long], cnt: Array[Long], n: Long)

  /** The batch operators' integer-exact drift numerators, off two
    * histograms: (W₁ scaled, KS scaled) with the batch scaling
    * n_w·n_ref (divide by it — and ×100 for W₁'s cent width — to get
    * the statistics). */
  def driftScaled(win: Map[Long, Long], ref: Map[Long, Long])
      : (Long, Long) = {
    val nw = win.valuesIterator.sum
    val nr = ref.valuesIterator.sum
    val support = (win.keySet ++ ref.keySet).toArray.sorted
    var (cw, cr, w1, ks) = (0L, 0L, 0L, 0L)
    var i = 0
    while (i < support.length) {
      val v = support(i)
      cw += win.getOrElse(v, 0L)
      cr += ref.getOrElse(v, 0L)
      val ad = math.abs(cw * nr - cr * nw)
      if (ad > ks) ks = ad
      if (i + 1 < support.length) w1 += ad * (support(i + 1) - v)
      i += 1
    }
    (w1, ks)
  }

  /** Hard cap on per-window distinct values (r11 VERDICT #5) — same
    * contract as [[RankSketchStream.MaxDistinctDefault]]: the exact
    * histogram is the parity guarantee, so hostile cardinality fails
    * fast with a sizing message instead of OOMing the state store. */
  val MaxDistinctDefault: Int = 1 << 18

  def apply(ds: Dataset[ValueEvent], reference: Map[Long, Long],
      windowSec: Long, watermarkDelay: String,
      maxDistinct: Int = MaxDistinctDefault): Dataset[WindowDrift] = {
    implicit val stateEnc = Encoders.product[DriftState]
    implicit val outEnc = Encoders.product[WindowDrift]
    import ds.sparkSession.implicits._
    val nr = reference.valuesIterator.sum
    // an empty reference would make every finalized window NaN/Inf
    // (w1/ks divide by n*nr); fail at wiring time, not in the sink
    require(nr > 0, s"DriftStream needs a non-empty reference histogram (got $nr observations)")
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(e => e.ts.getTime / 1000 / windowSec * windowSec)
      .flatMapGroupsWithState[DriftState, WindowDrift](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wstartSec, it, state: GroupState[DriftState]) =>
          val endMs = (wstartSec + windowSec) * 1000
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            val hist = s.vals.zip(s.cnt).toMap
            val (w1, ks) = driftScaled(hist, reference)
            val denom = s.n.toDouble * nr
            Iterator.single(WindowDrift(new Timestamp(wstartSec * 1000),
              s.n, w1, ks, w1 / denom / 100, ks / denom))
          } else if (endMs <= state.getCurrentWatermarkMs()) {
            Iterator.empty // late rows never re-open a finalized window
          } else {
            val s0 = state.getOption.getOrElse(
              DriftState(Array.empty, Array.empty, 0L))
            val hist = scala.collection.mutable.HashMap.empty[Long, Long]
            s0.vals.indices.foreach(i => hist.update(s0.vals(i), s0.cnt(i)))
            var n = s0.n
            it.foreach { e =>
              hist.update(e.cents, hist.getOrElse(e.cents, 0L) + 1L)
              n += 1
            }
            if (hist.size > maxDistinct)
              throw new IllegalStateException(
                s"DriftStream: window $wstartSec holds ${hist.size} " +
                  s"distinct values > cap $maxDistinct. The exact-histogram " +
                  "state is value-domain-bounded by contract; for unbounded " +
                  "domains use HdrSketchStream (log buckets) instead.")
            val ks = hist.keysIterator.toArray
            state.update(DriftState(ks, ks.map(hist), n))
            state.setTimeoutTimestamp(endMs)
            Iterator.empty
          }
      }
  }

  val outputMode: OutputMode = OutputMode.Append()
}
