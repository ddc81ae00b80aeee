package graft.streaming

import java.sql.Timestamp

import org.apache.datasketches.hll.{HllSketch, TgtHllType}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-window distinct-user estimation — the streaming twin
  * of the batch HLL path (`q_sliding_distinct_approx`'s daily-sketch
  * stage): one HLL sketch of the window's user ids carried as keyed
  * state, finalized exactly once when the watermark passes window end.
  * This is how a stream counts uniques at scale: `dropDuplicates`
  * state grows with the true cardinality, while the sketch is a few
  * KB per open window at any cardinality, and the emitted sketch
  * BYTES are mergeable downstream (trailing-window union, cross-source
  * rollups) exactly like the batch daily sketches.
  *
  * The sketch parameters (lgK=12, HLL_8) match Spark's
  * `hll_sketch_agg` defaults, and updates go through the same
  * DataSketches library Spark wraps — so for the same window's user
  * set the streaming estimate is BIT-IDENTICAL to the batch
  * `hll_sketch_estimate(hll_sketch_agg(user_id))`, which is what the
  * parity spec asserts (HLL state is a pure function of the inserted
  * VALUE SET — arrival order and batching cannot move it).
  *
  * Window finalization mechanics (event-time timeout + explicit
  * late-row drop) follow [[DriftStream]].
  */
object DistinctStream {

  case class UserEvent(ts: Timestamp, userId: Long)
  // users_est is LONG — matching Spark's hll_sketch_estimate result
  // type so the batch/stream parity is an exact integer equality
  case class WindowDistinct(window_start: Timestamp, n_events: Long, users_est: Long)
  case class SketchState(bytes: Array[Byte], nEvents: Long)

  /** lgK matching Spark's hll_sketch_agg default, so batch and stream
    * estimates agree exactly on the same value set. */
  private val LgK = 12

  def apply(ds: Dataset[UserEvent], windowSec: Long, watermarkDelay: String)
      : Dataset[WindowDistinct] = {
    implicit val stateEnc = Encoders.product[SketchState]
    implicit val outEnc = Encoders.product[WindowDistinct]
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(e => e.ts.getTime / 1000 / windowSec * windowSec)
      .flatMapGroupsWithState[SketchState, WindowDistinct](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wstartSec, it, state: GroupState[SketchState]) =>
          val endMs = (wstartSec + windowSec) * 1000
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            val sk = HllSketch.heapify(Memory.wrap(s.bytes))
            Iterator.single(WindowDistinct(new Timestamp(wstartSec * 1000),
              s.nEvents, Math.round(sk.getEstimate)))
          } else if (endMs <= state.getCurrentWatermarkMs()) {
            // late rows for a finalized window: drop, never re-open
            // (same append-mode contract as DriftStream)
            Iterator.empty
          } else {
            val (sk, n0) = state.getOption match {
              case Some(s) => (HllSketch.heapify(Memory.wrap(s.bytes)), s.nEvents)
              case None => (new HllSketch(LgK, TgtHllType.HLL_8), 0L)
            }
            var n = n0
            it.foreach { e => sk.update(e.userId); n += 1 }
            state.update(SketchState(sk.toCompactByteArray, n))
            state.setTimeoutTimestamp(endMs)
            Iterator.empty
          }
      }
  }

  /** The output mode this operator requires downstream. */
  val outputMode: OutputMode = OutputMode.Append()
}
