package graft.streaming

/** Progress arithmetic (SURVEY.md §2.1 A8): the reference maintains a
  * per-video stream-progress percentage that is capped by the
  * producer's progress, never exceeds 100, and never decreases
  * (/root/reference streams/pipeline/progress.py:52-153). The fcntl
  * file-locking transport is replaced by StreamingQueryListener
  * metrics; the arithmetic itself is pure and lives here.
  */
object Progress {

  /** Next stream-progress value: min(raw, producerProgress, 100),
    * floored at the previous value (monotone). */
  def update(prev: Double, rawPct: Double, producerPct: Double): Double =
    math.max(prev, math.min(100.0, math.min(rawPct, producerPct)))

  /** Finalize pins the terminal value: full if the producer finished,
    * else frozen at the producer's cap. */
  def finalizeValue(prev: Double, producerPct: Double): Double =
    math.max(prev, math.min(100.0, producerPct))

  /** Force an update near completion even off-cadence (reference
    * should_force_update: within `threshold` of done, or done). */
  def shouldForceUpdate(pct: Double, threshold: Double = 5.0): Boolean =
    pct >= 100.0 - threshold
}
