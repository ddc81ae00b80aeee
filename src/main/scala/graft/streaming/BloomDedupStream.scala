package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming approximate dedup with BOUNDED state — the streaming
  * twin of `q_dedup_exact`/`q_dedup_fingerprint` for infinite
  * streams. Exact streaming dedup (`dropDuplicates`, or
  * `dropDuplicatesWithinWatermark` beyond its window) carries one
  * state row per distinct key, so its state grows with the true
  * distinct count forever; this operator carries P Bloom filters of
  * m bits each — O(P·m/8) bytes TOTAL at any cardinality — and trades
  * that bound for a quantified false-positive rate (a novel row
  * wrongly suppressed with p ≈ (1 − e^(−k·n/m))^k; never the
  * reverse: a key that was seen is NEVER emitted again).
  *
  * Sharding: keys hash-partition across P buckets
  * (`flatMapGroupsWithState` keyed by bucket), so insert work and
  * state spread over the cluster like any keyed stream; the per-key
  * hash functions are the portable salted-md5 family (h32 convention)
  * so behavior is reproducible across runs and engines. NoTimeout:
  * the filter IS the bounded memory — nothing to expire. (A
  * production variant rotates generations of filters to re-admit
  * ancient keys; the rotation is a state swap in the same operator
  * shape.)
  */
object BloomDedupStream {

  case class Keyed(fp: String)
  case class BloomState(bits: Array[Byte])
  case class Novel(fp: String)

  /** First 32 md5 bits of `salt:fp` — the portable h32 family (must
    * match graft.functions.TextFunctions.h32Salted semantics). */
  private[streaming] def h32Salted(salt: Int, fp: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"$salt:$fp".getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Analytic false-positive bound after n inserts. */
  def fpRate(n: Long, mBits: Int, k: Int): Double =
    math.pow(1.0 - math.exp(-k.toDouble * n / mBits), k.toDouble)

  /** Emits each fingerprint the first time its bucket's filter has
    * not seen it (Update mode downstream). `mBits` per bucket, `k`
    * hash probes, `buckets`-way sharding. */
  def apply(ds: Dataset[Keyed], buckets: Int, mBits: Int, k: Int): Dataset[Novel] = {
    require(mBits % 8 == 0 && k >= 1 && buckets >= 1)
    implicit val stateEnc = Encoders.product[BloomState]
    implicit val outEnc = Encoders.product[Novel]
    ds.groupByKey(e => h32Salted(0, e.fp) % buckets)(Encoders.scalaLong)
      .flatMapGroupsWithState[BloomState, Novel](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_, it, state: GroupState[BloomState]) =>
          val bits = state.getOption.map(_.bits)
            .getOrElse(new Array[Byte](mBits / 8))
          val out = Seq.newBuilder[Novel]
          var changed = false
          it.foreach { e =>
            val pos = (1 to k).map(i => (h32Salted(i, e.fp) % mBits).toInt)
            val seen = pos.forall(p => (bits(p >> 3) & (1 << (p & 7))) != 0)
            if (!seen) {
              pos.foreach(p => bits(p >> 3) = (bits(p >> 3) | (1 << (p & 7))).toByte)
              changed = true
              out += Novel(e.fp)
            }
          }
          if (changed) state.update(BloomState(bits))
          out.result().iterator
      }
  }

  /** The output mode this operator requires downstream. */
  val outputMode: OutputMode = OutputMode.Update()
}
