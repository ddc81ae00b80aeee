package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the Structured Streaming
  * enrichment primitive the batch `q_join_range` / `q_asof_join`
  * operators correspond to in flight: correlate two live streams
  * (e.g. purchases against the page views that preceded them) without
  * ever materializing either side.
  *
  * Scale mechanics, and why the watermarks are load-bearing: a
  * stream-stream join buffers BOTH sides in the state store until a
  * match can be ruled out. The pair (watermark delay, join time
  * bound) is what lets Spark evict: a buffered view older than
  * `watermark + windowSec` behind the purchase watermark can never
  * match a future purchase, so state stays O(throughput × window)
  * per key range instead of growing without bound — the difference
  * between a join that runs forever and one that OOMs on day two.
  * Both inputs shuffle-partition on user_id; at production scale the
  * RocksDB state-store profile (StreamingRocksDbSpec) keeps the
  * buffers on disk.
  */
object StreamJoins {

  case class Purchase(user_id: Long, ts: Timestamp, amount: Double)
  case class View(v_user: Long, vts: Timestamp, page: String)

  /** Inner interval join: each purchase matched to every view by the
    * same user in the trailing `windowSec` seconds (vts ∈
    * [ts − windowSec, ts]). Works identically on streaming and batch
    * inputs — the parity contract StreamJoinSpec pins — except that
    * batch frames skip the watermark (no state to evict).
    */
  def purchaseViews(purchases: Dataset[Purchase], views: Dataset[View],
      windowSec: Long, watermarkDelay: String): DataFrame = {
    val p =
      if (purchases.isStreaming) purchases.withWatermark("ts", watermarkDelay)
      else purchases.toDF()
    val v =
      if (views.isStreaming) views.withWatermark("vts", watermarkDelay)
      else views.toDF()
    p.join(v,
      col("user_id") === col("v_user")
        && col("vts") >= col("ts") - expr(s"INTERVAL $windowSec SECONDS")
        && col("vts") <= col("ts"))
      .select(col("user_id"), col("ts"), col("amount"),
        col("vts"), col("page"))
  }

  /** Exactly-once-ish stream dedup: drop rows whose key was already
    * seen within the watermark horizon. Unlike a plain
    * `dropDuplicates` on a stream (state grows with the TRUE distinct
    * count, forever), `dropDuplicatesWithinWatermark` evicts each
    * key's state once the event-time watermark passes it — bounded
    * state for the at-least-once-source dedup case where duplicates
    * arrive close together (retries, replays), which is the only case
    * that occurs in practice. The BloomDedupStream twin covers the
    * unbounded-horizon probabilistic variant.
    */
  def dedupWithinWatermark(events: Dataset[Purchase],
      watermarkDelay: String): Dataset[Purchase] =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("user_id", "ts")
}
