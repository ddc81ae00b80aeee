package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming incremental materialized view — the streaming twin of the
  * batch `q_incr_agg` mergeable-partial-state operator: a per-user
  * (n, total) aggregate table continuously maintained from an event
  * stream via `foreachBatch` + the q_merge_upsert full-outer merge.
  *
  * Exactly-once without a table format: `foreachBatch` is
  * at-least-once (a crashed micro-batch re-runs with the SAME
  * batchId), so each merge publishes to an immutable `v=<batchId>`
  * directory and flips a `_LATEST` pointer file via temp-file +
  * atomic rename; a replayed batchId ≤ the pointer is a no-op. That
  * (version dirs + pointer + idempotency guard) is exactly the
  * commit protocol Delta/Iceberg provide — spelled out here because
  * this container has no table-format jars, and swapping `applyBatch`
  * for `MERGE INTO` keeps every other line unchanged.
  *
  * Scale: per batch, ONE partial aggregation of the micro-batch (tiny)
  * + one full-outer shuffle against the current MV keyed on user_id.
  * At 100 TB the MV side is a bucketed table so the merge is
  * shuffle-free on the MV side; counts are longs and totals
  * DECIMAL(18,6) — mergeable, order-independent, no double drift
  * across days of incremental maintenance.
  */
object IncrMvStream {

  import StreamJoins.Purchase

  val mvSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("n", LongType),
    StructField("total", DecimalType(18, 6))))

  private def latestPath(mv: String) = new Path(mv, "_LATEST")

  /** The published version id, if any.
    *
    * The pointer file is authoritative when present. When it is
    * ABSENT but committed `v=<id>` directories exist, resolve to the
    * max committed version instead of "no MV": on filesystems where
    * rename-onto-existing fails (HDFS), publish goes through a
    * delete+rename window, and a crash between the two would
    * otherwise lose the pointer permanently — the next applyBatch
    * would then merge its delta against an EMPTY view and silently
    * discard all accumulated state (and the replayed-batchId guard
    * with it). "Committed" = the directory carries Spark's _SUCCESS
    * marker, so a half-written version from a mid-write crash can
    * never be resolved as current. */
  def readLatest(spark: SparkSession, mv: String): Option[Long] = {
    val fs = FileSystem.get(new java.net.URI(mv), spark.sparkContext.hadoopConfiguration)
    val p = latestPath(mv)
    if (fs.exists(p)) {
      val in = fs.open(p)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    } else committedVersions(fs, mv).map(_._1).maxOption
  }

  /** Committed `v=<id>` directories (those with a _SUCCESS marker),
    * unsorted. */
  private def committedVersions(fs: FileSystem, mv: String): Seq[(Long, Path)] = {
    val root = new Path(mv)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .flatMap(st => scala.util.Try(st.getPath.getName.stripPrefix("v=").toLong)
        .toOption.map(_ -> st.getPath))
      .filter { case (_, p) => fs.exists(new Path(p, "_SUCCESS")) }
  }

  /** The current MV contents (empty frame with the MV schema before
    * the first publish). */
  def readMv(spark: SparkSession, mv: String): DataFrame =
    readLatest(spark, mv) match {
      case Some(v) => spark.read.parquet(s"$mv/v=$v")
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], mvSchema)
    }

  /** Merge one micro-batch into the MV. Idempotent: a batchId at or
    * below the published pointer has already been applied (foreachBatch
    * replay after a crash) and is skipped. */
  def applyBatch(batch: DataFrame, mv: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val latest = readLatest(spark, mv)
    if (latest.exists(_ >= batchId)) return
    val delta = batch
      .groupBy("user_id")
      .agg(count(lit(1)).as("d_n"),
        sum(col("amount").cast("decimal(18,6)")).cast("decimal(18,6)").as("d_total"))
    val merged = readMv(spark, mv)
      .join(delta, Seq("user_id"), "full")
      .select(col("user_id"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(0).cast("decimal(18,6)"))
          + coalesce(col("d_total"), lit(0).cast("decimal(18,6)")))
          .cast("decimal(18,6)").as("total"))
    merged.write.mode("overwrite").parquet(s"$mv/v=$batchId")
    // publish: temp file + atomic rename, so a reader sees the old
    // version or the new one, never a torn pointer. Where
    // rename-onto-existing fails (HDFS) we fall back to
    // delete+rename; the window that opens (and a crash inside it)
    // is covered by readLatest's max-committed-version fallback —
    // a missing pointer resolves to the newest _SUCCESS-marked
    // version, never to an empty MV.
    val fs = FileSystem.get(new java.net.URI(mv), spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(mv, s"._LATEST.$batchId.tmp")
    val out = fs.create(tmp, true)
    try out.write(batchId.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, latestPath(mv))) {
      fs.delete(latestPath(mv), false)
      if (!fs.rename(tmp, latestPath(mv)))
        throw new java.io.IOException(s"cannot publish _LATEST for batch $batchId")
    }
  }

  /** Retention janitor: drop published `v=<id>` directories older than
    * the `keepLast` most recent, never touching the pointer's current
    * version. Old versions exist only to keep in-flight readers valid
    * (a reader that resolved `_LATEST` just before a publish still
    * reads a complete directory) — after a retention window they are
    * dead weight, exactly like expired table-format snapshots. Returns
    * the dropped version ids. */
  def vacuum(spark: SparkSession, mv: String, keepLast: Int = 2): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the current version")
    val fs = FileSystem.get(new java.net.URI(mv), spark.sparkContext.hadoopConfiguration)
    val root = new Path(mv)
    if (!fs.exists(root)) return Nil
    val versions = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .flatMap(st => scala.util.Try(st.getPath.getName.stripPrefix("v=").toLong)
        .toOption.map(_ -> st.getPath))
      .sortBy(_._1)
    val current = readLatest(spark, mv)
    val drop = versions.dropRight(keepLast)
      .filterNot { case (v, _) => current.contains(v) }
    // report only versions that actually went away — a false delete
    // (permissions, concurrent removal) must not be audited as dropped
    drop.collect { case (v, p) if fs.delete(p, true) => v }
  }

  /** Start continuous maintenance of the MV at `mv` from `ds`. */
  def start(ds: Dataset[Purchase], mv: String, checkpoint: String): StreamingQuery =
    ds.writeStream
      .foreachBatch((batch: Dataset[Purchase], id: Long) =>
        applyBatch(batch.toDF(), mv, id))
      .option("checkpointLocation", checkpoint)
      .start()
}
