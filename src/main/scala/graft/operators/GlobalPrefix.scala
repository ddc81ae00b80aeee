package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global prefix aggregates over a total order — the shared
  * two-pass pattern behind `q_window_pct`, `q_token_budget`,
  * `q_equi_bins`, and `q_skyline`.
  *
  * A naive `Window.orderBy(...)` with no partition key sends the whole
  * table through ONE task (Spark warns about exactly this). Instead:
  * range-partition on the sort key so partition order equals sort
  * order, compute the prefix aggregate pid-locally, then lift to
  * global with a (#partitions)-row offset table joined back by pid.
  * Two passes, all-parallel, no single-task stage at any scale.
  *
  * The pid-stamped rows are localCheckpointed because they fan out to
  * two consumers (the local window and the per-pid totals) and
  * correctness requires both to observe the SAME
  * `spark_partition_id()` assignment — without it, AQE re-planning or
  * a partial recompute after executor loss could re-sample the range
  * partitioner between consumers (round-4 advice). This invariant
  * lives ONLY here, in the shared core.
  */
object GlobalPrefix {

  /** Shared two-pass core. Parameterized by the aggregate (sum/max),
    * the local frame end (0 = inclusive of the current row, -1 =
    * exclusive), and how a row's local prefix combines with the
    * preceding partitions' offset. Returns (result, per-pid totals).
    */
  private def twoPass(df: DataFrame, sortCols: Seq[Column], value: Column,
      out: String, frameEnd: Long, aggFn: Column => Column,
      combine: (Column, Column) => Column): (DataFrame, DataFrame) = {
    // SERIALIZED storage: the deserialized default holds the stamped
    // rows as Java objects — at the 100× ScaleCheck corpus (60M
    // lineitem rows vs an 8g driver heap) that meant heavy spill + GC
    // and q_equi_bins measured 21.6× for 10× data; serialized blocks
    // spill as compact bytes (measured 21.6× → 11.5-12.3×, at a
    // +0.3-0.4 s serialization tax on the sf0.1 bench — NOTES "100×
    // checkpoint").
    val stamped = df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val wLoc = Window.partitionBy("__pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, frameEnd)
    val local = stamped.withColumn("__lc", aggFn(value).over(wLoc))
    val perPid = stamped.groupBy("__pid").agg(aggFn(value).as("__t"))
    // #partitions rows — the one intentionally tiny global window.
    val wPid = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perPid
      .withColumn("__off", aggFn(col("__t")).over(wPid))
      .select(col("__pid"), col("__off"))
    val result = local.join(broadcast(offsets), "__pid")
      .withColumn(out, combine(col("__lc"), col("__off")))
      .drop("__pid", "__lc", "__off")
    (result, perPid)
  }

  /** Adds `out` = running sum of `value` over the total order given by
    * `sortCols` (inclusive of the current row). `sortCols` must be a
    * unique ordering for the result to be well-defined.
    */
  def runningTotal(df: DataFrame, sortCols: Seq[Column], value: Column,
      out: String): DataFrame =
    runningTotalWithGrand(df, sortCols, value, out)._1

  /** As [[runningTotal]], and also returns the 1-row grand total
    * (column `__grand`) derived from the per-partition totals — so a
    * caller needing "share of total" math doesn't pay a second
    * corpus-sized aggregation.
    */
  def runningTotalWithGrand(df: DataFrame, sortCols: Seq[Column],
      value: Column, out: String): (DataFrame, DataFrame) = {
    val (result, perPid) = twoPass(df, sortCols, value, out,
      frameEnd = 0, aggFn = sum,
      // first partition has no predecessors: empty sum is 0
      combine = (lc, off) => lc + coalesce(off, lit(0L)))
    (result, perPid.agg(sum(col("__t")).as("__grand")))
  }

  /** Adds `out` = running MAX of `value` over the total order given by
    * `sortCols`, EXCLUSIVE of the current row (NULL for the global
    * first row) — the prefix shape of skyline/Pareto and
    * record-so-far computations. `greatest` ignores NULLs, so empty
    * prefixes need no sentinel.
    */
  def runningMaxExclusive(df: DataFrame, sortCols: Seq[Column],
      value: Column, out: String): DataFrame =
    twoPass(df, sortCols, value, out,
      frameEnd = -1, aggFn = max,
      combine = (lc, off) => greatest(lc, off))._1
}
