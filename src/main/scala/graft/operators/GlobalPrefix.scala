package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Scalable global prefix aggregates over a total order — the shared
  * two-pass pattern behind `q_window_pct`, `q_token_budget`,
  * `q_equi_bins`, `q_skyline`, and the KS/Mann-Whitney rank statistics.
  *
  * A naive `Window.orderBy(...)` with no partition key sends the whole
  * table through ONE task (Spark warns about exactly this). Instead:
  * assign each row a bucket id that is monotone in the sort order,
  * compute the prefix aggregate bucket-locally, then lift to global
  * with a (#buckets)-row offset table joined back by bucket id. Two
  * passes, all-parallel, no single-task stage at any scale.
  *
  * Bucket assignment is a PURE PROJECTION: boundaries come from a
  * bounded deterministic sample (hash-ordered `LIMIT`, one
  * TakeOrderedAndProject job, collected once on the driver — the same
  * sanctioned bounded-collect shape as `PqIndex`), and a row's bucket
  * is the count of boundaries at or below its key. Because the id is a
  * deterministic function of the ROW — not of `spark_partition_id()`
  * under a range exchange — AQE re-planning or partial recompute after
  * executor loss cannot disagree between the two consumers, and the
  * corpus-sized `localCheckpoint` the old range-exchange design needed
  * for pid stability disappears entirely. (That checkpoint was the
  * dominant cost at the 100× ScaleCheck decade: 60M stamped lineitem
  * rows written to driver-local storage before the window could run —
  * NOTES "100× checkpoint". Sample quality affects only balance, never
  * correctness: ties all land in one bucket, and the within-bucket
  * window re-sorts by the full key.)
  */
object GlobalPrefix {

  /** How many boundary-sample rows to collect per target bucket.
    * 64 keys/bucket bounds the expected bucket-size imbalance to a few
    * percent (standard sample-sort analysis) at a driver cost of
    * `buckets·64` tiny rows — same order as `RangePartitioner`'s own
    * reservoir sample, but deterministic. */
  private val SampleKeysPerBucket = 64

  /** A sort column decomposed to (value expression, ascending?).
    * Spark's defaults are asc⇒NULLS FIRST, desc⇒NULLS LAST; the
    * boundary predicates below encode exactly those, so explicit
    * NULLS overrides (asc_nulls_last / desc_nulls_first) are rejected
    * rather than silently mis-bucketed. */
  private def parseOrder(c: Column): (Column, Boolean) = {
    val (child, asc, defaultNulls) = Bridge.parseSortOrder(c)
    require(defaultNulls,
      s"GlobalPrefix supports default null ordering only, got: $c")
    (child, asc)
  }

  /** `boundary <' key` under the column's sort direction with Spark's
    * default null placement. Built in Scala when the boundary value is
    * null so no untyped `lit(null)` ever reaches analysis. */
  private def boundaryLess(b: Any, key: Column, asc: Boolean): Column =
    if (b == null) { if (asc) key.isNotNull else lit(false) }
    else if (asc) key.isNotNull && lit(b) < key
    else key.isNull || lit(b) > key

  /** `boundary ≤' key` on ONE component (the fused form — a boundary's
    * last compared component needs less-or-equal, and fusing it keeps
    * the generated code to a single comparison). */
  private def boundaryLessEq(b: Any, key: Column, asc: Boolean): Column =
    if (b == null) { if (asc) lit(true) else key.isNull }
    else if (asc) lit(b) <= key  // null key ⇒ null ⇒ false: nulls-first bucket 0
    else key.isNull || lit(b) >= key

  /** Lexicographic `boundary ≤' key` over the boundary's components
    * (boundaries may be TRUNCATED to a separating prefix — see
    * [[sampleBoundaries]] — so compare only `bs.length` columns). */
  private def boundaryLE(bs: Seq[Any], order: Seq[(Column, Boolean)]): Column = {
    def rec(i: Int): Column = {
      val (k, asc) = order(i)
      if (i == bs.length - 1) boundaryLessEq(bs(i), k, asc)
      else boundaryLess(bs(i), k, asc) ||
        ((k <=> lit(bs(i))) && rec(i + 1))
    }
    rec(0)
  }

  /** Unsigned lexicographic byte comparison — Spark's BinaryType
    * ordering, and (over UTF-8 bytes) its UTF8String ordering. */
  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** One value pair under SPARK's ordering, not Java's: strings
    * compare by UTF-8 bytes (UTF8String semantics — Java's UTF-16
    * compareTo disagrees beyond the BMP: U+E000.. sorts after a
    * surrogate-pair emoji in UTF-16 but before it in UTF-8, which
    * would break the bucket-monotonicity invariant), binary by
    * unsigned bytes, everything else via Comparable. */
  private def cmpVal(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) =>
      cmpBytes(x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case (x: Array[Byte], y: Array[Byte]) => cmpBytes(x, y)
    case _ => a.asInstanceOf[Comparable[Any]].compareTo(b)
  }

  /** Driver-side ordering matching the Spark sort order (directions +
    * default null placement) for ranking the collected sample. */
  private def rowOrdering(dirs: Seq[Boolean]): Ordering[Row] =
    (x: Row, y: Row) => {
      var i = 0
      var c = 0
      while (c == 0 && i < dirs.length) {
        val (a, b, asc) = (x.get(i), y.get(i), dirs(i))
        c =
          if (a == null && b == null) 0
          else if (a == null) { if (asc) -1 else 1 }  // asc: nulls first
          else if (b == null) { if (asc) 1 else -1 }
          else { val v = cmpVal(a, b); if (asc) v else -v }
        i += 1
      }
      c
    }

  /** Up to `buckets-1` strictly increasing (in sort order) boundary
    * tuples from a deterministic bounded sample of the key columns. */
  private def sampleBoundaries(df: DataFrame, order: Seq[(Column, Boolean)],
      buckets: Int): Seq[Seq[Any]] = {
    val keyCols = order.zipWithIndex.map { case ((c, _), i) => c.as(s"__k$i") }
    val keyed = df.select(keyCols: _*)
    // Hash-ordered limit ⇒ TakeOrderedAndProject: a uniform-ish,
    // run-deterministic sample in one bounded job over the pruned key
    // projection (no random(), so resume/retry can't see a different
    // bucketing).
    val sample = keyed
      .orderBy(xxhash64(keyed.columns.map(col).toSeq :+ lit(2027L): _*))
      .limit(buckets * SampleKeysPerBucket)
      .collect()
    if (sample.isEmpty) return Nil
    val sorted = sample.sorted(rowOrdering(order.map(_._2)))
    val picks = (1 until buckets)
      .map(i => sorted((i.toLong * sorted.length / buckets).toInt).toSeq)
    // adjacent duplicates collapse: equal boundaries would create
    // permanently-empty buckets and a non-strict bucket order
    val dd = picks.foldLeft(Vector.empty[Seq[Any]]) { (acc, b) =>
      if (acc.nonEmpty && acc.last == b) acc else acc :+ b
    }
    // Truncate each boundary to its FIRST component when that alone
    // separates it from both neighbors (true whenever the primary sort
    // key is near-unique — every production call site). The predicate
    // chain then degenerates to one comparison per boundary; the full
    // lexicographic form (31 boundaries × multi-column compares) Janino
    // compiles into one method too large for the JIT, and the whole
    // projection drops to bytecode interpretation — measured 26 s for a
    // 6M-row stamp vs sub-second truncated. Monotonicity survives
    // mixing truncated and full boundaries: adjacent first components
    // around a truncated boundary are strictly increasing, so the
    // predicate sets stay nested (P_{j+1} ⇒ P_j) and the bucket id
    // stays monotone in the sort order.
    def truncate(ds: Vector[Seq[Any]]): Vector[Seq[Any]] =
      ds.zipWithIndex.map { case (b, i) =>
        val sepPrev = i == 0 || ds(i - 1).head != b.head
        val sepNext = i == ds.length - 1 || ds(i + 1).head != b.head
        if (sepPrev && sepNext) Seq(b.head) else b
      }
    // JIT-size budget: heavily-TIED primary keys defeat truncation
    // (adjacent boundaries share heads and stay multi-column), and at
    // a large shuffle width (e.g. the stock 200) the rebuilt chain
    // would cross the same JIT method limit the truncation exists to
    // avoid. Cap total comparison units at 64 by halving the boundary
    // list until it fits — fewer, larger buckets: correctness and
    // codegen health over parallelism (a key set tied enough to
    // trigger this has little window parallelism to lose). Dropping
    // boundaries keeps heads non-decreasing, so re-truncating after a
    // halve stays sound.
    var cur = dd
    var out = truncate(cur)
    while (out.map(_.length).sum > 64 && cur.length > 1) {
      cur = cur.grouped(2).map(_.head).toVector
      out = truncate(cur)
    }
    out
  }

  /** Shared two-pass core. Parameterized by the aggregate (sum/max),
    * the local frame end (0 = inclusive of the current row, -1 =
    * exclusive), and how a row's local prefix combines with the
    * preceding buckets' offset. Returns (result, per-bucket totals).
    */
  private def twoPass(df: DataFrame, sortCols: Seq[Column], value: Column,
      out: String, frameEnd: Long, aggFn: Column => Column,
      combine: (Column, Column) => Column): (DataFrame, DataFrame) = {
    val order = sortCols.map(parseOrder)
    val buckets = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val bounds = sampleBoundaries(df, order, buckets)
    // bucket id = #boundaries ≤' key — a monotone pure projection; the
    // chain is buckets-1 codegen'd comparisons per row (tiny vs the
    // exchange it feeds)
    val bucketCol = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(boundaryLE(b, order), 1).otherwise(0)
    }
    val stamped = df.withColumn("__pid", bucketCol)
    val wLoc = Window.partitionBy("__pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, frameEnd)
    val local = stamped.withColumn("__lc", aggFn(value).over(wLoc))
    // second consumer recomputes the scan + stamp projection (cheap,
    // map-side partial agg) instead of reading a materialized corpus —
    // determinism of __pid makes the fork safe without a checkpoint
    val perPid = stamped.groupBy("__pid").agg(aggFn(value).as("__t"))
    // #buckets rows — the one intentionally tiny global window.
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
    * unique ordering for the result to be well-defined, and `df` must
    * be DETERMINISTIC under recomputation (every registered query is):
    * the two consumers recompute it independently — a nondeterministic
    * frame (unordered limit, sample) could show them different rows.
    * The old range-exchange design froze the input with a corpus-sized
    * localCheckpoint; determinism is the price of not materializing.
    */
  def runningTotal(df: DataFrame, sortCols: Seq[Column], value: Column,
      out: String): DataFrame =
    runningTotalWithGrand(df, sortCols, value, out)._1

  /** As [[runningTotal]], and also returns the 1-row grand total
    * (column `__grand`) derived from the per-bucket totals — so a
    * caller needing "share of total" math doesn't pay a second
    * corpus-sized aggregation.
    */
  def runningTotalWithGrand(df: DataFrame, sortCols: Seq[Column],
      value: Column, out: String): (DataFrame, DataFrame) = {
    val (result, perPid) = twoPass(df, sortCols, value, out,
      frameEnd = 0, aggFn = sum,
      // first bucket has no predecessors: empty sum is 0
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
