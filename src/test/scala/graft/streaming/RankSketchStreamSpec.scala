package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming ε-rank summary must be BIT-IDENTICAL to the batch
  * q_rank_sketch summary math over the same window's rows — the
  * summary is a pure function of the value multiset (exact per-value
  * cum ranks + the deterministic stride-crossing rule), so arrival
  * order and micro-batch splits cannot move it. The from-scratch fold
  * here reproduces the batch query's integer expressions (stride
  * s = (n+63) div 64, crossing cum div s > (cum−c) div s, forced max,
  * rank (p·n+99) div 100), so this spec also pins the Scala-side
  * summarize/quantile to the SQL. The merge tests pin the PODS'12
  * additive theorem the batch query checks as data: per-shard
  * summaries merged by est-rank addition answer global rank queries
  * within Σ strides.
  */
class RankSketchStreamSpec extends SparkSpec {

  import RankSketchStream._

  private val WindowSec = 60L

  private def ev(sec: Long, cents: Long) =
    PriceEvent(new Timestamp(sec * 1000), cents)

  test("summarize matches a from-scratch crossing fold; size <= k+1") {
    val rnd = new scala.util.Random(7)
    val vals = Vector.fill(5000)(100L + rnd.nextInt(2000).toLong) ++
      Vector.fill(800)(50L) // heavy value crossing several strides
    val hist = vals.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
    val n = vals.size.toLong
    val s = strideOf(n)
    val sk = summarize(hist)
    assert(sk.size <= K + 1, s"summary ${sk.size} rows exceeds k+1")
    // kept cums are the exact ranks at kept values
    val sorted = vals.sorted
    sk.foreach { case (v, cum) =>
      assert(sorted.count(_ <= v).toLong == cum, s"cum at $v")
    }
    // the max is always kept
    assert(sk.last._1 == sorted.last && sk.last._2 == n)
    // crossing rule: consecutive kept cums straddle a stride multiple
    sk.map(_._2).sliding(2).foreach {
      case Vector(a, b) => assert(b == n || b / s > a / s,
        s"non-crossing kept pair ($a, $b)")
      case _ =>
    }
  }

  test("single-summary quantile answers land within one stride of rank") {
    val rnd = new scala.util.Random(23)
    // lognormal-ish skew: the distribution that breaks value-domain
    // sketches is exactly where the rank-domain bound must hold
    val vals = Vector.fill(20000)(
      math.exp(rnd.nextGaussian() * 2 + 6).toLong.max(1L))
    val hist = vals.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
    val n = vals.size.toLong
    val sk = summarize(hist)
    val sorted = vals.sorted
    for (p <- Seq(50, 90, 95, 99)) {
      val a = quantile(sk, p, n)
      val r = rankOf(p, n)
      val le = sorted.count(_ <= a).toLong
      val lt = sorted.count(_ < a).toLong
      assert(le >= r, s"p$p: answer rank $le below target $r")
      assert(lt < r + strideOf(n), s"p$p: answer overshoots rank bound")
    }
  }

  test("merged summaries answer global ranks within the additive bound") {
    val rnd = new scala.util.Random(41)
    // three shards with DIFFERENT distributions (the cross-cluster
    // reconciliation case: uniform, shifted, heavy-tailed)
    val shards = Seq(
      Vector.fill(7000)(1000L + rnd.nextInt(5000).toLong),
      Vector.fill(3000)(4000L + rnd.nextInt(9000).toLong),
      Vector.fill(2000)(math.exp(rnd.nextGaussian() + 8).toLong.max(1L)))
    val summaries = shards.map(v =>
      summarize(v.groupBy(identity).map { case (k, g) => k -> g.size.toLong }))
    val pooled = shards.flatten.sorted
    val n = pooled.size.toLong
    val bound = shards.map(v => strideOf(v.size.toLong)).sum
    // est rank underestimates exact rank by < sum of strides, at
    // every kept value (the merge_ok check q_rank_sketch carries)
    summaries.flatten.map(_._1).distinct.foreach { v =>
      val est = mergedRank(summaries, v)
      val exact = pooled.count(_ <= v).toLong
      assert(est <= exact, s"est rank over exact at $v")
      assert(exact - est < bound, s"merge deficit ${exact - est} at $v")
    }
    for (p <- Seq(50, 90, 95, 99)) {
      val a = mergedQuantile(summaries, p, n)
      val r = rankOf(p, n)
      assert(pooled.count(_ <= a).toLong >= r, s"p$p merged undershoot")
      assert(pooled.count(_ < a).toLong < r + bound, s"p$p merged overshoot")
    }
  }

  // window A [60,120): small-domain repeats (heavy values crossing
  // multiple strides); window B [120,180): wide spread
  private val windowA =
    (0 until 300).map(i => ev(61 + (i % 50), 100L + (i % 7) * 13))
  private val windowB =
    (0 until 400).map(i => ev(125 + (i % 40), 90000L + i.toLong * i * 37))

  private def expected(rows: Seq[PriceEvent])
      : Map[Long, (Long, Long, Long, Long, Long, Long)] =
    rows.groupBy(e => e.ts.getTime / 1000 / WindowSec * WindowSec * 1000)
      .map { case (w, g) =>
        val hist = g.groupBy(_.cents)
          .map { case (v, es) => v -> es.size.toLong }
        val n = g.size.toLong
        val sk = summarize(hist)
        w -> ((n, sk.size.toLong, strideOf(n), quantile(sk, 50, n),
          quantile(sk, 95, n), quantile(sk, 99, n)))
      }

  private def runStream(batches: Seq[Seq[PriceEvent]],
      delay: String = "10 seconds")
      : Map[Long, (Long, Long, Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[PriceEvent]
    val q = RankSketchStream(input.toDS(), WindowSec, delay)
      .writeStream.format("memory").queryName("rank_out")
      .outputMode(RankSketchStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // watermark from batch N drives timeouts during batch N+1
      input.addData(Seq(ev(100000, 1L))); q.processAllAvailable()
      input.addData(Seq(ev(100600, 1L))); q.processAllAvailable()
      spark.table("rank_out").collect()
        .map(r => r.getTimestamp(0).getTime ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5), r.getLong(6))))
        .toMap
    } finally q.stop()
  }

  test("one micro-batch: summary + quantiles equal the batch fold exactly") {
    val exp = expected(windowA ++ windowB)
    val got = runStream(Seq(windowA ++ windowB))
    for ((w, e) <- exp) {
      assert(got.contains(w), s"missing window $w")
      assert(got(w) == e, s"window $w: ${got(w)} vs $e")
    }
  }

  test("multi-batch shuffled arrival: state carries, output unchanged") {
    val all = windowA ++ windowB
    val shuffled = new scala.util.Random(17).shuffle(all.toVector)
    val exp = expected(all)
    val got = runStream(Seq(shuffled.take(100), shuffled.slice(100, 450),
      shuffled.drop(450)), delay = "500 seconds")
    for ((w, e) <- exp)
      assert(got.get(w).contains(e), s"window $w: ${got.get(w)} vs $e")
  }

  test("distinct-value cap enforces the exact-histogram contract") {
    // r11 VERDICT #5: >cap distinct values in one open window must
    // FAIL FAST with the sizing message, not grow state silently.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[PriceEvent]
    val q = RankSketchStream(input.toDS(), WindowSec, "10 seconds",
        maxDistinct = 100)
      .writeStream.format("memory").queryName("rank_cap_out")
      .outputMode(RankSketchStream.outputMode).start()
    try {
      input.addData((1L to 101L).map(v => ev(30, v)))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
      assert(chain(e).exists(c =>
        Option(c.getMessage).exists(_.contains("distinct values > cap 100"))),
        s"cap message missing in ${chain(e).map(_.getMessage)}")
    } finally q.stop()
  }
}
