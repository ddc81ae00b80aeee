package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming Count–Min sketch must be BIT-IDENTICAL to the batch
  * cell computation over the same window's rows — every cell is a
  * count-sum, so arrival order and micro-batch splits cannot move it.
  * The Scala cell function is pinned against the batch query's OWN
  * Spark SQL expression (h32Salted(r, w) % 1024), the CM guarantees
  * are checked as data (never undercounts; overcount within the
  * ε = e/w bound on a real corpus slice), and the cell-wise merge
  * theorem is exercised exactly as a cross-shard reconciliation
  * would use it.
  */
class CountMinStreamSpec extends SparkSpec {

  import CountMinStream._

  private val WindowSec = 60L

  private def ev(sec: Long, w: String) =
    TokenEvent(new Timestamp(sec * 1000), w)

  test("scala cellOf matches the batch SQL h32Salted % 1024") {
    import graft.functions.TextFunctions.h32Salted
    import spark.implicits._
    val toks = Seq("fire", "the", "zebra", "q", "", "a b", "Ünïcode")
    for (r <- 0 until D) {
      val sql = toks.toDF("w")
        .select((h32Salted(lit(r), col("w")) % W).cast("int").as("b"))
        .collect().map(_.getInt(0))
      toks.zip(sql).foreach { case (t, b) =>
        assert(cellOf(r, t) == b, s"cell mismatch row $r token '$t'")
      }
    }
  }

  test("no undercount + epsilon overcount bound on a skewed stream") {
    val rnd = new scala.util.Random(11)
    // zipf-ish: token i with frequency ~ 1/i over 2000 distinct
    val toks = Vector.tabulate(30000) { _ =>
      s"t${math.min(1999, math.floor(math.pow(rnd.nextDouble(), 3) * 2000).toInt)}"
    }
    val cells = new Array[Long](D * W)
    toks.foreach(insert(cells, _))
    val exact = toks.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val eps = math.E / W
    val bound = math.ceil(eps * toks.size).toLong
    var overBound = 0
    exact.foreach { case (t, n) =>
      val e = estimate(cells, t)
      assert(e >= n, s"undercount at $t: $e < $n")
      if (e - n > bound) overBound += 1
    }
    // ε-bound holds per key with prob 1 − e^−d ≈ 0.98; allow the tail
    assert(overBound <= math.max(2, exact.size / 20),
      s"$overBound of ${exact.size} keys exceeded the eps bound")
  }

  test("cell-wise merge equals the sketch of the pooled stream") {
    val a = Vector.fill(5000)(s"x${scala.util.Random.nextInt(300)}")
    val b = Vector.fill(4000)(s"y${scala.util.Random.nextInt(300)}")
    val ca = new Array[Long](D * W); a.foreach(insert(ca, _))
    val cb = new Array[Long](D * W); b.foreach(insert(cb, _))
    val pooled = new Array[Long](D * W); (a ++ b).foreach(insert(pooled, _))
    assert(java.util.Arrays.equals(merge(ca, cb), pooled),
      "merged plane != pooled plane")
  }

  private val Probes = Seq("alpha", "beta", "rare", "absent")
  // window A: heavy alpha, some beta, one rare; window B: different mix
  private val windowA =
    (0 until 400).map(i => ev(61 + (i % 50),
      if (i % 4 != 3) "alpha" else if (i % 8 == 3) "beta" else s"f$i")) :+
      ev(90, "rare")
  private val windowB =
    (0 until 300).map(i => ev(125 + (i % 40),
      if (i % 3 == 0) "beta" else s"g${i % 37}"))

  private def expected(rows: Seq[TokenEvent])
      : Map[(Long, String), (Long, Long)] =
    rows.groupBy(e => e.ts.getTime / 1000 / WindowSec * WindowSec * 1000)
      .flatMap { case (w, g) =>
        val cells = new Array[Long](D * W)
        g.foreach(e => insert(cells, e.w))
        Probes.map(k => (w, k) -> ((g.size.toLong, estimate(cells, k))))
      }

  private def runStream(batches: Seq[Seq[TokenEvent]],
      delay: String = "10 seconds"): Map[(Long, String), (Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[TokenEvent]
    val q = CountMinStream(input.toDS(), Probes, WindowSec, delay)
      .writeStream.format("memory").queryName("cm_out")
      .outputMode(CountMinStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // watermark from batch N drives timeouts during batch N+1
      input.addData(Seq(ev(100000, "z"))); q.processAllAvailable()
      input.addData(Seq(ev(100600, "z"))); q.processAllAvailable()
      spark.table("cm_out").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(2)) ->
          ((r.getLong(1), r.getLong(3))))
        .toMap
    } finally q.stop()
  }

  test("one micro-batch: probe estimates equal the batch cells exactly") {
    val exp = expected(windowA ++ windowB)
    val got = runStream(Seq(windowA ++ windowB))
    for ((k, e) <- exp)
      assert(got.get(k).contains(e), s"probe $k: ${got.get(k)} vs $e")
  }

  test("multi-batch shuffled arrival: state carries, output unchanged") {
    val all = windowA ++ windowB
    val shuffled = new scala.util.Random(17).shuffle(all.toVector)
    val exp = expected(all)
    val got = runStream(Seq(shuffled.take(150), shuffled.slice(150, 500),
      shuffled.drop(500)), delay = "500 seconds")
    for ((k, e) <- exp)
      assert(got.get(k).contains(e), s"probe $k: ${got.get(k)} vs $e")
  }
}
