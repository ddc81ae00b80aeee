package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The streaming Elo book must reproduce the batch `q_elo_rating`
  * table exactly for an ordered match arrival (one delta off the
  * pre-match ratings, applied ±, the batch fold's operation order),
  * compose across micro-batch splits, and fail fast past the
  * documented distinct-player cap instead of ballooning state.
  */
class EloStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def round6(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0

  /** The batch query's own match list: per day, top-revenue region
    * beats the runner-up (exact decimals, name tiebreak). */
  private def matches(): Seq[(Long, String, String)] = {
    val rev = graft.Tables(spark, dir, "orders")
      .join(broadcast(graft.Tables(spark, dir, "customer")
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(graft.Tables(spark, dir, "nation")
        .select("n_nationkey", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(graft.Tables(spark, dir, "region")
        .select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rv"))
    rev.select(col("day"), col("r_name"),
        rank().over(Window.partitionBy("day")
          .orderBy(col("rv").desc, col("r_name"))).as("pos"))
      .groupBy("day")
      .agg(max(when(col("pos") === 1, col("r_name"))).as("w"),
        max(when(col("pos") === 2, col("r_name"))).as("l"))
      .where(col("l").isNotNull)
      .orderBy("day")
      .collect()
      .zipWithIndex
      .map { case (r, i) =>
        ((i + 1).toLong, r.getString(1), r.getString(2))
      }
      .toSeq
  }

  private def runStream(batches: Seq[Seq[(String, Long, String, String)]],
      cap: Int = EloStream.MaxPlayersDefault)
      : Seq[EloStream.EloOut] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Long, String, String)]
    val q = EloStream(input.toDS(), cap)
      .writeStream.format("memory").queryName("elo_out")
      .outputMode(EloStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("elo_out").as[EloStream.EloOut]
        .collect().sortBy(o => (o.t, o.player)).toSeq
    } finally q.stop()
  }

  /** Last emitted (rating, wins) per player. */
  private def finalBook(out: Seq[EloStream.EloOut])
      : Map[String, (Double, Long)] =
    out.groupBy(_.player).map { case (p, os) =>
      val last = os.maxBy(_.t)
      p -> (last.rating, last.n_wins)
    }

  test("one-batch stream equals the batch q_elo_rating table") {
    val ms = matches()
    assert(ms.nonEmpty)
    val got = finalBook(runStream(
      Seq(ms.map { case (t, w, l) => ("league", t, w, l) })))
    val batch = SparkEntry.queries("q_elo_rating")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    batch.foreach { case (p, (rating, wins)) =>
      got.get(p) match {
        case Some((gr, gw)) =>
          assert(round6(gr) == rating, s"$p stream $gr vs batch $rating")
          assert(gw == wins, s"$p wins $gw vs $wins")
        case None =>
          // a region with zero matches never enters the stream book:
          // the batch emits it at the 1500 start with 0 wins
          assert(rating == 1500.0 && wins == 0L, s"$p missing")
      }
    }
  }

  test("multi-batch arrival composes state: final book unchanged") {
    val ms = matches()
    val rows = ms.map { case (t, w, l) => ("league", t, w, l) }
    val whole = finalBook(runStream(Seq(rows)))
    val split = finalBook(runStream(rows.grouped(211).toSeq))
    assert(whole.keySet == split.keySet)
    whole.foreach { case (p, (r, w)) =>
      assert(split(p) == ((r, w)), s"$p diverged across splits")
    }
  }

  test("distinct-player cap fails fast instead of growing state") {
    val rows = (1 to 40).map(i => ("league", i.toLong, s"p$i", s"q$i"))
    val ex = intercept[Exception] {
      runStream(Seq(rows), cap = 16)
    }
    def chain(e: Throwable): Seq[Throwable] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("distinct players"))),
      s"unexpected failure: $ex")
  }
}
