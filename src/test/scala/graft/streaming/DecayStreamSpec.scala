package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The decayed-sum stream must converge to the closed-form batch
  * value Σ v·e^(−λ(T−t)) regardless of how rows are batched or
  * ordered — including late rows behind a key's horizon — because the
  * event-time decay recurrence is order-independent algebra (unlike
  * EWMA's arrival-order fold, documented there).
  */
class DecayStreamSpec extends SparkSpec {

  import DecayStream.{batchDecayedSum, Obs}

  // 0.1/day in per-µs units (the q_decay_agg constant)
  private val Lambda = 0.1 / 86400000000.0

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  private val rows = Seq(
    Obs("a", ts(0), 10.0), Obs("a", ts(3600), 5.0), Obs("a", ts(86400), 2.0),
    Obs("b", ts(100), 1.0), Obs("b", ts(200000), 7.0))

  private def runStream(batches: Seq[Seq[Obs]]): Map[String, (Double, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Obs]
    val q = DecayStream(input.toDS(), Lambda)
      .writeStream.format("memory").queryName("decay_out")
      .outputMode(DecayStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // Update mode: the LAST row per key is the current state
      spark.table("decay_out").collect()
        .zipWithIndex
        .groupBy(_._1.getString(0))
        .map { case (k, rs) =>
          val last = rs.maxBy(_._2)._1
          k -> (last.getDouble(1), last.getLong(2))
        }
    } finally q.stop()
  }

  private def expected: Map[String, (Double, Long)] =
    rows.groupBy(_.key).map { case (k, rs) =>
      k -> batchDecayedSum(rs.map(o => (o.ts, o.value)), Lambda)
    }

  test("one batch converges to the closed-form decayed sum") {
    val got = runStream(Seq(rows))
    expected.foreach { case (k, (s, h)) =>
      assert(got(k)._2 == h)
      assert(math.abs(got(k)._1 - s) < 1e-9, s"$k: ${got(k)._1} vs $s")
    }
  }

  test("split batches carry state and converge to the same value") {
    val got = runStream(Seq(rows.take(2), rows.slice(2, 4), rows.drop(4)))
    expected.foreach { case (k, (s, _)) =>
      assert(math.abs(got(k)._1 - s) < 1e-9)
    }
  }

  test("late rows behind the horizon fold in pre-discounted, same result") {
    // reversed order: every subsequent row is late relative to the max
    val got = runStream(Seq(Seq(rows(2)), Seq(rows(1)), Seq(rows(0)),
      Seq(rows(4)), Seq(rows(3))))
    expected.foreach { case (k, (s, h)) =>
      assert(got(k)._2 == h, s"$k horizon")
      assert(math.abs(got(k)._1 - s) < 1e-9, s"$k: ${got(k)._1} vs $s")
    }
  }
}
