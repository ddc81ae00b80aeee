package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** The driver testdata has no multi-day activity gaps, so the oracle
  * gate can't exercise the zero-coverage path: a calendar day whose
  * whole trailing window is activity-free must still appear with
  * users=0 in BOTH the exact interval rewrite and the HLL sketch twin
  * (whose per-day sketches simply don't exist for such days — an
  * inner join on the estimate frame silently dropped them; review
  * find, r7).
  */
class SlidingDistinctSpec extends SparkSpec {

  test("gap days report zero users in both the exact and the sketch twin") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sdgap").toString
    // one user active on day D, another on day D+20: days D+7..D+19
    // have an empty trailing 7-day window
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "view", 1.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-21 10:00:00"), 8L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    for (q <- Seq("q_sliding_distinct", "q_sliding_distinct_approx")) {
      val rows = SparkEntry.queries(q)(spark, dir)
        .orderBy("d").collect()
      assert(rows.length == 21, s"$q: expected the full 21-day grid, got ${rows.length}")
      val users = rows.map(_.getLong(1)).toSeq
      assert(users == Seq.fill(7)(1L) ++ Seq.fill(13)(0L) :+ 1L,
        s"$q: coverage sequence wrong: $users")
      if (q == "q_sliding_distinct_approx")
        assert(rows.forall(_.getBoolean(2)),
          s"$q: est_ok must hold on zero days too")
    }
  }
}
