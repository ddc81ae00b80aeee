package graft

import java.nio.file.Files
import java.sql.{Date, Timestamp}

/** Edge semantics of the union-style as-of join that the sf oracles
  * cannot reach (the generated events table has no NULL values): the
  * carried value must belong to the PICKED event, exactly as the
  * oracle's rn=1 row would return it.
  */
class WindowEdgeSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Writes minimal orders/events parquet into a temp dir shaped like a
    * testdata sfDir, so SparkEntry.queries("q_asof_join") runs on it
    * unmodified. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-asof-edge").toString
    import spark.implicits._
    Seq(
      // user 1: latest event at-or-before the probe has a NULL value —
      // the as-of must surface THAT null, not an older event's value.
      (1L, 1L, ts("2024-01-01 00:00:00"), Option(10.0)),
      (2L, 1L, ts("2024-01-02 00:00:00"), None: Option[Double]),
      // user 2: an event EXACTLY at the shifted probe instant — the ≤
      // of the as-of predicate is inclusive, so it must be picked.
      (3L, 2L, ts("2024-08-25 00:00:00"), Option(7.5)),
      // user 3: only event is after every probe → user drops out.
      (4L, 3L, ts("2030-01-01 00:00:00"), Option(1.0)))
      .toDF("event_id", "user_id", "ts", "value")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    Seq(
      // probes at o_orderdate + 9000 days (the query's shift):
      (100L, 1L, Date.valueOf("2000-01-04")),  // → 2024-08-25
      (200L, 2L, Date.valueOf("2000-01-04")),  // → 2024-08-25 (== e3.ts)
      (300L, 3L, Date.valueOf("2000-01-04")))  // → 2024-08-25 (no event yet)
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    d
  }

  test("as-of join carries the picked event's value, even when NULL") {
    val out = SparkEntry.queries("q_asof_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), Option(r.get(3))))
    assert(out.toSeq == Seq(
      (100L, 2L, None),          // e2 picked; its NULL value, not e1's 10.0
      (200L, 3L, Some(7.5))))    // equal-instant event included (≤, not <)
  }
}
