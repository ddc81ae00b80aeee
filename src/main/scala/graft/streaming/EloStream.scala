package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `q_elo_rating` operator (the 27th
  * batch/stream twin): live Elo ratings over a match stream. Each
  * match (winner, loser) applies the classic update
  * r += K·(1 − 1/(1+10^((r_l−r_w)/400))) with K = 32 from a 1500
  * start — ONE delta computed off the pre-match ratings, applied ±,
  * the batch fold's exact operation order, so for an ordered arrival
  * the rating table is bit-identical to the batch query whether the
  * match list lands in one micro-batch or many ([[EloStreamSpec]]
  * pins the final table against the BATCH QUERY'S OWN output and the
  * composition across splits).
  *
  * State is the per-league rating book — O(#players)/key, with the
  * same state-size honesty note as [[RankSketchStream]]: the book
  * grows with DISTINCT player names, fail-fast past a documented cap
  * (2¹⁶ players ≈ 1.6 MB/key) rather than silently ballooning the
  * state store; a larger league belongs on a sharded book. Matches
  * are a function of arrival SEQUENCE (ratings are path-dependent):
  * batches must arrive time-ordered; within a batch rows sort by t.
  * Update mode: each batch re-emits the two touched ratings per
  * match — the live leaderboard read.
  */
object EloStream {

  val K = 32.0
  val Start = 1500.0
  val MaxPlayersDefault: Int = 1 << 16

  case class EloState(names: Array[String], ratings: Array[Double],
      wins: Array[Long])
  case class EloOut(league: String, t: Long, player: String,
      rating: Double, n_wins: Long)

  /** rows: (league, t, winner, loser). */
  def apply(rows: Dataset[(String, Long, String, String)],
      maxPlayers: Int = MaxPlayersDefault): Dataset[EloOut] = {
    implicit val stateEnc = Encoders.product[EloState]
    implicit val outEnc = Encoders.product[EloOut]
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_._1)
      .flatMapGroupsWithState[EloState, EloOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (league, it, state: GroupState[EloState]) =>
          val batch = it.toArray.sortBy(_._2)
          val st = state.getOption.getOrElse(
            EloState(Array.empty, Array.empty, Array.empty))
          val book = scala.collection.mutable.LinkedHashMap[String,
            (Double, Long)](st.names.indices.map(i =>
            st.names(i) -> (st.ratings(i), st.wins(i))): _*)
          def entry(p: String): (Double, Long) =
            book.getOrElseUpdate(p, {
              require(book.size < maxPlayers,
                s"EloStream: league '$league' exceeded $maxPlayers " +
                  "distinct players — shard the book instead")
              (Start, 0L)
            })
          val out = batch.flatMap { case (_, t, w, l) =>
            val (rw, ww) = entry(w)
            val (rl, wl) = entry(l)
            // the batch fold's EXACT operation order: one delta off
            // the pre-match ratings, applied +w / −l
            val upd = K * (1 - 1 / (1 + math.pow(10.0, (rl - rw) / 400.0)))
            book(w) = (rw + upd, ww + 1)
            book(l) = (rl - upd, wl)
            Seq(EloOut(league, t, w, book(w)._1, book(w)._2),
              EloOut(league, t, l, book(l)._1, book(l)._2))
          }
          val names = book.keys.toArray
          state.update(EloState(names,
            names.map(n => book(n)._1), names.map(n => book(n)._2)))
          out.iterator
      }
  }

  val outputMode: OutputMode = OutputMode.Update()
}
