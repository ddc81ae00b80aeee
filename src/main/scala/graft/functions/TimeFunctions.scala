package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared temporal-key conventions. Every operator AND every DuckDB
  * oracle (`date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))`)
  * must agree on these bit-for-bit, so they live in exactly one
  * place.
  */
object TimeFunctions {

  /** Day number since 1970-01-01 (UTC-pinned session — Sessions.scala). */
  def dayNum(ts: Column): Column =
    datediff(to_date(ts), lit(java.sql.Date.valueOf("1970-01-01"))).cast("long")
}
