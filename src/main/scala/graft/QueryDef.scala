package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checkable query: a Spark builder plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. `oracle = None` → the driver records a weaker rows-only
  * check (used for ops whose exact output is not SQL-expressible,
  * e.g. MLlib MinHashLSH with engine-specific hash seeds).
  *
  * Conventions that keep the DuckDB hash-compare stable:
  *  - every computed column is aliased identically on both sides;
  *  - double-typed aggregates are rounded (engines sum in different
  *    orders; rounding collapses low-order-bit drift);
  *  - results carry a total ORDER BY on output columns;
  *  - NULLs in grouping outputs are coalesced to sentinels (Spark and
  *    DuckDB default NULL sort order differs).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), fn)
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, None, fn)
}
