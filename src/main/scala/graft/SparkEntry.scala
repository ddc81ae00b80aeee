package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a
  * [[QueryDef]] in one of the module registries below; `queries` /
  * `oracleSql` are derived views over that single source of truth.
  */
object SparkEntry {

  /** All oracle-checkable query definitions, grouped by module. */
  def allDefs: Seq[QueryDef] =
    operators.RelationalQueries.defs ++
      operators.AggregateQueries.defs ++
      operators.WindowQueries.defs ++
      operators.ScalarQueries.defs ++
      operators.StatsQueries.defs ++
      operators.SessionQueries.defs ++
      operators.TemporalQueries.defs ++
      operators.TpchQueries.defs ++
      operators.GraphQueries.defs ++
      operators.SeriesQueries.defs ++
      operators.AuditQueries.defs ++
      operators.InferenceQueries.defs ++
      operators.DiagnosticsQueries.defs ++
      operators.ScoreQueries.defs ++
      operators.BiQueries.defs ++
      llm.DedupQueries.defs ++
      llm.DedupClusterQueries.defs ++
      llm.SimilarityQueries.defs ++
      llm.TextAnalysisQueries.defs ++
      llm.CurationQueries.defs ++
      llm.TfIdfQueries.defs ++
      llm.MultimodalQueries.defs ++
      sources.FormatQueries.defs ++
      streaming.VideoPipelineQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q3-shaped join+agg (customer ⋈ orders ⋈ lineitem). */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_inner")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** Dev-only subset selection (Bench's SPARK_GRAFT_BENCH_ONLY env
    * var, Verify's optional third arg): comma-separated names → the
    * matching queries; None or an all-blank list → every query. One
    * parser so the two entry points can't drift.
    */
  def select(namesCsv: Option[String]): Map[String, (SparkSession, String) => DataFrame] =
    namesCsv.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet) match {
      case Some(f) if f.nonEmpty => queries.filter { case (k, _) => f(k) }
      case _ => queries
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, Some(o), _) => n -> o }.toMap
}
