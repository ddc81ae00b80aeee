package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL front door (VERDICT r4 next-round #7): the engine surface is
  * Scala-API-first, but every operator result and base table is
  * view-shaped — this main exposes them to a non-Scala user as plain
  * SQL, spark-sql style.
  *
  *  - the 10 base tables register as temp views under their TPC-H
  *    names (`lineitem`, `documents`, ...);
  *  - every `SparkEntry.queries` operator is addressable as
  *    `graft_<name>` (e.g. `SELECT * FROM graft_q_dedup_minhash_lsh`);
  *    registration is LAZY — only the views a statement actually
  *    references are constructed, so an ad-hoc query doesn't pay for
  *    the ANN index fits of operators it never touches. Exception:
  *    the views built on eager `localCheckpoint()` cores
  *    (`graft_q_window_pct`, `graft_q_token_budget`,
  *    `graft_q_equi_bins`, `graft_q_skyline`, `graft_q_pagerank`,
  *    `graft_q_anomaly_mad`, `graft_q_ks_drift`,
  *    `graft_q_chi2_independence`, `graft_q_drift_timeline`) run their checkpoint jobs at view
  *    CONSTRUCTION — i.e. during [[registerReferenced]], before the
  *    user's statement executes — so referencing one of those pays
  *    its materialization cost up front;
  *  - the native expressions (jaro_winkler, minhash_signature,
  *    dot_product, ...) are SQL-callable: `Sessions.build` injects
  *    `GraftExtensions`, and [[registerFunctions]] covers sessions a
  *    host built without it.
  *
  * {{{
  * spark-submit --class graft.SqlMain firewatchspark.jar \
  *   /data/sf1 "SELECT count(*) FROM graft_q_dedup_prune"
  * }}}
  *
  * With no SQL argument, statements are read from stdin, `;`-separated
  * (a pipe-friendly spark-sql shape). Mirrors the reference's ad-hoc
  * inspection entry points (scripts/kafka_inspect.py) for the analytic
  * surface.
  */
object SqlMain {

  /** Base tables as temp views. Temp-view registration is plan-level:
    * no data is read until a statement scans the view, and scans get
    * the same pruned/pushed-down plans as the Scala API (`Tables` is
    * the one loader behind both). */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach(n => Tables(spark, sfDir, n).createOrReplaceTempView(n))

  /** Register the `graft_q_*` operator views a statement references.
    * Returns the registered names; unknown `graft_q_*` identifiers
    * fail fast with the valid-name list rather than surfacing as a
    * bare TABLE_OR_VIEW_NOT_FOUND later. */
  def registerReferenced(spark: SparkSession, sfDir: String, sql: String): Seq[String] = {
    val refs = "graft_(q_[a-z0-9_]+)".r
      .findAllMatchIn(sql).map(_.group(1)).toSeq.distinct
    val unknown = refs.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown operator view(s): ${unknown.map("graft_" + _).mkString(", ")} — " +
        s"valid names are graft_{${SparkEntry.queries.keys.toSeq.sorted.mkString(",")}}")
    refs.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).createOrReplaceTempView(s"graft_$name")
    }
    refs
  }

  /** Make the native expressions SQL-callable on a session built
    * WITHOUT `spark.sql.extensions=graft.GraftExtensions` (a host's
    * own session). Same builders the extension injects. */
  def registerFunctions(spark: SparkSession): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      org.apache.spark.sql.graftbridge.Bridge
        .registerFunction(spark, ident, info, builder)
    }

  /** One statement against the catalog: tables + referenced operator
    * views + native functions, then `spark.sql`. */
  def run(spark: SparkSession, sfDir: String, sql: String): DataFrame = {
    registerFunctions(spark)
    registerTables(spark, sfDir)
    registerReferenced(spark, sfDir, sql)
    spark.sql(sql)
  }

  /** Quote-aware `;` split for the stdin path: semicolons inside
    * single-quoted SQL string literals (`WHERE c = 'a;b'`) do not
    * terminate a statement. ANSI `''` escaping falls out naturally —
    * the second `'` just reopens the literal. Double-quoted
    * identifiers are handled the same way for symmetry. */
  def splitStatements(input: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    input.foreach { c =>
      if (quote != 0) { cur += c; if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"') { cur += c; quote = c }
      else if (c == ';') { out += cur.result(); cur.clear() }
      else cur += c
    }
    out += cur.result()
    out.result()
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        """usage: SqlMain <sfDir> [sql...]   (no sql: read `;`-separated statements from stdin)""")
      sys.exit(2)
    }
    val sfDir = args(0)
    val stmts: Seq[String] =
      if (args.length > 1) args.drop(1).toSeq
      else splitStatements(scala.io.Source.stdin.mkString)
    val spark = Sessions.build("graft-sql")
    spark.sparkContext.setLogLevel("WARN")
    stmts.map(_.trim).filter(_.nonEmpty).foreach { stmt =>
      run(spark, sfDir, stmt).show(100, truncate = false)
    }
    spark.stop()
  }
}
