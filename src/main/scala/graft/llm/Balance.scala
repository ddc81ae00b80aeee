package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared temperature-balance math for the mixture/sampling operators
  * (q_domain_mix over metadata domains, q_semantic_balance over
  * embedding-space buckets): raw corpus share and the α-damped
  * mixture weight w_i ∝ p_i^α (α = 0.5 — the Pile/DoReMi-style
  * square-root damping). One definition so the two operators cannot
  * silently diverge on the temperature or normalization convention.
  *
  * The empty-partition windows run over an ALREADY-AGGREGATED keyed
  * count table — #keys rows (domains/buckets), not the corpus — so
  * the single-partition exchange is trivial at any corpus scale.
  */
object Balance {

  val Alpha = 0.5

  private val all = Window.partitionBy()

  /** Total of the count column across all rows (same empty window the
    * mix uses — exposed for per-query derived stats like mean
    * density). */
  def totalOver(nCol: Column): Column = sum(nCol).over(all)

  /** Rows across the keyed table. */
  def countOver: Column = count(lit(1)).over(all)

  /** Adds unrounded `raw_share` and `mix_weight` columns to a keyed
    * count table. Callers round for their oracle contract. The
    * temperature is deliberately NOT a parameter: the oracle SQL
    * strings hardcode pow(..., 0.5), so a per-call alpha would be a
    * silent Spark-vs-oracle divergence — change [[Alpha]] and the
    * oracle SQLs together. */
  def temperatureMix(d: DataFrame, nCol: String): DataFrame = {
    val rawShare = col(nCol) / totalOver(col(nCol)).cast("double")
    val scaled = pow(rawShare, Alpha)
    d.withColumn("raw_share", rawShare)
      .withColumn("mix_weight", scaled / sum(scaled).over(all))
  }
}
