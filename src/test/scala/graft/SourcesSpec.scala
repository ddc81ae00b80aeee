package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/format coverage beyond parquet (SURVEY.md §2.2 scans row):
  * CSV, JSON-lines, ORC, text, and binaryFile all round-trip the same
  * relation. Formats matter at 100 TB mostly via schema handling —
  * every read here passes an EXPLICIT schema (no inference job over
  * the data, which at scale is a full extra scan) — and columnar
  * pushdown, asserted for ORC like PlanAuditSpec does for parquet. */
class SourcesSpec extends SparkSpec {

  private val base = Files.createTempDirectory("graft_sources").toString

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def sortedRows(df: DataFrame) =
    df.orderBy("doc_id").collect().map(_.toSeq).toSeq

  test("CSV round-trips with an explicit schema (no inference scan)") {
    val dir = s"$base/csv"
    docs.write.option("header", "true").mode("overwrite").csv(dir)
    val back = spark.read.schema(docSchema).option("header", "true").csv(dir)
    assert(sortedRows(back) == sortedRows(docs))
  }

  test("JSON lines round-trip with an explicit schema") {
    val dir = s"$base/json"
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(docSchema).json(dir)
    assert(sortedRows(back) == sortedRows(docs))
  }

  test("ORC round-trips and pushes filters/projection to the scan") {
    val dir = s"$base/orc"
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(sortedRows(back) == sortedRows(docs))
    val plan = back.where(col("doc_id") === 7).select("doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)"), plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"), plan)
  }

  test("text source reads lines; binaryFile exposes content + metadata") {
    val dir = s"$base/text"
    docs.select(col("text")).write.mode("overwrite").text(dir)
    assert(spark.read.text(dir).count() == docs.count())
    val bin = spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("length"), col("content"))
    val row = bin.head()
    assert(row.getAs[Long]("length") > 0)
    assert(row.getAs[Array[Byte]]("content").nonEmpty)
  }
}
