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
    // multiLine: a regenerated fixture with an embedded newline in a
    // quoted field must not split the record; emptyValue "": an empty
    // string must round-trip as "" rather than null (CSV default)
    val back = spark.read.schema(docSchema)
      .option("header", "true").option("multiLine", "true")
      .option("emptyValue", "").csv(dir)
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

  test("JSON corrupt records land in _corrupt_record instead of failing the job") {
    // At ingest scale some fraction of records is always malformed;
    // PERMISSIVE mode quarantines them in a column for a dead-letter
    // branch rather than failing the scan.
    val dir = s"$base/json_corrupt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/part.json"),
      Seq("""{"doc_id": 1, "text": "good row"}""",
        """{"doc_id": 2, "text": "truncated""",
        """{"doc_id": 3, "text": "another good row"}""")
        .mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache() // corrupt-record column requires a materialized scan
    assert(df.count() == 3)
    assert(df.where(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.where(col("_corrupt_record").isNull).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("parquet schema evolution: mergeSchema unions old and new columns") {
    // A 100 TB table accretes columns over time; old partitions must
    // stay readable next to new ones.
    val dir = s"$base/evolved"
    docs.select("doc_id", "text").write.mode("overwrite").parquet(s"$dir/v=1")
    docs.select(col("doc_id"), col("text"), col("lang"))
      .write.mode("overwrite").parquet(s"$dir/v=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("doc_id", "lang", "text", "v"))
    assert(merged.count() == 2 * docs.count())
    // rows from the old layout surface the new column as null
    assert(merged.where(col("v") === 1 && col("lang").isNull).count() == docs.count())
    assert(merged.where(col("v") === 2 && col("lang").isNotNull).count() == docs.count())
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
