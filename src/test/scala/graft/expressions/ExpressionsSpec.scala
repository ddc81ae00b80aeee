package graft.expressions

import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.{FrameSerde, Schemas}
import org.apache.spark.sql.functions._

/** Custom Catalyst expressions: value parity with the composed
  * built-in forms, SQL registration, codegen integration, and
  * malformed-input behavior. */
class ExpressionsSpec extends SparkSpec {

  import spark.implicits._

  test("H32 equals the conv(substr(md5)) composition and the known md5 value") {
    val df = Seq("abc", "", "vid:42", "ünïcode ☂").toDF("s")
    val rows = df.select(
      H32(col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("composed"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // md5('abc') = 900150983cd24fb0... → 0x90015098
    assert(df.where($"s" === "abc").select(H32(col("s"))).head().getLong(0) == 0x90015098L)
  }

  test("H32 registers for SQL and stays inside whole-stage codegen") {
    H32.register(spark)
    val out = spark.sql("SELECT h32('abc') AS h").head().getLong(0)
    assert(out == 0x90015098L)
    // literal local data folds to LocalTableScan — use a range scan.
    // The "*(n)" prefix marks a WholeStageCodegen stage: H32 must not
    // force a fallback out of it.
    val plan = spark.range(100).select(H32(col("id").cast("string")))
      .queryExecution.executedPlan.toString
    assert(plan.trim.startsWith("*("), plan)
  }

  test("jaro_winkler matches textbook/DuckDB values and stays codegen'd") {
    import org.apache.spark.unsafe.types.UTF8String
    // Locked against DuckDB's jaro_winkler_similarity (3000-case fuzz
    // sweep at build time); these are the standard published values
    // plus the edge cases that differ between library variants.
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964), // prefix 0 → no boost
      ("dwayne", "duane", 0.8400000000000001),
      ("prefix", "prefixxxx", 0.9333333333333333),
      ("abc", "abc", 1.0),
      ("abc", "xyz", 0.0),
      ("", "", 0.0), // empty scores 0, not 1 (DuckDB semantics)
      ("a", "", 0.0))
    cases.foreach { case (a, b, exp) =>
      val got = JaroWinkler.compute(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(math.abs(got - exp) < 1e-12, s"'$a'/'$b': $got vs $exp")
    }
    val plan = spark.range(100)
      .select(JaroWinkler(col("id").cast("string"), lit("42")))
      .queryExecution.executedPlan.toString
    assert(plan.trim.startsWith("*("), plan)
  }

  test("msgpack_decode_frame decodes the wire format in a projection") {
    val f = Schemas.FrameMessage("v1", 7,
      Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00.123456Z")),
      29.97, Array[Byte](1, 2, 3), 640, 480)
    val df = Seq(FrameSerde.encodeMsgpack(f)).toDF("value")
    val r = df.select(MsgpackDecodeFrame(col("value")).as("f"))
      .select("f.*").head()
    assert(r.getAs[String]("video_id") == "v1")
    assert(r.getAs[Int]("frame_number") == 7)
    assert(r.getAs[Timestamp]("timestamp") == f.timestamp)
    assert(r.getAs[Double]("fps") == 29.97)
    assert(r.getAs[Array[Byte]]("frame_data").toSeq == Seq[Byte](1, 2, 3))
  }

  test("msgpack_decode_frame coerces a float-packed frame_number like decodeMsgpack") {
    // Parity contract between the two decode paths: a producer packing
    // the counter as a float must not null the row here while the
    // FrameSerde path keeps the frame.
    val bytes = graft.streaming.Msgpack.encodeMap(Seq(
      "video_id" -> "v", "frame_number" -> 7.0,
      "timestamp" -> "2024-01-01T00:00:00Z",
      "frame_data" -> Array[Byte](1)))
    val r = Seq(bytes).toDF("value")
      .select(MsgpackDecodeFrame(col("value")).as("f"))
      .select("f.*").head()
    assert(r.getAs[Int]("frame_number") == 7)
    assert(FrameSerde.decodeMsgpack(bytes).frame_number == 7)
  }

  test("native simhash expressions equal the higher-order-function formulation") {
    import graft.functions.TextFunctions
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("words"))
    val both = docs.select(
      col("doc_id"),
      Simhash32FromHashes(SaltedH32Array(col("words"), 0)).as("native"),
      TextFunctions.simhash32FromHashes(TextFunctions.wordHashes(col("words"), 0)).as("hof"))
    assert(both.where(col("native") =!= col("hof")).count() == 0)
    assert(both.count() > 0)
  }

  test("native minhash signature equals the higher-order-function formulation") {
    import graft.functions.TextFunctions
    val K = 12
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .where(size(col("words")) >= 3)
    val both = docs.select(
      col("doc_id"),
      MinhashSignature(col("words"), 3, K).as("native"),
      TextFunctions.minhashesFromHashes(
        TextFunctions.shingleHashes(TextFunctions.shingles(col("words"), 3)), K).as("hof"))
    assert(both.where(col("native") =!= col("hof")).count() == 0)
    assert(both.count() > 0)
  }

  test("native shingles equal the HOF form (distinct, first-occurrence order)") {
    import graft.functions.TextFunctions
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("words"))
    // includes < n-word docs: both forms must yield an empty array
    val both = docs.select(
      col("doc_id"),
      ShinglesArray(col("words"), 3).as("native"),
      TextFunctions.shingles(col("words"), 3).as("hof"))
    assert(both.where(col("native") =!= col("hof")).count() == 0)
    // repeated-shingle doc: distinctness preserved
    val rep = Seq("a b a b a b").toDF("text")
      .select(ShinglesArray(split(col("text"), " "), 3).as("s"))
      .head().getSeq[String](0)
    assert(rep == Seq("a b a", "b a b"))
  }

  test("native dot product equals the HOF fold, including null semantics") {
    import graft.functions.VectorFunctions
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val x = e.select(col("vec_id").as("i"), col("v").as("a"))
    val y = e.select(col("vec_id").as("j"), col("v").as("b"))
    val both = x.join(y, col("i") < col("j"))
      .select(
        VectorFunctions.dot(col("a"), col("b")).as("native"),
        VectorFunctions.dotHof(col("a"), col("b")).as("hof"))
    // bit-identical: same sequential accumulation order
    assert(both.where(col("native") =!= col("hof")).count() == 0)
    assert(both.count() > 0)
    // length mismatch → null (zip_with pads null, poisoning the sum)
    val mismatched = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(VectorFunctions.dot(col("a"), col("b")).as("d"),
        VectorFunctions.dotHof(col("a"), col("b")).as("dh"))
      .head()
    assert(mismatched.isNullAt(0) && mismatched.isNullAt(1))
    // null ELEMENT → null (ArrayData.getDouble would silently read a
    // null slot as 0.0; the HOF's null product poisons its sum)
    val nullElem = Seq((Seq(Some(1.0), None), Seq(Some(2.0), Some(3.0))))
      .toDF("a", "b")
      .select(VectorFunctions.dot(col("a"), col("b")).as("d"),
        VectorFunctions.dotHof(col("a"), col("b")).as("dh"))
      .head()
    assert(nullElem.isNullAt(0) && nullElem.isNullAt(1))
  }

  test("native l2_normalize equals the HOF formulation (incl. the zero-norm guard)") {
    import graft.functions.VectorFunctions
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("v"))
    val both = e.select(
      VectorFunctions.l2Normalize(col("v")).as("native"),
      VectorFunctions.l2NormalizeHof(col("v")).as("hof"))
    assert(both.where(col("native") =!= col("hof")).count() == 0)
    assert(both.count() > 0)
    // all-zero vector: guarded scale keeps it finite (zeros, not NaN)
    val z = Seq(Seq(0.0, 0.0, 0.0)).toDF("v")
      .select(VectorFunctions.l2Normalize(col("v")).as("n"))
      .head().getSeq[Double](0)
    assert(z == Seq(0.0, 0.0, 0.0))
  }

  test("ANSI-mode guards: zero-vector cosine and short-vector signBucket don't throw") {
    import graft.functions.VectorFunctions
    // Spark 4 defaults ANSI on: unguarded these are DIVIDE_BY_ZERO /
    // INVALID_ARRAY_INDEX_IN_ELEMENT_AT job aborts, not nulls
    val r = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0, 3.0)))
      .toDF("zero", "short3")
      .select(
        VectorFunctions.cosine(col("zero"), col("zero")).as("c"),
        VectorFunctions.signBucket(col("short3")).as("b"))
      .head()
    assert(r.getDouble(0) == 0.0) // 0/floor, not a crash or NaN
    assert(r.getLong(1) == 7L)    // dims 1..3 positive, 4..8 absent → 0b111
  }

  test("minhash signature stays inside whole-stage codegen") {
    val plan = spark.range(100)
      .select(split(concat($"id".cast("string"), lit(" x y z")), " ").as("words"))
      .select(MinhashSignature(col("words"), 3, 12))
      .queryExecution.executedPlan.toString
    assert(plan.trim.startsWith("*("), plan)
  }

  test("native expressions compile under CODEGEN_ONLY (no silent interpreter fallback)") {
    // A static call that Janino cannot resolve doesn't fail the query —
    // UnsafeProjection quietly falls back to interpreter mode and the
    // "codegen'd" expression runs interpreted (this bit the round-2
    // simhash expressions: the companion's `eval` forwarder is
    // suppressed because UnaryExpression already has eval(InternalRow)).
    // CODEGEN_ONLY + wholeStage=off makes the compile error fatal here.
    val factory = "spark.sql.codegen.factoryMode"
    val whole = "spark.sql.codegen.wholeStage"
    val prevF = spark.conf.get(factory, "FALLBACK")
    val prevW = spark.conf.get(whole, "true")
    spark.conf.set(factory, "CODEGEN_ONLY")
    spark.conf.set(whole, "false")
    try {
      val out = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .select(
          H32(col("doc_id").cast("string")).as("h"),
          SaltedH32Array(col("words"), 0).as("wh"),
          Simhash32FromHashes(SaltedH32Array(col("words"), 1)).as("sh"),
          ShinglesArray(col("words"), 3).as("sg"),
          MinhashSignature(col("words"), 3, 12).as("m"),
          DotProduct(
            transform(col("words"), w => length(w).cast("double")),
            transform(col("words"), w => length(w).cast("double"))).as("dp"),
          L2Normalize(
            transform(col("words"), w => length(w).cast("double"))).as("l2n"),
          NfcNormalize(concat(col("doc_id").cast("string"), lit("é"))).as("nfc"))
        .collect()
      assert(out.nonEmpty)
    } finally {
      spark.conf.set(factory, prevF)
      spark.conf.set(whole, prevW)
    }
  }

  test("msgpack_decode_frame yields null on malformed bytes (poison pill)") {
    val df = Seq(Array[Byte](0x47, 0x11), Array[Byte]()).toDF("value")
    val rows = df.select(MsgpackDecodeFrame(col("value")).as("f")).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("wrong-typed or invalid expression arguments fail at ANALYSIS, not per-row") {
    // Exercise the same expressions the SQL registration binds
    // (StreamingSpec pins that binding); the hardening contract is
    // fail-at-analysis instead of AIOOBE/infinite-loop/null-every-row
    // at execution.
    val df = Seq((1L, "a b c")).toDF("id", "text")
    // out-of-range signature size: 12 coefficient pairs exist — this
    // used to AIOOBE per row mid-job
    val eK = intercept[Exception] {
      df.select(MinhashSignature(split(col("text"), " "), 3, 16)).collect()
    }
    assert(eK.getMessage.contains("signature size"), eK.getMessage)
    // n < 1 used to loop forever inside compute
    val eN = intercept[Exception] {
      df.select(ShinglesArray(split(col("text"), " "), 0)).collect()
    }
    assert(eN.getMessage.contains("shingle width"), eN.getMessage)
    // a STRING through msgpack_decode_frame used to null every row
    // (CCE swallowed by the poison-pill catch) — now an analysis error
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(MsgpackDecodeFrame(col("text"))).collect()
    }
    // h32 on a non-string implicitly casts (bigint → string) and
    // matches the explicit-cast value
    val Array(r) = df.select(
      (H32(col("id")) === H32(col("id").cast("string"))).as("same")).collect()
    assert(r.getBoolean(0))
  }
}
