package graft

/** Schema-drift canary: asserts the POST-normalization Spark schema
  * (names AND types, in order) of all 10 driver tables at sf0.001.
  *
  * The driver has changed the physical `events.ts` encoding twice
  * already (TIMESTAMP(NANOS) → µs TIMESTAMP_NTZ). `Tables.apply`
  * normalizes every encoding to plain TimestampType; if a third
  * encoding ever arrives, THIS test names the drift directly instead
  * of five unrelated queries failing analysis downstream.
  */
class TablesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  test("expected map covers exactly Tables.names") {
    assert(expected.keySet == Tables.names.toSet)
  }

  Tables.names.foreach { name =>
    test(s"$name: normalized schema matches (names + types, in order)") {
      val actual = Tables(spark, sf, name).schema
        .map(f => f.name -> f.dataType.catalogString)
      assert(actual == expected(name),
        s"schema drift in $name —\n  actual:   $actual\n  expected: ${expected(name)}")
    }
  }

  test("no table leaks a non-normalized timestamp encoding") {
    Tables.names.foreach { name =>
      val bad = Tables(spark, sf, name).schema.filter(f =>
        f.dataType.catalogString.startsWith("timestamp_ntz") ||
          (f.name == "ts" && f.dataType.catalogString != "timestamp"))
      assert(bad.isEmpty, s"$name: un-normalized temporal fields: $bad")
    }
  }
}
