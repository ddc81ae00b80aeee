package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scalar-function surface: string, date/time, math, array
  * (explode/transform/filter/aggregate), and JSON extraction — all
  * codegen'd built-ins (no UDFs), per SURVEY.md §2.2.
  */
object ScalarQueries {

  import QueryDef.sql

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // ---- string functions ----
    sql(
      "q_string_fns",
      """SELECT p_partkey,
        |       upper(p_name) AS uname,
        |       substr(p_name, 1, 4) AS prefix,
        |       p_brand || ':' || p_type AS tag,
        |       CAST(length(p_name) AS INT) AS name_len,
        |       replace(p_name, ' ', '_') AS snake,
        |       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |       CAST(instr(p_name, 'e') AS INT) AS first_e
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 4).as("prefix"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("tag"),
          length(col("p_name")).cast("int").as("name_len"),
          regexp_replace(col("p_name"), " ", "_").as("snake"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
          instr(col("p_name"), "e").cast("int").as("first_e"))
        .orderBy("p_partkey")
    },

    // ---- date / time functions ----
    sql(
      "q_date_fns",
      """SELECT event_id,
        |       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_ts,
        |       CAST(extract(hour FROM ts) AS INT) AS hr,
        |       CAST(dayofweek(ts) AS INT) AS dow,
        |       strftime(ts, '%Y-%m-%d %H:%M') AS fmt,
        |       CAST(date_trunc('day', ts) + INTERVAL 7 DAY AS TIMESTAMP) AS next_week
        |FROM events
        |WHERE event_id % 10 = 0
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      // DuckDB dayofweek: 0=Sunday; Spark dayofweek: 1=Sunday.
      t(s, dir, "events")
        .where(col("event_id") % 10 === 0)
        .select(
          col("event_id"),
          date_trunc("day", col("ts")).as("day_ts"),
          hour(col("ts")).as("hr"),
          (dayofweek(col("ts")) - 1).as("dow"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm").as("fmt"),
          (date_trunc("day", col("ts")) + expr("INTERVAL 7 DAY")).as("next_week"))
        .orderBy("event_id")
    },

    // ---- math functions ----
    sql(
      "q_math_fns",
      """SELECT l_orderkey, l_linenumber,
        |       round(abs(l_extendedprice - 30000), 2) AS dev,
        |       round(ln(l_extendedprice), 6) AS log_price,
        |       round(sqrt(l_quantity), 6) AS sqrt_qty,
        |       round(pow(l_discount, 2), 6) AS disc_sq,
        |       CAST(l_orderkey % 7 AS BIGINT) AS bucket7,
        |       CAST(ceil(l_quantity / 10) AS BIGINT) AS qty_decile,
        |       CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k
        |FROM lineitem
        |WHERE l_orderkey % 25 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_orderkey") % 25 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(abs(col("l_extendedprice") - 30000), 2).as("dev"),
          round(log(col("l_extendedprice")), 6).as("log_price"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
          round(pow(col("l_discount"), 2), 6).as("disc_sq"),
          (col("l_orderkey") % 7).as("bucket7"),
          ceil(col("l_quantity") / 10).as("qty_decile"),
          floor(col("l_extendedprice") / 1000).as("price_k"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- array functions: split / transform / filter / aggregate ----
    sql(
      "q_array_fns",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        |SELECT doc_id,
        |       CAST(len(words) AS INT) AS n_words,
        |       CAST(len(list_filter(words, x -> length(x) > 4)) AS INT) AS n_long,
        |       CAST(list_aggregate(list_transform(words, x -> length(x)), 'sum') AS BIGINT) AS total_chars,
        |       array_to_string(list_transform(words[1:3], x -> upper(x)), '-') AS head3
        |FROM w ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .select(
          col("doc_id"),
          size(col("words")).as("n_words"),
          size(filter(col("words"), x => length(x) > 4)).as("n_long"),
          aggregate(transform(col("words"), x => length(x)), lit(0L),
            (acc, x) => acc + x).as("total_chars"),
          concat_ws("-", transform(slice(col("words"), 1, 3), x => upper(x))).as("head3"))
        .orderBy("doc_id")
    },

    // ---- explode / unnest (generator): word frequencies ----
    sql(
      "q_explode_wordcount",
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word
        |HAVING count(*) >= 5
        |ORDER BY n DESC, word
        |LIMIT 40""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .where(col("n") >= 5)
        .orderBy(desc("n"), col("word"))
        .limit(40)
    },

    // ---- conditional scalar functions ----
    sql(
      "q_conditional_fns",
      """SELECT l_orderkey, l_linenumber,
        |       round(greatest(l_tax, l_discount), 2) AS max_rate,
        |       round(least(l_tax, l_discount), 2) AS min_rate,
        |       CASE WHEN l_quantity > 25 THEN 'big' ELSE 'small' END AS size_class,
        |       coalesce(nullif(l_returnflag, 'N'), '-') AS flag_or_dash
        |FROM lineitem
        |WHERE l_orderkey % 40 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_orderkey") % 40 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(greatest(col("l_tax"), col("l_discount")), 2).as("max_rate"),
          round(least(col("l_tax"), col("l_discount")), 2).as("min_rate"),
          when(col("l_quantity") > 25, "big").otherwise("small").as("size_class"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("-")).as("flag_or_dash"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- JSON extraction ----
    sql(
      "q_json_fns",
      """SELECT event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"), max(col("k")).as("k_max"))
        .orderBy("event_type")
    },

    // ---- VARIANT (Spark 4 semi-structured type): parse the JSON once
    //      into a variant and extract typed paths; try_variant_get
    //      yields null for a missing path instead of failing. The
    //      DuckDB twin uses its JSON type the same way. ----
    sql(
      "q_variant",
      """SELECT event_id,
        |       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |       CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT) AS k_bucket,
        |       json_extract_string(props, '$.missing') AS missing_field
        |FROM events WHERE event_id % 13 = 0
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .where(col("event_id") % 13 === 0)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(
          col("event_id"),
          variant_get(col("v"), "$.k", "bigint").as("k"),
          (variant_get(col("v"), "$.k", "bigint") % 10).as("k_bucket"),
          try_variant_get(col("v"), "$.missing", "string").as("missing_field"))
        .orderBy("event_id")
    },

    // ---- array set operations (order-normalized via sort) ----
    sql(
      "q_array_setops",
      """WITH d AS (SELECT doc_id,
        |                  string_split(substr(text, 1, 60), ' ') AS w1,
        |                  string_split(substr(text, 30, 60), ' ') AS w2
        |           FROM documents WHERE doc_id % 60 = 0)
        |SELECT doc_id,
        |       array_to_string(list_sort(list_distinct(list_intersect(w1, w2))), ',') AS inter,
        |       CAST(len(list_distinct(w1 || w2)) AS INT) AS n_union,
        |       CAST(len(list_filter(list_distinct(w1), x -> NOT list_contains(w2, x))) AS INT) AS n_only1
        |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .where(col("doc_id") % 60 === 0)
        .select(col("doc_id"),
          split(substring(col("text"), 1, 60), " ").as("w1"),
          split(substring(col("text"), 30, 60), " ").as("w2"))
        .select(
          col("doc_id"),
          concat_ws(",", array_sort(array_distinct(array_intersect(col("w1"), col("w2"))))).as("inter"),
          size(array_union(col("w1"), col("w2"))).cast("int").as("n_union"),
          size(array_except(col("w1"), col("w2"))).cast("int").as("n_only1"))
        .orderBy("doc_id")
    },

    // ---- aggregation to list: sorted group concat ----
    sql(
      "q_group_concat",
      """SELECT n_regionkey AS region,
        |       string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY region""".stripMargin) { (s, dir) =>
      t(s, dir, "nation")
        .groupBy(col("n_regionkey").as("region"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
        .orderBy("region")
    },

    // ---- map type: build / access / keys / cardinality ----
    sql(
      "q_map_fns",
      """WITH m AS (SELECT event_id,
        |                  map(['type', 'uid'],
        |                      [event_type, CAST(user_id AS VARCHAR)]) AS meta
        |           FROM events WHERE event_id % 25 = 0)
        |SELECT event_id,
        |       meta['type'][1] AS mtype,
        |       meta['uid'][1] AS muid,
        |       CAST(cardinality(meta) AS INT) AS n_keys,
        |       array_to_string(list_sort(map_keys(meta)), ',') AS keys_sorted
        |FROM m ORDER BY event_id""".stripMargin) { (s, dir) =>
      val meta = map_from_arrays(
        array(lit("type"), lit("uid")),
        array(col("event_type"), col("user_id").cast("string")))
      t(s, dir, "events")
        .where(col("event_id") % 25 === 0)
        .select(col("event_id"), meta.as("meta"))
        .select(
          col("event_id"),
          element_at(col("meta"), "type").as("mtype"),
          element_at(col("meta"), "uid").as("muid"),
          size(col("meta")).as("n_keys"),
          concat_ws(",", array_sort(map_keys(col("meta")))).as("keys_sorted"))
        .orderBy("event_id")
    },

    // ---- base64 / binary round-trip ----
    sql(
      "q_base64",
      """SELECT doc_id,
        |       to_base64(CAST(substr(text, 1, 12) AS BLOB)) AS b64,
        |       CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
        |       md5(text) AS text_md5
        |FROM documents
        |WHERE doc_id % 7 = 0
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .where(col("doc_id") % 7 === 0)
        .select(
          col("doc_id"),
          base64(substring(col("text"), 1, 12).cast("binary")).as("b64"),
          octet_length(col("text").cast("binary")).as("n_bytes"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    }
  )
}
