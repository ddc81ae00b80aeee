package graft.sources

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-format source/sink proof: the reference pipeline's sinks are
  * Kafka / MP4 / S3 (all covered in `graft.streaming`); a Spark-native
  * engine additionally owes its users the columnar/text format matrix.
  * [[defs]] registers a ROUND-TRIP query — write a deterministic
  * lineitem slice to ORC, JSON, and CSV, read each back through the
  * same `spark.read` machinery a user would hit, and aggregate — whose
  * oracle is the SAME aggregate computed from the original parquet:
  * the query hash-matches iff every format round-trips values exactly.
  *
  * Determinism notes: numeric columns are quantized to DECIMAL before
  * writing so the text formats (JSON/CSV) carry exact decimal strings,
  * not shortest-double renderings; reads use EXPLICIT schemas (schema
  * inference is both slow and type-lossy — the real-pipeline rule this
  * query exists to document); the output directory is derived from the
  * input path so concurrent runs against different scale factors can't
  * clobber each other. Scale: the slice is 1/97th of lineitem and the
  * round-trip is three bounded writes — the query exists to prove the
  * I/O paths, not to benchmark them.
  */
object FormatQueries {

  import QueryDef.sql

  /** Per-JVM token for the side-write scratch dirs. The r8 driver gate
    * saw torn read-backs ("rows ok / hash off") consistent with two
    * JVMs — e.g. a Verify and a Bench sweep over the same sf dir —
    * racing on a path derived only from the input dir. A per-process
    * UUID makes the scratch space unshareable by construction while
    * keeping reruns within one JVM stable (overwrite mode still
    * applies).
    */
  private val jvmToken: String =
    java.util.UUID.randomUUID().toString.take(8)

  private val schema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("qty", DecimalType(15, 4)),
    StructField("price", DecimalType(15, 4)),
    StructField("l_returnflag", StringType)))

  val defs: Seq[QueryDef] = Seq(
    sql(
      "q_format_roundtrip",
      """WITH s AS (SELECT l_orderkey, l_linenumber,
        |             CAST(l_quantity AS DECIMAL(15,4)) AS qty,
        |             CAST(l_extendedprice AS DECIMAL(15,4)) AS price,
        |             l_returnflag
        |           FROM lineitem WHERE l_orderkey % 97 = 0),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |             CAST(sum(CAST(qty * 10000 AS BIGINT)) AS BIGINT) AS sum_qty_e4,
        |             CAST(sum(CAST(price * 10000 AS BIGINT)) AS BIGINT) AS sum_price_e4,
        |             CAST(count(DISTINCT l_returnflag) AS BIGINT) AS n_flags,
        |             CAST(sum(l_orderkey + l_linenumber) AS BIGINT) AS key_sum
        |      FROM s)
        |SELECT fmt, n_rows, sum_qty_e4, sum_price_e4, n_flags, key_sum
        |FROM a CROSS JOIN (VALUES ('csv'), ('json'), ('orc')) t(fmt)
        |ORDER BY fmt""".stripMargin) { (s, dir) =>
      val slice = Tables(s, dir, "lineitem")
        .where(col("l_orderkey") % 97 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("decimal(15,4)").as("qty"),
          col("l_extendedprice").cast("decimal(15,4)").as("price"),
          col("l_returnflag"))
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_fmt_rt_${math.abs(dir.hashCode)}_$jvmToken").getAbsolutePath
      slice.write.mode("overwrite").orc(s"$base/orc")
      slice.write.mode("overwrite").json(s"$base/json")
      slice.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
      val back = Seq(
        "csv" -> s.read.schema(schema).option("header", "true").csv(s"$base/csv"),
        "json" -> s.read.schema(schema).json(s"$base/json"),
        "orc" -> s.read.schema(schema).orc(s"$base/orc"))
      // de-rendered by construction: DECIMAL(15,4)·10⁴ is exactly
      // integral per row, so the sums are plain BIGINT ten-thousandths
      // and no decimal rendering reaches the output
      back.map { case (fmt, df) =>
        df.agg(count(lit(1)).as("n_rows"),
            sum((col("qty") * 10000).cast("long")).cast("long")
              .as("sum_qty_e4"),
            sum((col("price") * 10000).cast("long")).cast("long")
              .as("sum_price_e4"),
            countDistinct("l_returnflag").as("n_flags"),
            sum(col("l_orderkey") + col("l_linenumber")).cast("long")
              .as("key_sum"))
          .select(lit(fmt).as("fmt"), col("n_rows"), col("sum_qty_e4"),
            col("sum_price_e4"), col("n_flags"), col("key_sum"))
      }.reduce(_ unionByName _)
        .orderBy("fmt")
    },

    // ---- hive-partitioned layout + partition-pruning proof ----
    // The table-layout op a 100-TB events table lives or dies by:
    // write the stream partitioned by day (`ym=`), read it back
    // with a day predicate, and prove — in the result itself — that
    // the scan touched exactly ONE partition. `pruned_ok` is read off
    // the executed plan's FileSourceScan (`PartitionCount: 1`, i.e.
    // partition pruning happened at planning time, the other months'
    // files were never listed into the scan) and the oracle pins it
    // TRUE; the aggregate hash-matches the same day computed from
    // the original parquet, so the layout round-trips values exactly.
    // The probe day is the corpus's first day (one 1-row driver
    // read — the sanctioned scalar collect), so the query is
    // scale-factor-portable.
    sql(
      "q_partition_prune",
      """WITH m AS (SELECT strftime(min(ts), '%Y-%m-%d') AS ym FROM events),
        |s AS (SELECT event_type, value FROM events
        |      WHERE strftime(ts, '%Y-%m-%d') = (SELECT ym FROM m))
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT)
        |         AS sum_value_e6,
        |       CAST(1 AS BIGINT) AS pruned_ok
        |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("event_type"), col("value"),
          date_format(col("ts"), "yyyy-MM-dd").as("ym"))
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_part_prune_${math.abs(dir.hashCode)}_$jvmToken").getAbsolutePath
      ev.write.mode("overwrite").partitionBy("ym").parquet(base)
      val m0 = ev.agg(min("ym")).first().getString(0)
      val back = s.read.parquet(base).where(col("ym") === m0)
      // the proof: pruning happened iff the scan's file index kept
      // exactly one partition directory
      val scans = back.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      val pruned = scans.nonEmpty &&
        scans.forall(_.relation.location.listFiles(
          scans.head.partitionFilters, Nil).length == 1)
      // de-rendered by construction: per-row micros (DECIMAL(18,6)·10⁶
      // is exactly integral) summed as BIGINT; the prune proof is a
      // 0/1 BIGINT so no boolean/decimal rendering reaches the output
      back.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum((col("value").cast("decimal(18,6)") * 1000000).cast("long"))
            .cast("long").as("sum_value_e6"))
        .select(col("event_type"), col("n"), col("sum_value_e6"),
          lit(if (pruned) 1L else 0L).as("pruned_ok"))
        .orderBy("event_type")
    },

    // ---- z-order layout audit (multi-dimensional data skipping) ----
    // The decision audit behind Delta/Iceberg `OPTIMIZE ZORDER BY`:
    // before rewriting 100 TB, a table optimizer asks "how many files
    // would a (partkey, suppkey) predicate scan under the CURRENT
    // linear layout vs a Morton-interleaved one?" — this query
    // computes that answer as data, using the repo's shipped
    // [[ZOrder.spreadBits]] (the physical rewrite itself —
    // range-partition + sort on the z-value — is `ZOrder.writeZOrdered`,
    // plan-pinned by `ZOrderSpec` on real parquet; this oracle pins
    // the MATH cross-engine). Both layouts assign rows to 64
    // equal-width logical files — linear by l_orderkey (the natural
    // insert order, uncorrelated with either predicate column), z by
    // the raw interleave of the two positive keys (the signed-shift
    // correction in ZOrder.zvalue is for full-range ints; TPC-H keys
    // are positive, documented here) — then per (layout, file) min/max
    // column stats answer three predicates exactly the way parquet
    // footer pruning would: files whose [min, max] overlaps the range
    // get scanned. Expected shape (hash-pinned): the linear layout
    // scans ALL files for every predicate (each file spans the full
    // pk/sk range); the z layout bounds both single-column and box
    // scans by the curve's grid geometry. ALL-INTEGER outputs
    // (rendering-proof); the only driver motion is the 1-row
    // max/zmin/zmax scalar broadcast. 100-TB story: two corpus passes
    // (stats build, exact match audit), file stats are O(files), and
    // the audited layout is exactly the one writeZOrdered produces.
    sql(
      "q_zorder_layout",
      """WITH base AS (SELECT l_orderkey AS ok, l_partkey AS pk,
        |                l_suppkey AS sk FROM lineitem),
        |mx AS (SELECT max(ok) AS max_ok, max(pk) AS max_pk,
        |         max(sk) AS max_sk, min(pk) AS min_pk, min(sk) AS min_sk
        |       FROM base),
        |g AS (SELECT ok, pk, sk, max_ok, max_pk, max_sk,
        |        ((pk - min_pk) * 65535)
        |          // (CASE WHEN max_pk > min_pk THEN max_pk - min_pk
        |                   ELSE 1 END) AS a0,
        |        ((sk - min_sk) * 65535)
        |          // (CASE WHEN max_sk > min_sk THEN max_sk - min_sk
        |                   ELSE 1 END) AS b0
        |      FROM base CROSS JOIN mx),
        |z1 AS (SELECT ok, pk, sk, max_ok, max_pk, max_sk,
        |         (a0 | (a0 << 16)) & 281470681808895 AS a1,
        |         (b0 | (b0 << 16)) & 281470681808895 AS b1 FROM g),
        |z2 AS (SELECT ok, pk, sk, max_ok, max_pk, max_sk,
        |         (a1 | (a1 << 8)) & 71777214294589695 AS a2,
        |         (b1 | (b1 << 8)) & 71777214294589695 AS b2 FROM z1),
        |z3 AS (SELECT ok, pk, sk, max_ok, max_pk, max_sk,
        |         (a2 | (a2 << 4)) & 1085102592571150095 AS a3,
        |         (b2 | (b2 << 4)) & 1085102592571150095 AS b3 FROM z2),
        |z4 AS (SELECT ok, pk, sk, max_ok, max_pk, max_sk,
        |         (a3 | (a3 << 2)) & 3689348814741910323 AS a4,
        |         (b3 | (b3 << 2)) & 3689348814741910323 AS b4 FROM z3),
        |zz AS (SELECT ok, pk, sk, max_ok, max_pk, max_sk,
        |         ((a4 | (a4 << 1)) & 6148914691236517205)
        |         | (((b4 | (b4 << 1)) & 6148914691236517205) << 1) AS z
        |       FROM z4),
        |zb AS (SELECT min(z) AS zmin, max(z) AS zmax FROM zz),
        |asg AS (SELECT pk, sk, max_pk, max_sk,
        |          (ok - 1) // (((max_ok - 1) // 64) + 1) AS f_lin,
        |          (z - zmin) // (((zmax - zmin) // 64) + 1) AS f_z
        |        FROM zz, zb),
        |st AS (SELECT 'linear' AS layout, f_lin AS f,
        |         min(pk) AS mnp, max(pk) AS mxp, min(sk) AS mns,
        |         max(sk) AS mxs, count(*) AS c
        |       FROM asg GROUP BY 1, 2
        |       UNION ALL
        |       SELECT 'zorder' AS layout, f_z AS f,
        |         min(pk), max(pk), min(sk), max(sk), count(*)
        |       FROM asg GROUP BY 1, 2),
        |pred AS (SELECT max_pk // 4 AS pk_lo,
        |           max_pk // 4 + max_pk // 8 AS pk_hi,
        |           max_sk // 4 AS sk_lo, max_sk // 4 + max_sk // 8 AS sk_hi
        |         FROM mx),
        |mrows AS (SELECT CAST(count(*) AS BIGINT) AS match_rows_box
        |          FROM base, pred
        |          WHERE pk BETWEEN pk_lo AND pk_hi
        |            AND sk BETWEEN sk_lo AND sk_hi),
        |agg AS (SELECT layout, CAST(count(*) AS BIGINT) AS files_total,
        |          CAST(sum(c) AS BIGINT) AS rows_total,
        |          CAST(sum(CASE WHEN mnp <= pk_hi AND mxp >= pk_lo
        |                    THEN 1 ELSE 0 END) AS BIGINT) AS scan_files_pk,
        |          CAST(sum(CASE WHEN mns <= sk_hi AND mxs >= sk_lo
        |                    THEN 1 ELSE 0 END) AS BIGINT) AS scan_files_sk,
        |          CAST(sum(CASE WHEN mnp <= pk_hi AND mxp >= pk_lo
        |                     AND mns <= sk_hi AND mxs >= sk_lo
        |                    THEN 1 ELSE 0 END) AS BIGINT) AS scan_files_box
        |        FROM st, pred GROUP BY 1)
        |SELECT layout, files_total, rows_total, scan_files_pk,
        |       scan_files_sk, scan_files_box, match_rows_box
        |FROM agg CROSS JOIN mrows ORDER BY layout""".stripMargin) { (s, dir) =>
      val base = Tables(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"),
          col("l_suppkey").as("sk"))
      val mx = base.agg(max("ok").as("max_ok"), max("pk").as("max_pk"),
        max("sk").as("max_sk"), min("pk").as("min_pk"),
        min("sk").as("min_sk"))
        .localCheckpoint() // 1-row scalar frame, read by three passes
      // min-max-scaled 16-bit coordinates: raw keys overflowed the
      // 32-bit Morton spread at the 100x corpus (partkeys > 2^32 put
      // the interleave's top bit into << 1's sign position), and the
      // base corpora start their key ranges at 0 (a pk-1 scaling went
      // NEGATIVE and exploded the spread) — (k - min)·65535 div
      // (max - min) lands exactly in [0, 2^16) for ANY key range,
      // keeping the full 64 x 64 grid resolution the 64-file audit
      // reads
      val zz = base.crossJoin(broadcast(mx))
        .selectExpr("ok", "pk", "sk",
          "((pk - min_pk) * 65535) div " +
            "(CASE WHEN max_pk > min_pk THEN max_pk - min_pk ELSE 1 END)" +
            " AS a0",
          "((sk - min_sk) * 65535) div " +
            "(CASE WHEN max_sk > min_sk THEN max_sk - min_sk ELSE 1 END)" +
            " AS b0")
        .withColumn("z",
          ZOrder.spreadBits(col("a0"))
            .bitwiseOR(shiftleft(ZOrder.spreadBits(col("b0")), 1)))
      val zb = zz.agg(min("z").as("zmin"), max("z").as("zmax"))
        .localCheckpoint()
      val asg = zz.crossJoin(broadcast(zb)).crossJoin(broadcast(mx))
        .selectExpr("pk", "sk",
          "(ok - 1) div (((max_ok - 1) div 64) + 1) AS f_lin",
          "(z - zmin) div (((zmax - zmin) div 64) + 1) AS f_z")
      def fileStats(layout: String, f: String) =
        asg.groupBy(lit(layout).as("layout"), col(f).as("f"))
          .agg(min("pk").as("mnp"), max("pk").as("mxp"),
            min("sk").as("mns"), max("sk").as("mxs"),
            count(lit(1)).as("c"))
      val st = fileStats("linear", "f_lin")
        .unionByName(fileStats("zorder", "f_z"))
      val pred = mx.selectExpr("max_pk div 4 AS pk_lo",
        "max_pk div 4 + max_pk div 8 AS pk_hi",
        "max_sk div 4 AS sk_lo", "max_sk div 4 + max_sk div 8 AS sk_hi")
      val mrows = base.crossJoin(broadcast(pred))
        .where(col("pk").between(col("pk_lo"), col("pk_hi"))
          && col("sk").between(col("sk_lo"), col("sk_hi")))
        .agg(count(lit(1)).as("match_rows_box"))
      def overlap(mn: String, mx: String, lo: String, hi: String) =
        sum(when(col(mn) <= col(hi) && col(mx) >= col(lo), 1L)
          .otherwise(0L)).cast("long")
      st.crossJoin(broadcast(pred))
        .groupBy("layout")
        .agg(count(lit(1)).as("files_total"),
          sum("c").cast("long").as("rows_total"),
          overlap("mnp", "mxp", "pk_lo", "pk_hi").as("scan_files_pk"),
          overlap("mns", "mxs", "sk_lo", "sk_hi").as("scan_files_sk"),
          sum(when(col("mnp") <= col("pk_hi") && col("mxp") >= col("pk_lo")
            && col("mns") <= col("sk_hi") && col("mxs") >= col("sk_lo"), 1L)
            .otherwise(0L)).cast("long").as("scan_files_box"))
        .crossJoin(broadcast(mrows))
        .orderBy("layout")
    }
  )
}
