package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * Parquet row-group/file min-max stats prune scans only when the data
  * is clustered on the filtered column. A linear sort clusters ONE
  * column; interleaving the bits of two columns and sorting by the
  * result clusters BOTH at once — every output file covers a small
  * rectangle of the (a, b) space, so predicates on either column (or
  * both) skip most files. This is the layout maintenance step behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`, expressed as plain Spark:
  * a closed-form bit-spread expression + `repartitionByRange` + a
  * within-partition sort. Everything is codegen'd Column math — no
  * UDF, no shuffle beyond the one range exchange the re-layout needs.
  */
object ZOrder {

  /** Spreads the low 32 bits of `x` (a non-negative long) into the
    * even bit positions of a 64-bit value — the classic 5-step
    * mask-and-shift Morton spread, as a Column expression.
    */
  def spreadBits(x: Column): Column = {
    val s1 = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val s4 = s3.bitwiseOR(shiftleft(s3, 2)).bitwiseAND(lit(0x3333333333333333L))
    s4.bitwiseOR(shiftleft(s4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Interleaved z-value of two integer-valued columns. Inputs are
    * shifted to unsigned order (int range → [0, 2^32)) so negative
    * values sort before positive ones, then bit-spread and woven
    * together: a takes the even bits, b the odd bits.
    *
    * The raw interleave must compare as UNSIGNED, but Spark sorts
    * longs signed — and b's top (unsigned-order) bit lands in z bit
    * 63, so without correction every b ≥ 0 row would sort BEFORE
    * every b < 0 row. Flipping bit 63 makes signed long comparison
    * equal unsigned Morton order, so the returned value is directly
    * usable as a sort/range-partition key.
    */
  def zvalue(a: Column, b: Column): Column = {
    def unsigned(c: Column): Column =
      c.cast("long") + lit(1L << 31)
    spreadBits(unsigned(a))
      .bitwiseOR(shiftleft(spreadBits(unsigned(b)), 1))
      .bitwiseXOR(lit(Long.MinValue))
  }

  /** Rewrites `df` into `nFiles` z-clustered parquet files on
    * (a, b). Range partition on the z-value (so files tile the
    * z-curve) and sort within partitions (so row groups inside each
    * file tile it too).
    */
  def writeZOrdered(df: DataFrame, a: Column, b: Column, outDir: String,
      nFiles: Int): Unit = {
    val z = zvalue(a, b).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }
}
