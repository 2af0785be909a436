package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout keys — Z-order (Morton) interleaving for
  * write-time clustering. At 100 TB the scan-side win of this engine's
  * pushdown discipline depends on FILE-LEVEL min/max statistics actually
  * pruning; a table range-partitioned and sorted on a single column prunes
  * on that column only. Interleaving the bits of two quantized dimensions
  * into one key and `repartitionByRange(zkey)`-ing the write makes every
  * output file cover a small RECTANGLE of the 2-D space, so parquet
  * min/max stats prune selective predicates on EITHER dimension — the
  * standard lakehouse `OPTIMIZE ZORDER BY` mechanic, expressed as a plain
  * column so any writer can use it.
  *
  * The key is pure integer bit-arithmetic (shifts/and/or on longs), exact
  * and engine-portable; [[zorderStats]] is the layout auditor — bucket the
  * keyspace and show each bucket's bounding box in both dimensions, which
  * is what "files prune on both columns" looks like as a query result.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of two non-negative dimension
    * columns: x's bit i lands at position 2i, y's at 2i+1. `bits` ≤ 31
    * keeps the key in a positive long. Values are masked to `bits` first
    * (caller quantizes dimensions into range — ranks, bucket indices,
    * truncated units). */
  def zorderKey2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of [1,31]")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce[Column](_ + _)
  }

  /** Layout audit: bucket the Z-keyspace into 2^`bucketBits` leading-bit
    * buckets and report each bucket's row count and bounding box over
    * both dimensions. A good layout shows every bucket spanning a narrow
    * min/max range in BOTH x and y — exactly the property file-level
    * stats need to prune 2-D predicates. One hash aggregate. */
  def zorderStats(df: DataFrame, x: Column, y: Column, bits: Int,
                  bucketBits: Int): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 2 * bits,
      s"bucketBits=$bucketBits out of [1, ${2 * bits}]")
    val z = zorderKey2(x, y, bits)
    df.select(z.as("zkey"), x.cast("long").as("__x"),
        y.cast("long").as("__y"))
      .groupBy(shiftright(col("zkey"), 2 * bits - bucketBits)
        .as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("__x")).as("x_min"), max(col("__x")).as("x_max"),
        min(col("__y")).as("y_min"), max(col("__y")).as("y_max"))
  }
}
