package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (Z-order) interleaving for
  * write-time clustering.
  *
  * Why this matters at 100 TB: parquet data skipping prunes row groups
  * by per-column min/max. Sorting by one column gives perfect pruning
  * on that column and none on any other; interleaving the bits of two
  * (or more) columns makes rows close in EITHER dimension close on
  * disk, so a filter on any interleaved column prunes most files. This
  * is the layout step a warehouse runs before publishing a big fact
  * table queried by both key and date (Delta/Iceberg expose the same
  * idea as `ZORDER BY` / sort orders).
  *
  * The z-value is pure builtin bit arithmetic (shift/mask/or), fully
  * codegen'd — no UDF, no custom expression — and reproducible outside
  * the engine (the DuckDB oracle replays it bit-for-bit).
  */
object Layout {

  /** 2·bits-wide Morton code interleaving the low `bits` bits of two
    * non-negative integer columns: x occupies even bit positions, y odd.
    * With the default 31 bits per dimension the result stays positive
    * in a signed 64-bit long. Values are masked to `bits` (callers
    * should range-reduce wider domains first — e.g. days since an
    * epoch, bucketed ids).
    */
  def zValue(x: Column, y: Column, bits: Int = 31): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftrightunsigned(xl, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftrightunsigned(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` into `numPartitions` z-ordered output partitions:
    * range-partition on the Morton code of (x, y), sort within each
    * partition by it. Written out, every file covers a compact z-range
    * — i.e. a small rectangle in (x, y) space — so min/max pruning
    * works on both columns. One shuffle (the range exchange), as any
    * global re-layout must.
    */
  def zorderBy(df: DataFrame, x: Column, y: Column, numPartitions: Int,
               bits: Int = 31): DataFrame = {
    val z = zValue(x, y, bits)
    df.repartitionByRange(numPartitions, z).sortWithinPartitions(z)
  }
}
