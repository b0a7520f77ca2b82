package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — the multi-dimensional layout
  * lever: sorting/range-partitioning a table by the interleaved key
  * co-locates rows that are close in BOTH dimensions, so min/max file
  * statistics prune 2-D predicates the way single-column sort orders
  * only prune 1-D ones (the technique behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`).
  *
  * Built entirely from builtin bit expressions (shift/and/or) — the
  * whole key stays inside whole-stage codegen; no UDF, no custom
  * expression needed. Cost is a narrow map: 2×16 masked shifts and a
  * 32-term OR fold per row, constant-folded by Catalyst where inputs
  * are literals.
  */
object ZOrder {

  /** Interleave the low 16 bits of two non-negative int columns into a
    * 32-bit Morton key: bit i of `x` lands at key bit 2i, bit i of `y`
    * at 2i+1. Monotone by quadrant: the key's top two bits are
    * (y₁₅, x₁₅), so a z-range scan maps to bounded x/y rectangles.
    * Computed in LongType: y's bit 15 lands at key bit 31, which is the
    * int sign bit — a 32-bit interleave would go negative there and
    * sort quadrants 2/3 before 0/1.
    */
  def interleave16(x: Column, y: Column): Column = {
    val (xl, yl) = (x.cast("long"), y.cast("long"))
    (0 until 16).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Inverse: the (x, y) pair a 32-bit Morton key encodes. */
  def deinterleave16(z: Column): (Column, Column) = {
    val zl = z.cast("long")
    def gather(offset: Int): Column =
      (0 until 16).map { i =>
        shiftleft(shiftright(zl, 2 * i + offset).bitwiseAND(lit(1L)), i)
      }.reduce(_ bitwiseOR _)
    (gather(0), gather(1))
  }
}
