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
    */
  def interleave16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y, i).bitwiseAND(lit(1)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Inverse: the (x, y) pair a 32-bit Morton key encodes. */
  def deinterleave16(z: Column): (Column, Column) = {
    def gather(offset: Int): Column =
      (0 until 16).map { i =>
        shiftleft(shiftright(z, 2 * i + offset).bitwiseAND(lit(1)), i)
      }.reduce(_ bitwiseOR _)
    (gather(0), gather(1))
  }
}
