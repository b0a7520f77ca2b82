package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Morton-key properties the layout lever depends on: the interleave is
  * a bijection on 16-bit pairs, and the key's top bits encode the
  * quadrant (so z-ranges map to bounded x/y rectangles).
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def pairs = (0 until 512).map { i =>
    val h = Integer.toUnsignedLong(scala.util.hashing.MurmurHash3
      .stringHash(s"z$i"))
    ((h & 0xFFFFL).toInt, ((h >> 16) & 0xFFFFL).toInt)
  }.toDF("x", "y")

  test("interleave16 round-trips through deinterleave16") {
    val z = pairs.withColumn("z", ZOrder.interleave16(col("x"), col("y")))
    val (dx, dy) = ZOrder.deinterleave16(col("z"))
    val bad = z.where(dx =!= col("x") || dy =!= col("y")).count()
    assert(bad === 0)
  }

  test("interleave16 is injective on distinct pairs") {
    val z = pairs.distinct()
      .select(ZOrder.interleave16(col("x"), col("y")).as("z"))
    assert(z.count() === z.distinct().count())
  }

  test("top two key bits are (y15, x15) — the quadrant") {
    val q = pairs.select(
      shiftright(ZOrder.interleave16(col("x"), col("y")), 30)
        .bitwiseAND(lit(3)).as("quad"),
      (shiftright(col("y"), 15).bitwiseAND(lit(1)) * lit(2) +
        shiftright(col("x"), 15).bitwiseAND(lit(1))).as("want"))
    assert(q.where(col("quad") =!= col("want")).count() === 0)
  }

  test("morton order localizes: consecutive z within a 256-cell block") {
    // rows sorted by z inside one 16x16 tile never leave the tile —
    // the file-stat-pruning property in miniature
    val tile = (0 until 16).flatMap(x => (0 until 16).map(y => (x, y)))
      .toDF("x", "y")
      .select(ZOrder.interleave16(col("x"), col("y")).as("z"))
    val zs = tile.as[Long].collect().sorted
    assert(zs.head === 0L && zs.last === 255L && zs.length === 256)
  }

  test("keys stay non-negative when y bit 15 is set (no int sign bit)") {
    // y ≥ 32768 puts a bit at key position 31 — in a 32-bit compute
    // that is the int sign bit and quadrants 2/3 would sort before
    // 0/1; the long-typed key must keep z monotone by quadrant
    val corners = Seq((0, 0), (65535, 0), (0, 65535), (65535, 65535))
      .toDF("x", "y")
      .select(col("y"), ZOrder.interleave16(col("x"), col("y")).as("z"))
    assert(corners.where(col("z") < 0).count() === 0)
    val lowQ = corners.where(col("y") < 32768)
      .agg(max(col("z"))).as[Long].head()
    val highQ = corners.where(col("y") >= 32768)
      .agg(min(col("z"))).as[Long].head()
    assert(lowQ < highQ)
  }
}
