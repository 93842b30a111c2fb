package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) interleave as pure codegen'd built-ins — the sort
  * key for multi-dimension data layout: sorting by the interleaved code
  * keeps rows close in BOTH dimensions close in file order, so per-file
  * min/max stats prune 2-D box queries that a single-column sort can
  * only prune on its leading column. Same bit arithmetic as
  * [[SpatialCellMath.spread]], lifted to Columns.
  */
object ZOrder {

  /** Spread the low 32 bits of `c` into even bit positions. */
  def spreadBits(c: Column): Column = {
    var v = c.bitwiseAND(lit(0xffffffffL))
    v = v.bitwiseOR(shiftleft(v, 16)).bitwiseAND(lit(0x0000ffff0000ffffL))
    v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00ff00ff00ff00ffL))
    v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
    v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x3333333333333333L))
    v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Morton code of two non-negative grid coordinates (≤ 32 bits each). */
  def morton(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /** Morton code of k non-negative grid coordinates of `bits` bits each:
    * bit i of coordinate j lands at position i·k + j, so the 2-D case
    * agrees with [[morton]] bit for bit. Generic shift-and-mask (bits·k
    * OR terms, all codegen'd built-ins); k·bits must fit a signed long.
    * Three-plus dimensions are the (time-bucket × object × cell) layout
    * case: a file tile then bounds ALL participating dimensions, so
    * min/max stats prune stripes in any of them.
    */
  def mortonK(coords: Seq[Column], bits: Int): Column = {
    require(coords.nonEmpty, "mortonK needs at least one coordinate")
    require(bits > 0, s"mortonK needs bits >= 1, got $bits")
    require(coords.size * bits <= 63,
      s"${coords.size} dims x $bits bits overflow a long")
    val k = coords.size
    coords.zipWithIndex.map { case (c, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j)
      }.reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
  }

  /** Quantize a numeric column to a [0, 2^bits) grid given its observed
    * [lo, hi] range (degenerate ranges collapse to 0).
    */
  def quantize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = (1L << bits) - 1
    if (hi <= lo) lit(0L)
    else least(lit(n), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(n.toDouble))
        .cast("long")))
  }
}
