package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order spatial cell math: quantize (ra ∈ [0,360), dec ∈ [-90,90]) on a
  * 2^level × 2^level grid and interleave the bits (Morton code). The
  * hierarchical prefix property makes lexicographic cell order a
  * space-filling curve — sorting by cellId clusters sky-neighbors in the
  * same parquet row groups, which is what the reference gets from BigQuery
  * `CLUSTER BY geo_point` (P/bigquery/schema/dataset_builder.py:248-253,
  * chunk_promoter.py:297-298).
  */
object SpatialCellMath {
  /** Spread the low 32 bits of v into even bit positions. */
  def spread(v0: Long): Long = {
    var v = v0 & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  def cell(ra: Double, dec: Double, level: Int): Long = {
    val n = 1L << level
    val raNorm = ((ra % 360.0) + 360.0) % 360.0
    val x = math.min(n - 1, math.max(0L, math.floor(raNorm / 360.0 * n).toLong))
    val y = math.min(n - 1, math.max(0L, math.floor((dec + 90.0) / 180.0 * n).toLong))
    spread(x) | (spread(y) << 1)
  }

  /** All cell ids at `level` whose grid box intersects the
    * [raMin,raMax]×[decMin,decMax] bounding box (driver-side, for coarse
    * cone-search pruning; the per-row exact predicate does the rest).
    * Handles ra wrap-around.
    */
  def cellsForBox(raMin: Double, raMax: Double, decMin: Double,
      decMax: Double, level: Int): Seq[Long] = {
    val n = 1L << level
    def xOf(ra: Double) = math.min(n - 1,
      math.max(0L, math.floor((((ra % 360.0) + 360.0) % 360.0) / 360.0 * n).toLong))
    def yOf(dec: Double) = math.min(n - 1,
      math.max(0L, math.floor((dec + 90.0) / 180.0 * n).toLong))
    val xs: Seq[Long] =
      if (raMax - raMin >= 360.0) 0L until n
      else {
        val x0 = xOf(raMin); val x1 = xOf(raMax)
        if (x0 <= x1) x0 to x1 else (x0 until n) ++ (0L to x1)
      }
    val ys = yOf(math.max(-90.0, decMin)) to yOf(math.min(90.0, decMax))
    for (x <- xs; y <- ys) yield spread(x) | (spread(y) << 1)
  }
}

/** Codegen'd Catalyst expression for [[SpatialCellMath.cell]] — a scalar
  * (ra, dec) → cellId that stays inside whole-stage codegen (the generated
  * code is a single static call, no boxing, null-safe).
  */
case class SpatialCell(left: Expression, right: Expression, level: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "spatial_cell"

  override protected def nullSafeEval(ra: Any, dec: Any): Any =
    SpatialCellMath.cell(ra.asInstanceOf[Double], dec.asInstanceOf[Double], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ra, dec) =>
      s"graft.functions.SpatialCellMath.cell($ra, $dec, $level)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SpatialCell {
  val DefaultLevel = 12

  /** Column API: spatial_cell(ra, dec[, level]). */
  def spatialCell(ra: Column, dec: Column, level: Int = DefaultLevel): Column =
    ColumnBridge.column(
      SpatialCell(ColumnBridge.expression(ra),
        ColumnBridge.expression(dec), level))

  /** Exact angular-distance cone predicate (degrees), via the haversine
    * formula in plain column arithmetic (codegen'd built-ins only).
    */
  def withinCone(ra: Column, dec: Column, centerRa: Double,
      centerDec: Double, radiusDeg: Double): Column = {
    val d2r = math.Pi / 180.0
    val dLat = (dec - lit(centerDec)) * d2r / 2.0
    val dLon = (ra - lit(centerRa)) * d2r / 2.0
    val a = sin(dLat) * sin(dLat) +
      cos(dec * d2r) * lit(math.cos(centerDec * d2r)) * sin(dLon) * sin(dLon)
    asin(sqrt(a)) * 2.0 / d2r <= radiusDeg
  }

  /** Cone search with coarse cell pruning. The Morton code's hierarchical
    * prefix property means the level-L ancestor of a level-`level` cell is
    * just `cellId >> 2*(level-L)` — so the covering box is enumerated at a
    * coarse `pruneLevel` (bounded cell count regardless of radius) and
    * applied as a shifted IN-set that still skips row groups on
    * cell-sorted data. The exact haversine predicate filters survivors.
    */
  def coneSearch(df: org.apache.spark.sql.DataFrame, raCol: String,
      decCol: String, cellCol: String, centerRa: Double, centerDec: Double,
      radiusDeg: Double, level: Int = DefaultLevel, pruneLevel: Int = 6)
      : org.apache.spark.sql.DataFrame = {
    val pl = math.min(level, pruneLevel)
    val decPad = radiusDeg
    val raPad = radiusDeg / math.max(1e-9,
      math.cos(math.min(89.9, math.abs(centerDec) + radiusDeg) * math.Pi / 180.0))
    val cells = SpatialCellMath.cellsForBox(
      centerRa - raPad, centerRa + raPad,
      centerDec - decPad, centerDec + decPad, pl)
    df.where(shiftrightunsigned(col(cellCol), 2 * (level - pl))
        .isin(cells: _*))
      .where(withinCone(col(raCol), col(decCol), centerRa, centerDec, radiusDeg))
  }
}
