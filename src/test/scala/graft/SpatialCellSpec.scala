package graft

import org.apache.spark.sql.functions._

import graft.functions.{SpatialCell, SpatialCellMath}

class SpatialCellSpec extends SparkSpec {
  import spark.implicits._

  test("cell math: Morton interleave and bounds") {
    assert(SpatialCellMath.spread(0L) == 0L)
    assert(SpatialCellMath.spread(3L) == 5L) // 0b11 -> 0b101
    val c = SpatialCellMath.cell(0.0, -90.0, 12)
    assert(c == 0L)
    // wrap-around ra
    assert(SpatialCellMath.cell(360.0, 0.0, 12) ==
      SpatialCellMath.cell(0.0, 0.0, 12))
    assert(SpatialCellMath.cell(-10.0, 0.0, 12) ==
      SpatialCellMath.cell(350.0, 0.0, 12))
    // neighbors in ra share high bits more often than distant points
    val n = 1L << 12
    assert(SpatialCellMath.cell(0.0, 90.0, 12) ==
      SpatialCellMath.spread(n - 1) << 1)
  }

  test("expression evaluates and codegens the same as the Scala math") {
    // range-backed input so the plan actually goes through WholeStageCodegen
    // (a LocalTableScan would constant-fold the expression away)
    val df = spark.range(400)
      .select(($"id" % 40 * 9.37).as("ra"), ($"id" % 19 * 9.4 - 90.0).as("dec"))
    val got = df.select($"ra", $"dec",
        SpatialCell.spatialCell($"ra", $"dec", 12).as("cell"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) ==
        SpatialCellMath.cell(r.getDouble(0), r.getDouble(1), 12))
    }
    // the "*(n)" prefix marks operators fused into WholeStageCodegen; the
    // projection containing spatial_cell must carry it (no codegen fallback)
    val plan = df.select(SpatialCell.spatialCell($"ra", $"dec", 12))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("spatial_cell") && l.trim.startsWith("*(")), plan)
  }

  test("cone search with cell pruning matches brute-force haversine") {
    val r = new scala.util.Random(7)
    val pts = (0 until 2000).map { i =>
      (i.toLong, r.nextDouble() * 360.0, r.nextDouble() * 180.0 - 90.0)
    }
    val df = pts.toDF("id", "ra", "dec")
      .withColumn("cellId", SpatialCell.spatialCell($"ra", $"dec", 8))
    val exact = df
      .where(SpatialCell.withinCone($"ra", $"dec", 180.0, 10.0, 5.0))
      .select("id").collect().map(_.getLong(0)).toSet
    val pruned = SpatialCell
      .coneSearch(df, "ra", "dec", "cellId", 180.0, 10.0, 5.0, level = 8)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(pruned == exact)
    assert(exact.nonEmpty)
  }
}
