package graft

import org.apache.spark.sql.functions._

import graft.catalog.VersionedCatalog
import graft.functions.ZOrder

/** Z-order layout: interleave correctness and the pruning property the
  * layout exists for — a 2-D box/stripe query overlaps strictly fewer
  * files than under a linear sort on the leading column.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton interleave matches the scalar reference") {
    val got = Seq((3L, 5L)).toDF("x", "y")
      .select(ZOrder.morton($"x", $"y")).head().getLong(0)
    assert(got == (graft.functions.SpatialCellMath.spread(3L)
      | (graft.functions.SpatialCellMath.spread(5L) << 1)))
  }

  test("z-order files prune a cross-dimension stripe; linear sort cannot") {
    val cat = new VersionedCatalog(tmpDir("zorder"))
    val grid = for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)
    cat.commit(Map("z.t" -> grid.toDF("x", "y")))

    // files whose min/max y-range intersects the stripe y ∈ [8, 15]
    def overlapping(): Long = {
      val byFile = cat.read(spark, "z.t")
        .groupBy(input_file_name().as("f"))
        .agg(min($"y").as("ylo"), max($"y").as("yhi"))
      byFile.where($"ylo" <= 15L && $"yhi" >= 8L).count()
    }

    cat.commit(Map("z.t" -> cat.read(spark, "z.t")
      .repartitionByRange(16, $"x").sortWithinPartitions("x")))
    val linear = overlapping()

    cat.zorderCompact(spark, "z.t", "x", "y", targetPartitions = 16)
    val zed = overlapping()

    // linear-by-x files each span ALL y: every file overlaps the stripe.
    // z-order tiles confine y, so most files miss it.
    assert(linear == 16L, s"linear layout should hit every file, got $linear")
    assert(zed < linear, s"z-order must prune: $zed vs $linear")
    assert(zed <= 8L, s"expected at most half the files, got $zed")
  }
}
