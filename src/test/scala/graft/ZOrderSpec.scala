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

  test("mortonK agrees with the 2-D fast path and the scalar reference") {
    val rows = Seq((3L, 5L), (0L, 0L), (65535L, 1L), (1234L, 4321L))
    val got = rows.toDF("x", "y")
      .select(ZOrder.morton($"x", $"y").as("m2"),
        ZOrder.mortonK(Seq($"x", $"y"), 16).as("mk"))
      .as[(Long, Long)].collect()
    got.foreach { case (m2, mk) => assert(m2 == mk) }
    // 3-D: bit i of dim j lands at 3i + j — check against a direct fold
    val (x, y, z) = (5L, 3L, 6L)
    def ref(v: Long, j: Int): Long =
      (0 until 8).map(i => ((v >> i) & 1L) << (3 * i + j)).sum
    val g3 = Seq((x, y, z)).toDF("x", "y", "z")
      .select(ZOrder.mortonK(Seq($"x", $"y", $"z"), 8)).head().getLong(0)
    assert(g3 == (ref(x, 0) | ref(y, 1) | ref(z, 2)))
  }

  test("3-D z-order prunes stripes in EVERY dimension; linear sort " +
      "prunes only its leading column") {
    val cat = new VersionedCatalog(tmpDir("zorder3"))
    val grid = for { x <- 0 until 16; y <- 0 until 16; z <- 0 until 16 }
      yield (x.toLong, y.toLong, z.toLong)
    cat.commit(Map("z3.t" -> grid.toDF("x", "y", "z")))

    // files whose min/max range intersects a thin stripe in dimension c
    def overlapping(c: String): Long = {
      val byFile = cat.read(spark, "z3.t")
        .groupBy(input_file_name().as("f"))
        .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
      byFile.where($"lo" <= 3L && $"hi" >= 2L).count()
    }

    cat.commit(Map("z3.t" -> cat.read(spark, "z3.t")
      .repartitionByRange(16, $"x").sortWithinPartitions("x")))
    val linear = Seq("x", "y", "z").map(overlapping)
    // linear by x: selective on x, every file overlaps any y or z stripe
    assert(linear.head <= 4L, s"leading-column stripe, got ${linear.head}")
    assert(linear(1) == 16L && linear(2) == 16L,
      s"non-leading stripes hit every file, got $linear")

    cat.zorderCompactK(spark, "z3.t", Seq("x", "y", "z"),
      targetPartitions = 16, bits = 4)
    val zed = Seq("x", "y", "z").map(overlapping)
    // z-order tiles bound ALL three dimensions: each stripe skips most
    // files in whichever dimension it cuts
    zed.zipWithIndex.foreach { case (n, i) =>
      assert(n <= 8L, s"dim $i stripe should prune, got $n of 16 files")
    }
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
