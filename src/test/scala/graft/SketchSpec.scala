package graft

import org.apache.spark.sql.functions._

/** Error-bound specs for the built-in sketches the engine leans on at
  * 100 TB — approx_count_distinct (HyperLogLog++) and approx_percentile
  * — plus the exact/approx cross-checks that justify substituting them
  * for their exact forms when the exact plan can't scale (a global
  * count-distinct shuffles every key; a global exact percentile sorts).
  * No oracle gates: DuckDB's sketches are different implementations, so
  * parity is numeric-tolerance, not hash equality.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("HLL++ distinct count within configured rsd of exact") {
    val li = graft.Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct($"l_orderkey")).head().getLong(0)
    val approx = li
      .select(approx_count_distinct($"l_orderkey", rsd = 0.02))
      .head().getLong(0)
    val rel = math.abs(approx - exact).toDouble / exact
    assert(rel < 0.06, s"rsd=0.02 sketch off by $rel (exact=$exact approx=$approx)")
  }

  test("approx_percentile brackets the exact percentile") {
    val li = graft.Tables.lineitem(spark, sf)
    val exact = li.select(
      percentile($"l_extendedprice", lit(0.5))).head().getDouble(0)
    val approx = li.select(percentile_approx($"l_extendedprice", lit(0.5),
      lit(10000))).head().getDouble(0)
    // accuracy 10000 → rank error ≤ n/10000; price distribution is
    // smooth, so the value error stays well under 1%
    assert(math.abs(approx - exact) / exact < 0.01,
      s"median approx=$approx exact=$exact")
  }

  test("partial HLL sketches merge to the same estimate as one pass") {
    // the at-scale contract: per-partition sketches merged centrally
    // must equal the single-pass estimate (union-mergeability), which is
    // what lets count-distinct run without shuffling raw keys
    val li = graft.Tables.lineitem(spark, sf)
    val onePass = li
      .select(approx_count_distinct($"l_partkey", rsd = 0.02))
      .head().getLong(0)
    val merged = li
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", rsd = 0.02).as("d"))
      .agg(sum($"d")).head().getLong(0)
    // per-group sums OVERCOUNT the union (keys shared across groups)
    assert(merged >= onePass)
    // and the same sketch re-aggregated without regrouping is stable
    val again = li.repartition(7)
      .select(approx_count_distinct($"l_partkey", rsd = 0.02))
      .head().getLong(0)
    assert(again == onePass,
      "HLL estimate must not depend on partitioning (merge-invariant)")
  }
}
