package graft

import org.apache.spark.sql.functions._

import graft.ops.IncrementalAgg

/** mergeCounts == full recompute, including keys only in the delta and
  * keys untouched by it (the oracle gate q10 covers the sf0.01 corpus;
  * this pins the edge cases).
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  test("delta merge equals recompute; handles new and untouched keys") {
    val base = Seq(("a", 1L), ("a", 3L), ("b", 10L)).toDF("k", "v")
    val delta = Seq(("a", 5L), ("c", 7L)).toDF("k", "v") // c is new; b untouched
    val stored = base.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("sum_v"))
    val merged = IncrementalAgg
      .mergeCounts(stored, delta, Seq("k"), Seq("sum_v" -> "v"))
      .as[(String, Long, Long)].collect().toSet
    val full = base.union(delta).groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("sum_v"))
      .as[(String, Long, Long)].collect().toSet
    assert(merged == full)
    assert(merged == Set(("a", 3L, 9L), ("b", 1L, 10L), ("c", 1L, 7L)))
  }

  test("empty delta is the identity") {
    val base = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val stored = base.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("sum_v"))
    val merged = IncrementalAgg
      .mergeCounts(stored, base.where(lit(false)), Seq("k"),
        Seq("sum_v" -> "v"))
      .as[(String, Long, Long)].collect().toSet
    assert(merged == stored.as[(String, Long, Long)].collect().toSet)
  }
}
