package graft

import org.apache.spark.sql.functions._

import graft.functions.BoundedCollect

/** Size-capped collect aggregate: exact counts beyond the cap, complete
  * sorted membership at-or-under it, correct partial-buffer merges.
  */
class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  test("exact df beyond cap; complete sorted ds at or under it") {
    // key 1: 3 members (under cap), key 2: 7 members (over cap of 5)
    val df = ((1 to 3).map(i => (1L, i.toLong)) ++
      (1 to 7).map(i => (2L, i.toLong))).toDF("k", "v")
      .repartition(8) // force partial buffers + merge across partitions
    val out = df.groupBy("k")
      .agg(BoundedCollect.boundedCollect(col("v"), 5).as("bc"))
      .select($"k", $"bc.df", $"bc.ds")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        r.getSeq[Long](2)))).toMap
    assert(out(1L)._1 == 3L, "exact count under cap")
    assert(out(1L)._2 == Seq(1L, 2L, 3L), "complete + sorted under cap")
    assert(out(2L)._1 == 7L, "count keeps going past the cap")
    assert(out(2L)._2.length == 5, "membership capped")
    assert(out(2L)._2.toSet.subsetOf((1L to 7L).toSet))
  }

  test("deterministic across shuffles when df <= cap") {
    val df = (1 to 1000).map(i => (i.toLong % 100L, i.toLong)).toDF("k", "v")
    def run() = df.repartition(16).groupBy("k")
      .agg(BoundedCollect.boundedCollect(col("v"), 20).as("bc"))
      .select($"k", $"bc.ds").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(run() == run())
  }
}
