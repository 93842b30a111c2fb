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
    assert(out(2L)._2 == Seq(1L, 2L, 3L, 4L, 5L),
      "min-k: the cap SMALLEST members, sorted — deterministic over cap")
  }

  test("over-cap sample is the k smallest regardless of partitioning") {
    // 200 members for one key, several partition layouts: ds must always
    // be exactly 1..8 — arrival order and partial-buffer merge order must
    // not leak into the sample (the canonical-star dedup contract)
    val vs = scala.util.Random.shuffle((1 to 200).toList)
    for (parts <- Seq(1, 4, 16)) {
      val df = vs.map(v => (1L, v.toLong)).toDF("k", "v").repartition(parts)
      val ds = df.groupBy("k")
        .agg(BoundedCollect.boundedCollect(col("v"), 8).as("bc"))
        .select($"bc.ds").head().getSeq[Long](0)
      assert(ds == (1L to 8L), s"parts=$parts got $ds")
    }
  }

  test("deterministic across shuffles when df <= cap") {
    val df = (1 to 1000).map(i => (i.toLong % 100L, i.toLong)).toDF("k", "v")
    def run() = df.repartition(16).groupBy("k")
      .agg(BoundedCollect.boundedCollect(col("v"), 20).as("bc"))
      .select($"k", $"bc.ds").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(run() == run())
  }

  test("keyed collect reproduces the rank window's first-n payloads, " +
      "positions and all, under any partitioning") {
    // the per-cell-trainer contract: bounded_collect_keyed(key, id, n)
    // == the ids of row_number() over (partition by g order by key, id)
    // <= n, in rank order — including duplicate keys (tie-break on id)
    val rnd = new scala.util.Random(11)
    val rows = (1L to 500L).map { id =>
      (id % 7L, rnd.nextInt(40).toLong, id) // many key ties per group
    }
    val df = rows.toDF("g", "key", "id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"key", $"id")
    val want = df.withColumn("rn", row_number().over(w))
      .where($"rn" <= 9).orderBy($"g", $"rn")
      .select($"g", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    for (parts <- Seq(1, 5, 32)) {
      val got = df.repartition(parts).groupBy($"g")
        .agg(BoundedCollect.boundedCollectKeyed($"key", $"id", 9).as("ids"))
        .select($"g", $"ids").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(got == want, s"parts=$parts")
    }
    // groups smaller than the cap come back complete, still key-ordered
    val small = Seq((1L, 5L, 10L), (1L, 2L, 11L), (2L, 9L, 12L))
      .toDF("g", "key", "id").repartition(3)
      .groupBy($"g")
      .agg(BoundedCollect.boundedCollectKeyed($"key", $"id", 9).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(small == Map(1L -> Seq(11L, 10L), 2L -> Seq(12L)))
  }
}
