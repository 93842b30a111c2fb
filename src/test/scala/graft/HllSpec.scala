package graft

import org.apache.spark.sql.functions._

import graft.functions.Hll.{hllMerge, hllSketch}

/** Storable HLL — the distinct-count member of the summary-table
  * family: register-max merge is lossless and idempotent, so stored
  * per-day partials answer any slice, overlaps can't double-count, and
  * the merged registers equal a direct build bit for bit.
  */
class HllSpec extends SparkSpec {
  import spark.implicits._

  test("merged stored partials == direct registers bit-for-bit; " +
      "estimate within the 1.04/sqrt(m) envelope") {
    val rnd = new scala.util.Random(37)
    // ~62k distinct keys spread over 7 'days' with heavy repetition
    val rows = Seq.tabulate(200000)(i =>
      ((i % 7), rnd.nextInt(80000).toLong * 2654435761L))
    val store = tmpDir("hll-table")
    rows.toDF("day", "v").repartition(9)
      .groupBy($"day").agg(hllSketch($"v", 12).as("regs"))
      .write.mode("overwrite").parquet(store)
    val merged = spark.read.parquet(store)
      .agg(hllMerge($"regs", 12).as("s"))
      .select($"s.n_distinct", $"s.regs")
      .as[(Long, Array[Byte])].head()
    val direct = rows.toDF("day", "v").repartition(4)
      .agg(hllSketch($"v", 12)).head().getAs[Array[Byte]](0)
    assert(merged._2.sameElements(direct),
      "register-max merge lost information vs the direct build")
    val exact = rows.map(_._2).distinct.size.toLong
    val rse = 1.04 / math.sqrt(4096.0)
    val err = math.abs(merged._1 - exact).toDouble / exact
    assert(err < 5 * rse, f"estimate ${merged._1} vs exact $exact " +
      f"(${err * 100}%.2f%% > ${5 * rse * 100}%.2f%%)")
  }

  test("idempotent overlap: re-merging the same slice twice cannot " +
      "double-count; slice estimates track slice cardinality") {
    val rows = Seq.tabulate(30000)(i => ((i % 3), (i % 9000).toLong * 31L))
    val parts = rows.toDF("day", "v").repartition(5)
      .groupBy($"day").agg(hllSketch($"v", 12).as("regs")).cache()
    val once = parts.agg(hllMerge($"regs", 12).as("s"))
      .select($"s.n_distinct").as[Long].head()
    val twice = parts.unionByName(parts)
      .agg(hllMerge($"regs", 12).as("s"))
      .select($"s.n_distinct").as[Long].head()
    assert(once == twice, "idempotence: duplicate partials changed the count")
    val slice = parts.where($"day" === 0)
      .agg(hllMerge($"regs", 12).as("s"))
      .select($"s.n_distinct").as[Long].head()
    val sliceExact = rows.filter(_._1 == 0).map(_._2).distinct.size.toLong
    assert(math.abs(slice - sliceExact).toDouble / sliceExact < 0.1,
      s"slice estimate $slice vs exact $sliceExact")
    parts.unpersist()
    ()
  }

  test("re-storable rollup: day regs merged to month regs, month regs " +
      "merged to the total — equals merging the days directly") {
    val rows = Seq.tabulate(40000)(i => (i % 12, (i % 11000).toLong + 7L))
    val days = rows.toDF("day", "v")
      .groupBy($"day").agg(hllSketch($"v", 10).as("regs"))
    // coarsen: 12 days → 3 'months' of 4, RE-STORING merged registers
    val months = days.withColumn("month", $"day" % 3)
      .groupBy($"month").agg(hllMerge($"regs", 10).as("s"))
      .select($"month", $"s.regs".as("regs"))
    val viaMonths = months.agg(hllMerge($"regs", 10).as("s"))
      .select($"s.regs").as[Array[Byte]].head()
    val viaDays = days.agg(hllMerge($"regs", 10).as("s"))
      .select($"s.regs").as[Array[Byte]].head()
    assert(viaMonths.sameElements(viaDays),
      "two-level rollup diverged from flat merge")
  }

  test("small-range correction: exact-ish at tiny cardinalities") {
    val got = (1L to 50L).toDF("v").agg(hllSketch($"v", 12).as("r"))
      .agg(hllMerge($"r", 12).as("s")).select($"s.n_distinct")
      .as[Long].head()
    assert(math.abs(got - 50L) <= 2L, s"linear counting regime: got $got")
  }
}
