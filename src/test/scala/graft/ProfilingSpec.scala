package graft

import graft.ops.Profiling

/** The approx profiling twin's contract against the exact q11 form: same
  * output shape, exact columns identical, HLL++ distinct counts within
  * rsd bounds, and the plan actually cheaper (no Expand).
  */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"
  private val cols = Seq(("l_quantity", 100), ("l_extendedprice", 100),
    ("l_discount", 10000))

  test("approx profile matches exact within rsd on all three columns") {
    val li = graft.Tables.lineitem(spark, sf)
    val rsd = 0.02
    def byCol(df: org.apache.spark.sql.DataFrame) = df
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val exact = byCol(Profiling.profile(li, cols))
    val approx = byCol(Profiling.profile(li, cols, approx = true, rsd = rsd))
    assert(exact.keySet == cols.map(_._1).toSet && approx.keySet == exact.keySet)
    cols.map(_._1).foreach { c =>
      val (_, en, end, elo, ehi) = exact(c)
      val (_, an, and, alo, ahi) = approx(c)
      // everything except the distinct count stays exact
      assert((an, alo, ahi) == ((en, elo, ehi)), s"non-sketch fields for $c")
      // HLL++ error contract: configured rsd is the standard error;
      // 3x rsd is the conventional acceptance envelope
      val rel = math.abs(and - end).toDouble / end
      assert(rel <= 3 * rsd,
        s"$c: approx nd=$and exact nd=$end rel=$rel > ${3 * rsd}")
    }
  }

  test("approx profile plans one pass — no Expand, sketch-only shuffle") {
    val li = graft.Tables.lineitem(spark, sf)
    val exactPlan = Profiling.profile(li, cols)
      .queryExecution.executedPlan.toString
    val approxPlan = Profiling.profile(li, cols, approx = true)
      .queryExecution.executedPlan.toString
    // the exact multi-count-distinct form pays an Expand (input rows
    // duplicated per profiled column); the sketch form must not
    assert(exactPlan.contains("Expand"), "exact form uses Expand")
    assert(!approxPlan.contains("Expand"),
      s"approx plan should not Expand:\n$approxPlan")
  }

  test("driftReport: vanished and new groups survive the full-outer " +
      "join with 0-counts; overlap is exact in the small regime") {
    import spark.implicits._
    val a = Seq(("x", 10L, 1L), ("x", 20L, 2L), ("x", 30L, 3L),
      ("gone", 5L, 9L)).toDF("g", "v", "uid")
    val b = Seq(("x", 15L, 2L), ("x", 25L, 3L), ("x", 35L, 4L),
      ("new", 7L, 9L)).toDF("g", "v", "uid")
    val rep = graft.ops.Profiling.driftReport(a, b, "g", "v", "uid", k = 64)
      .collect().map(r => r.getString(0) -> r).toMap
    val x = rep("x")
    assert(x.getLong(1) == 3L && x.getLong(2) == 3L) // n_a, n_b
    assert(x.getLong(3) == 20L && x.getLong(4) == 25L) // medians
    assert(x.getLong(5) == 3L && x.getLong(6) == 3L) // distinct uids
    assert(x.getLong(7) == 2L, "uid overlap {2,3}") // nd_overlap
    val gone = rep("gone")
    assert(gone.getLong(1) == 1L && gone.getLong(2) == 0L &&
      gone.isNullAt(4) && gone.getLong(7) == 0L,
      "a group missing on one side reports 0/null for that side")
    val fresh = rep("new")
    assert(fresh.getLong(1) == 0L && fresh.getLong(2) == 1L &&
      fresh.isNullAt(3) && fresh.getLong(7) == 0L)
  }
}
