package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions integration: functions injected at build time
  * and the binned-range-join optimizer rule — the theta-join a user
  * writes naively must silently become the banded equi-join
  * [[graft.ops.RangeJoin]] spells out by hand, with identical results.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  /** A separate session built WITH the extensions (shares the JVM's
    * SparkContext with SparkSpec's shared session; extension hooks are
    * per-session, so neither leaks into the other).
    */
  private lazy val ext: SparkSession = {
    SparkSpec.session // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.setDefaultSession(SparkSpec.session)
    SparkSession.setActiveSession(SparkSpec.session)
    s
  }

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  private def fixtures(s: SparkSession): (DataFrame, DataFrame) = {
    import s.implicits._
    // intervals of width ~50 around multiples of 100; points everywhere —
    // negatives included to pin the trunc-div monotonicity argument
    val points = (-500L to 500L by 7L).map(t => (t, s"p$t")).toDF("t", "pname")
    val intervals = (-5L to 5L).map { i =>
      (i * 100L - 25L, i * 100L + 25L, s"i$i")
    }.toDF("lo", "hi", "iname")
    (points, intervals)
  }

  test("functions are session-permanent under extensions and absent " +
      "from the plain shared session") {
    val h = ext.sql("SELECT char_hash('ab') AS h").head().getLong(0)
    // (('a'*31 + 'b') mod p) — same arithmetic the oracle replays
    assert(h == 97L * 31L + 98L)
    assert(ext.sql("SELECT vec_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d")
      .head().getDouble(0) == 11.0)
    // a FRESH plain session (newSession: same context, empty temp-function
    // registry — immune to suites that registered temp functions on the
    // shared one) must not know the function
    val err = intercept[Exception](
      SparkSpec.session.newSession().sql("SELECT char_hash('ab')").collect())
    assert(err.getMessage.contains("char_hash"),
      s"fresh plain session unexpectedly resolves char_hash: $err")
  }

  test("theta range join rewrites to a binned equi-join when the conf " +
      "is set: no nested loop, results identical to the naive plan") {
    val (points, intervals) = fixtures(ext)
    val cond = points("t") >= intervals("lo") &&
      points("t") <= intervals("hi")
    // without the conf: nested loop (the shape the rule exists to kill)
    ext.conf.unset("spark.graft.rangejoin.binwidth")
    val naive = points.join(intervals, cond)
    assert(plan(naive).contains("BroadcastNestedLoopJoin"))
    val expected = naive.collect().map(_.toSeq).toSet

    ext.conf.set("spark.graft.rangejoin.binwidth", "64")
    val rewritten = points.join(intervals, cond)
    val p = plan(rewritten)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.linesIterator.take(30).mkString("\n"))
    assert(p.contains("graft_bin"), "rewrite did not fire")
    assert(rewritten.collect().map(_.toSeq).toSet == expected)
    assert(rewritten.columns.toSeq == naive.columns.toSeq,
      "rewrite changed the output schema")
    ext.conf.unset("spark.graft.rangejoin.binwidth")
  }

  test("rule leaves equi-joins and one-sided ranges alone") {
    val (points, intervals) = fixtures(ext)
    ext.conf.set("spark.graft.rangejoin.binwidth", "64")
    try {
      // an equi conjunct → planner already hashes; no bin column
      val equi = points.join(intervals,
        points("t") === intervals("lo") && points("t") <= intervals("hi"))
      assert(!plan(equi).contains("graft_bin"))
      // one-sided range (no sandwich) → untouched
      val oneSided = points.join(intervals, points("t") >= intervals("lo"))
      assert(!plan(oneSided).contains("graft_bin"))
    } finally ext.conf.unset("spark.graft.rangejoin.binwidth")
  }

  test("rewrite matches the hand-binned RangeJoin operator row for row " +
      "(strict bounds kept as residual)") {
    val (points, intervals) = fixtures(ext)
    ext.conf.set("spark.graft.rangejoin.binwidth", "50")
    try {
      import org.apache.spark.sql.functions.col
      val strict = points.join(intervals,
        points("t") > intervals("lo") && points("t") < intervals("hi"))
      val viaRule = strict.collect()
        .map(r => (r.getAs[Long]("t"), r.getAs[String]("iname"))).toSet
      val manual = graft.ops.RangeJoin.pointInInterval(
          points, intervals, "t", "lo", "hi", binWidth = 50L)
        .where(col("t") > col("lo") && col("t") < col("hi"))
        .collect()
        .map(r => (r.getAs[Long]("t"), r.getAs[String]("iname"))).toSet
      assert(viaRule == manual && viaRule.nonEmpty)
    } finally ext.conf.unset("spark.graft.rangejoin.binwidth")
  }
}
