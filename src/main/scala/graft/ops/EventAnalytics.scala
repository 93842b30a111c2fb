package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log analytics operators: activity islands, conversion funnels,
  * cohort retention. These are the batch forms; all three are single- or
  * two-shuffle plans keyed on `user_id`, so at cluster scale they
  * repartition once by user and reuse that distribution for every
  * window/aggregate stage (no per-stage re-shuffle — the window specs and
  * group keys share the partitioning).
  */
object EventAnalytics {

  private val EpochDay0 = "1970-01-01"

  /** Gaps-and-islands: maximal runs of consecutive active days per user.
    *
    * Classic `day - row_number()` trick: within a user, consecutive days
    * share `epochDay - rn`, so one groupBy collapses each run. Two
    * shuffles (distinct, then window+group share the user partitioning).
    * Days are emitted as epoch-day integers to keep the gate type-stable.
    */
  def activityIslands(events: DataFrame): DataFrame = {
    val days = events
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit(EpochDay0)).as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(
        min(col("day")).cast("long").as("start_day"),
        max(col("day")).cast("long").as("end_day"),
        count(lit(1)).as("n_days"))
      .drop("grp")
  }

  /** Ordered conversion funnel over `stages` (e.g. view → click →
    * purchase): stage i+1 only counts if it happens strictly AFTER the
    * user's first stage-i event. One shuffle: every stage is a
    * `min(when(...))` window over the same user partitioning, and the
    * final distinct/aggregate collapses per-user constants.
    *
    * Returns one row: `users_<stage>` column per stage.
    */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(col("user_id"))
    val base = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    // chain: first_<s> = min(us where type=s and us > first_<prev>) over w
    val staged = stages.zipWithIndex.foldLeft(base) {
      case (df, (stage, i)) =>
        val after: Column =
          if (i == 0) lit(true)
          else col("us") > col(s"first_${stages(i - 1)}")
        df.withColumn(s"first_$stage",
          min(when(col("event_type") === stage && after, col("us"))).over(w))
    }
    val perUser = staged
      .select(col("user_id") +: stages.map(s => col(s"first_$s")): _*)
      .distinct()
    perUser.agg(
      count(when(col(s"first_${stages.head}").isNotNull, 1))
        .as(s"users_${stages.head}"),
      stages.tail.map(s =>
        count(when(col(s"first_$s").isNotNull, 1)).as(s"users_$s")): _*)
  }

  /** Conversion funnel with a completion horizon: a user reaches stage k
    * iff SOME strictly-ordered chain e_1 < … < e_k of the right types
    * completes within `horizonUs` of its own first event (the
    * conversion-window funnel — anchored at every stage-1 event, not just
    * the first).
    *
    * Exact without self-joins via the max-anchor recursion: let
    * a_1(t) = latest stage-1 time strictly before t, and
    * a_i(t) = max over stage-i events u < t of a_{i-1}(u) — the BEST
    * (latest) anchor whose chain reaches stage i before t. A chain to
    * stage k ending at event p exists within the horizon iff
    * a_{k-1}(p) ≥ p − horizon (the max anchor is optimal for the test).
    * Every a_i is one `max(when(...))` over the same user-partitioned
    * RANGE window (strictly-before = rangeBetween(…, -1), which matches
    * the oracle's `<` in value space even under timestamp ties), so the
    * whole funnel is ONE shuffle on user_id; the per-user flag collapse
    * and final count reuse that partitioning.
    *
    * Returns one row: `users_<stage>` column per stage (stage 1's
    * horizon is vacuous, so `users_<s1>` counts users with any s1 event;
    * reach is monotone — a stage-k chain's prefix is a stage-(k−1) chain
    * within the same span).
    */
  def funnelWindowed(events: DataFrame, stages: Seq[String],
      horizonUs: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val base = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    // a1 … a_{n-1} as successive window columns over the SAME window spec
    val anchored = stages.init.zipWithIndex.foldLeft(base) {
      case (df, (stage, i)) =>
        val carried: Column =
          if (i == 0) col("us") else col(s"a$i")
        df.withColumn(s"a${i + 1}",
          max(when(col("event_type") === stage, carried)).over(wPrev))
    }
    val reached = stages.zipWithIndex.foldLeft(anchored) {
      case (df, (stage, i)) =>
        val ok: Column =
          if (i == 0) col("event_type") === stage
          else col("event_type") === stage &&
            col(s"a$i") >= col("us") - horizonUs
        df.withColumn(s"r${i + 1}", ok)
    }
    val perUser = reached.groupBy(col("user_id"))
      .agg(max(when(col("r1"), 1)).as("f1"),
        stages.indices.tail.map(i =>
          max(when(col(s"r${i + 1}"), 1)).as(s"f${i + 1}")): _*)
    perUser.agg(
      count(when(col("f1") === 1, 1)).as(s"users_${stages.head}"),
      stages.zipWithIndex.tail.map { case (s, i) =>
        count(when(col(s"f${i + 1}") === 1, 1)).as(s"users_$s")
      }: _*)
  }

  /** Regular daily time-grid with forward-fill: one row per user per day
    * from their first to last active day, carrying the last observed
    * end-of-day value across gap days (LOCF) — the resampling step that
    * turns an irregular event log into a regular series for joins /
    * training windows. End-of-day value is deterministic (latest ts,
    * event_id tiebreak); the fill is `last(_, ignoreNulls)` over the
    * user-day ordering, so everything after the daily rollup shares one
    * user-keyed partitioning. Grid size is bounded by span × users, not
    * by event volume.
    */
  def forwardFillDaily(events: DataFrame): DataFrame = {
    val wDay = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts").desc, col("event_id").desc)
    // daily feeds BOTH the per-user grid bounds and the grid join, but
    // is deliberately NOT cached: the rollup is small and both consumers
    // are cheap re-derivations — the r17 persist measured 1.64×/1.58×
    // (normalized / 8-core) SLOWER at sf0.1, the cache write + IMR scan
    // costing more than the saved window pass
    val daily = events
      .select(col("user_id"), col("event_id"), col("ts"),
        datediff(to_date(col("ts")), lit(EpochDay0)).cast("long").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("rn", row_number().over(wDay)).where(col("rn") === 1)
      .select(col("user_id"), col("day"), col("cents"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("user_id"), explode(sequence(col("lo"), col("hi"))).as("day"))
    val wFill = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled_cents",
        last(col("cents"), ignoreNulls = true).over(wFill))
      .select(col("user_id"), col("day"), col("filled_cents"))
  }

  /** Linear-interpolation resample — the numeric twin of
    * [[forwardFillDaily]]: the same per-user daily grid, but gap days
    * take the straight line between their surrounding observations,
    * in EXACT integer arithmetic (interp = prev + (next − prev) ·
    * (day − prev_day) DIV (next_day − prev_day), floored — bit-stable
    * where a float slope is not). Observed days keep their value
    * exactly (the formula degenerates to prev there); the grid spans
    * lo..hi per user, so every gap day has both neighbors by
    * construction. Plan: both neighbor scans are windows over ONE
    * user-keyed partitioning — the asc-preceding and asc-following
    * frames share their Exchange.
    *
    * Domain bound: the slope step needs |Δcents| · gap-days < 2^52 for
    * the floor-of-double form to be the exact rational floor (beyond
    * that Spark's non-ANSI multiply would also wrap where the SQL
    * oracle errors). Cents from bounded metrics over day-scale gaps sit
    * ~10 orders of magnitude inside the bound.
    */
  def interpolateDaily(events: DataFrame): DataFrame = {
    val wDay = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts").desc, col("event_id").desc)
    // daily feeds BOTH the per-user grid bounds and the grid join, but
    // is deliberately NOT cached (see forwardFillDaily — the r17 persist
    // measured 1.50× normalized slower at sf0.1)
    val daily = events
      .select(col("user_id"), col("event_id"), col("ts"),
        datediff(to_date(col("ts")), lit(EpochDay0)).cast("long").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("rn", row_number().over(wDay)).where(col("rn") === 1)
      .select(col("user_id"), col("day"), col("cents"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("user_id"), explode(sequence(col("lo"), col("hi"))).as("day"))
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col("cents").isNotNull, col("day"))
    grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("pv", last(col("cents"), ignoreNulls = true).over(wPrev))
      .withColumn("pd", last(obsDay, ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("cents"), ignoreNulls = true).over(wNext))
      .withColumn("nd", first(obsDay, ignoreNulls = true).over(wNext))
      .select(col("user_id"), col("day"),
        // the slope step in floor-of-double form: the integer product
        // (≤ ~2^40 here) is double-exact, so floor(p / q) is the exact
        // rational floor in BOTH engines (same IEEE divide)
        when(col("nd") === col("pd"), col("pv"))
          .otherwise(col("pv") + floor(
            ((col("nv") - col("pv")) * (col("day") - col("pd")))
              .cast("double") / (col("nd") - col("pd")).cast("double")))
          .cast("long").as("interp_cents"))
  }

  /** Weekly cohort retention: cohort = the user's first active epoch-week;
    * one output row per (cohort_week, week_offset) with the distinct-user
    * count. The cohort side is one row per user — small relative to the
    * event log but O(|users|), so the join is left to the planner (AQE
    * broadcasts it while it fits and falls back to a user-keyed shuffle
    * join beyond that; a forced broadcast would hit the driver/8 GB
    * cliff at ~10^8 users).
    */
  def weeklyRetention(events: DataFrame): DataFrame = {
    val WeekUs = 604800000000L // 7 * 24 * 3600 * 1e6
    // FLOOR division in exact integer arithmetic: `DIV` truncates toward
    // zero while the DuckDB oracle's `//` floors, so pre-1970 timestamps
    // (negative micros) would land one week apart. Spark's `%` takes the
    // dividend's sign, so a negative non-exact quotient is corrected by
    // exactly one. (floor(x/W) via doubles would be inexact near 2^53.)
    val wk = expr(
      s"unix_micros(ts) DIV $WeekUs - " +
        s"CASE WHEN unix_micros(ts) % $WeekUs < 0 THEN 1 ELSE 0 END")
    val active = events.select(col("user_id"), wk.as("wk")).distinct()
    val cohort = active.groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort_wk"))
    active.join(cohort, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("users"))
  }
}
