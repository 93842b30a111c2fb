package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Whole-table column profiling: ONE scan computes per-column
  * (n, n_distinct, lo, hi) for several columns at once, unpivoted to a
  * row per column — the data-quality sweep run once per snapshot instead
  * of one scan per column.
  *
  * Two distinct-count regimes behind the same output shape:
  *  - exact (`approx = false`): `count_distinct`, which Catalyst plans as
  *    a multi-column Expand (one duplicated input stream per distinct
  *    aggregate) — the oracle-gated form (q11);
  *  - approx (`approx = true`): `approx_count_distinct` (HyperLogLog++)
  *    at `rsd` — NO Expand, plain one-pass partial aggregation with
  *    O(1/rsd²)-byte sketches on the wire. This is the 100 TB default:
  *    the exact form's Expand multiplies the scanned rows by the number
  *    of profiled columns, the sketch form scans once regardless.
  *
  * Values are profiled in scaled-integer space (`round(col * scale)`),
  * matching the gate's fixed-point convention.
  */
object Profiling {

  /** Distribution profile: per-column quantiles from ONE scan, one KLL
    * sketch per column ([[graft.functions.Kll]]) — the shape answer to
    * "what does every numeric column look like" at 100 TB: no Expand, no
    * per-column sort, one pass, O(k log n) bytes per (column, partial)
    * on the wire, and each column row carries the sketch's rank-error
    * certificate (0 ⇔ its quantiles are quantile_disc-exact, which for
    * fixed-domain columns — quantities, discounts, taxes — holds at any
    * scale; the q13 gate pins that regime).
    */
  def profileQuantiles(df: DataFrame, cols: Seq[(String, Int)],
      probs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
      k: Int = 4096): DataFrame = {
    val aggs = cols.flatMap { case (c, scale) =>
      val cents = round(col(c) * scale).cast("long")
      Seq(count(col(c)).as(s"n|$c"),
        graft.functions.Kll.kllQuantiles(cents, k, probs).as(s"s|$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide
      .select(explode(array(cols.map { case (c, _) =>
        val s = col(s"s|$c")
        struct(Seq(lit(c).as("col_name"), col(s"n|$c").as("n")) ++
          probs.indices.map(i =>
            s.getField("qs").getItem(i).as(s"q${i + 1}")) :+
          s.getField("err").as("err"): _*)
      }: _*)).as("p"))
      .select(col("p.*"))
  }

  /** Snapshot-drift report (q16) — the data-validation pass between two
    * corpus snapshots ("did the new crawl shift the distribution?"),
    * composed entirely from the mergeable-sketch family so each side
    * costs one scan and only sketches shuffle: per group, row counts,
    * median (KLL — exact with certificate err = 0 while per-group
    * distinct ≤ k), distinct entities (KMV — exact below k), and the
    * DISTINCT-ENTITY OVERLAP between the sides (KMV intersection — the
    * question a recompute can't answer from two separate profiles
    * without rescanning both corpora; here it is a scalar probe over
    * the two stored sketches). Full-outer on the group key: a group
    * present on one side only reports 0s/nulls for the other — exactly
    * the "vanished/new group" drift signal.
    */
  def driftReport(a: DataFrame, b: DataFrame, groupCol: String,
      valCol: String, idCol: String, k: Int = 4096): DataFrame = {
    def side(df: DataFrame, tag: String): DataFrame =
      df.groupBy(col(groupCol)).agg(
        count(lit(1)).as(s"n_$tag"),
        graft.functions.Kll
          .kllQuantiles(col(valCol), k, Seq(0.5)).as(s"s_$tag"),
        graft.functions.Kmv.kmvSketch(col(idCol), k).as(s"sk_$tag"))
    side(a, "a").join(side(b, "b"), Seq(groupCol), "full_outer")
      .select(col(groupCol),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        col("s_a.qs").getItem(0).as("p50_a"),
        col("s_b.qs").getItem(0).as("p50_b"),
        graft.functions.Kmv.kmvEst(col("sk_a")).as("nd_a"),
        graft.functions.Kmv.kmvEst(col("sk_b")).as("nd_b"),
        coalesce(
          graft.functions.Kmv.kmvIntersect(col("sk_a"), col("sk_b")),
          lit(0L)).as("nd_overlap"))
  }

  /** Tukey-fence outlier detection per group — the standard numeric
    * data-cleaning pass ("drop rows outside [q1 − 1.5·IQR, q3 + 1.5·IQR]
    * of their own group"), sketch-shaped: per-group q1/q3 come from ONE
    * KLL sketch aggregation (sketches shuffle, rows don't), the
    * group→fence table broadcasts back, and the flag test is map-side —
    * the same zero-row-shuffle posture as the calibrated-quality twin,
    * vs the naive percentile-window form that sorts every row twice.
    * The 1.5×IQR fences are kept ALL-INTEGER by testing 2·v against
    * 2·q1 − 3·(q3 − q1): no halves, no floats, bit-identical in any
    * engine. Returns the outlier rows with their group's fences and the
    * sketch certificate.
    */
  /** Per-group Tukey fences (q1, q3, certificate) from one sketch agg. */
  private def iqrFences(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(graft.functions.Kll
        .kllQuantiles(col(valueCol), k, Seq(0.25, 0.75)).as("s"))
      .select(col(groupCol), col("s.qs").getItem(0).as("q1"),
        col("s.qs").getItem(1).as("q3"), col("s.err").as("err"))

  /** rows of `df` outside their group's [q1 − 1.5·IQR, q3 + 1.5·IQR] */
  private def outsideFences(df: DataFrame, fences: DataFrame,
      groupCol: String, valueCol: String): DataFrame = {
    val iqr3 = (col("q3") - col("q1")) * 3L
    df.join(broadcast(fences), Seq(groupCol))
      .where(col(valueCol) * 2L < col("q1") * 2L - iqr3 ||
        col(valueCol) * 2L > col("q3") * 2L + iqr3)
  }

  def iqrOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 4096): DataFrame =
    outsideFences(df, iqrFences(df, groupCol, valueCol, k), groupCol,
      valueCol)

  /** Streaming anomaly flagging — the production form of
    * [[iqrOutliers]]: fences are computed ONCE from a static
    * `calibration` frame (yesterday's data, the stats summary table, a
    * reviewed baseline) and FROZEN; arriving rows are flagged by a
    * stateless stream-static broadcast join — append-legal, zero state,
    * and the alert rule can't drift mid-stream, so a batch replay over
    * the same calibration flags the identical set
    * (StreamingSpec parity). Re-calibration is a new query over new
    * fences, not mutable state.
    */
  def iqrOutliersStream(stream: DataFrame, calibration: DataFrame,
      groupCol: String, valueCol: String, k: Int = 4096): DataFrame = {
    val spark = calibration.sparkSession
    // materialize the (few-row, one per group) fence table to a LOCAL
    // relation once: genuinely frozen — the calibration aggregation does
    // NOT re-run per micro-batch, and the literal fences ship with the
    // broadcast. Driver-side collect is bookkeeping-scale (#groups rows).
    val computed = iqrFences(calibration, groupCol, valueCol, k)
    val frozen = spark.createDataFrame(
      java.util.Arrays.asList(computed.collect(): _*), computed.schema)
    outsideFences(stream, frozen, groupCol, valueCol)
  }

  def profile(df: DataFrame, cols: Seq[(String, Int)],
      approx: Boolean = false, rsd: Double = 0.05): DataFrame = {
    val aggs = cols.flatMap { case (c, scale) =>
      val cents = round(col(c) * scale).cast("long")
      val nd: Column =
        if (approx) approx_count_distinct(cents, rsd)
        else count_distinct(cents)
      Seq(count(col(c)).as(s"n|$c"), nd.as(s"nd|$c"),
        min(cents).as(s"lo|$c"), max(cents).as(s"hi|$c"))
    }
    // spread before the partial aggregate: the exact form's Expand
    // multiplies every input row by the profiled-column count, so a
    // 1-split input runs that fan-out single-task; the spread shuffles
    // only the projected profile columns and is a no-op at scale
    val wide = Dedup.spread(df.select(cols.map(c => col(c._1)): _*))
      .agg(aggs.head, aggs.tail: _*)
    // unpivot via explode over Column objects (never string-interpolated
    // SQL, so arbitrary column names — quotes, backticks, commas — are
    // safe); same generator shape as stack()
    wide
      .select(explode(array(cols.map { case (c, _) =>
        struct(lit(c).as("col_name"), col(s"n|$c").as("n"),
          col(s"nd|$c").as("n_distinct"), col(s"lo|$c").as("lo_scaled"),
          col(s"hi|$c").as("hi_scaled"))
      }: _*)).as("p"))
      .select(col("p.col_name"), col("p.n"), col("p.n_distinct"),
        col("p.lo_scaled"), col("p.hi_scaled"))
  }
}
