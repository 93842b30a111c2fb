package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Relational operator coverage for SURVEY.md §2 (scans S1-S2, predicates
  * P1-P9, joins J3/J7/J8, aggregates A1-A7, windows W1-W3, sorts §2.6, set
  * ops §2.7), expressed over the driver test corpus.
  *
  * Contract: every query has a DuckDB oracle in [[oracles]] with IDENTICAL
  * output column names and value arithmetic (exact-representable results:
  * integer-valued doubles, bigint cents, epoch micros — never
  * order-dependent float accumulation).
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // S1: chunk-table scan + range filter + projection + sort
    // (ref: P/sql/_ppdb_sql.py:97-125 — SELECT 4 cols WHERE id >= x ORDER BY t)
    "s1_chunk_scan" -> ((s, d) => {
      import s.implicits._
      events(s, d)
        .where($"event_id" >= 500L)
        .select($"event_id", $"user_id", $"event_type",
          unix_micros($"ts").as("ts_us"))
        .orderBy($"ts_us", $"event_id")
    }),

    // S2: compositional AND-ed predicates + configurable order
    // (ref: P/bigquery/ppdb_bigquery.py:501-544)
    "s2_pred_compose" -> ((s, d) => {
      import s.implicits._
      val preds = Seq($"o_orderstatus" === "O", $"o_totalprice" > 50000.0)
      preds.foldLeft(orders(s, d))(_ filter _)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_orderkey")
    }),

    // P2: SELECT * EXCEPT(cols) — projection by dropping
    // (ref: P/bigquery/chunk_promoter.py:299)
    "p2_select_except" -> ((s, d) => {
      import s.implicits._
      lineitem(s, d)
        .drop("l_shipdate", "l_tax", "l_extendedprice", "l_discount")
        .where($"l_orderkey" < 100L)
    }),

    // P6/P7: IN-list and NOT-IN set predicates
    // (ref: P/sql/_ppdb_sql.py:205; P/bigquery/ppdb_bigquery.py:564-568)
    "p7_in_list" -> ((s, d) => {
      import s.implicits._
      orders(s, d)
        .where($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
        .select($"o_orderkey", $"o_orderpriority")
    }),
    "p6_not_in" -> ((s, d) => {
      import s.implicits._
      orders(s, d)
        .where(!$"o_orderstatus".isin("F", "P"))
        .select($"o_orderkey", $"o_orderstatus")
    }),

    // P9: existence probe (SELECT 1 WHERE pk = x LIMIT 1)
    // (ref: P/sql/_ppdb_sql.py:143-149)
    "p9_exists_probe" -> ((s, d) => {
      import s.implicits._
      lineitem(s, d).where($"l_orderkey" === 1L).limit(1)
        .select(lit(1).as("one"))
    }),

    // J3: semi-join restriction (customers that have orders)
    // (ref: fill_diaobject_validity_end.sql:25-30)
    "j3_semi_join" -> ((s, d) => {
      import s.implicits._
      customer(s, d)
        .join(orders(s, d).select($"o_custkey"), $"c_custkey" === $"o_custkey",
          "left_semi")
        .select($"c_custkey", $"c_name")
    }),

    // J6/J7: anti-join (replication frontier: ids not yet copied)
    // (ref: P/replicator.py:106-110)
    "j7_frontier_anti" -> ((s, d) => {
      import s.implicits._
      part(s, d)
        .join(lineitem(s, d).select($"l_partkey"),
          $"p_partkey" === $"l_partkey", "left_anti")
        .select($"p_partkey", $"p_name")
    }),

    // J8: consistency equi-join + mismatch filter
    // (ref: P/replicator.py:230-240)
    "j8_consistency_join" -> ((s, d) => {
      import s.implicits._
      orders(s, d).join(customer(s, d), $"o_custkey" === $"c_custkey")
        .where($"c_acctbal" < 0.0)
        .select($"o_orderkey", $"c_custkey", $"c_acctbal")
    }),

    // P8 + outer join: open-interval style IS NULL probe
    // (customers with no orders via left join null test)
    "p8_null_probe" -> ((s, d) => {
      import s.implicits._
      customer(s, d)
        .join(orders(s, d).select($"o_custkey").distinct(),
          $"c_custkey" === $"o_custkey", "left_outer")
        .where($"o_custkey".isNull)
        .select($"c_custkey", $"c_name")
    }),

    // A1-lite + A7: multi-aggregate with exact arithmetic (bigint cents)
    "q1_agg" -> ((s, d) => {
      import s.implicits._
      lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          sum(round($"l_extendedprice" * 100).cast("long"))
            .as("sum_price_cents"),
          count(lit(1)).as("n"))
    }),

    // A2/A3: distinct projection
    "a2_distinct" -> ((s, d) => {
      import s.implicits._
      orders(s, d).select($"o_orderpriority").distinct()
    }),

    // A4/A5: global min / sum aggregates (frontier min, update-count sum)
    // (ref: P/replicator.py:214; updates_manager.py:130)
    "a4_min_sum" -> ((s, d) => {
      import s.implicits._
      events(s, d).agg(
        min($"event_id").as("min_id"),
        max($"event_id").as("max_id"),
        sum(round($"value" * 100).cast("long")).as("sum_value_cents"),
        count(lit(1)).as("n"))
    }),

    // Joined agg: per-nation order revenue through customer dim
    // (broadcast the small dims — nation/region are tiny at any SF)
    "q3_join_agg" -> ((s, d) => {
      import s.implicits._
      orders(s, d)
        .join(customer(s, d), $"o_custkey" === $"c_custkey")
        .join(broadcast(nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(
          sum(round($"o_totalprice" * 100).cast("long")).as("rev_cents"),
          count(lit(1)).as("n_orders"))
    }),

    // data profiling: per-group column stats incl. EXACT percentiles
    // (the corpus-characterization report a pipeline runs before
    // training). percentile() is the exact linear-interpolation form —
    // identical arithmetic to DuckDB's quantile_cont — not the approx
    // sketch, so the oracle can bit-match; at 100 TB swap in
    // approx_percentile and drop the oracle to rows-only.
    "q4_profile" -> ((s, d) => {
      import s.implicits._
      lineitem(s, d).groupBy($"l_returnflag").agg(
        count(lit(1)).as("n"),
        count(when($"l_quantity".isNull, 1)).as("n_null_qty"),
        min($"l_quantity").as("min_qty"),
        max($"l_quantity").as("max_qty"),
        percentile($"l_quantity", lit(0.5)).as("p50_qty"),
        percentile($"l_quantity", lit(0.95)).as("p95_qty"),
        sum(round($"l_extendedprice" * 100).cast("long")).as("sum_price_cents"))
    }),

    // W1: rank() over partition (ref: P/sql/_ppdb_sql.py:211-216)
    "w1_rank" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      events(s, d)
        .withColumn("rnk", rank().over(w))
        .select($"event_id", $"user_id", $"rnk")
    }),

    // rollup subtotals: per (returnflag, linestatus), per returnflag, and
    // grand total in one pass — Spark expands grouping sets before the
    // partial aggregate, so subtotals cost one shuffle, not three scans
    "q5_rollup" -> ((s, d) => {
      import s.implicits._
      lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(round($"l_extendedprice" * 100).cast("long"))
            .as("sum_price_cents"))
    }),

    // q7: CUBE subtotals — all four grouping sets (both dims, each dim,
    // grand total) in ONE pass: Spark expands grouping sets before the
    // partial aggregate, same single-shuffle shape as q5's rollup
    "q7_cube" -> ((s, d) => {
      import s.implicits._
      lineitem(s, d)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(round($"l_extendedprice" * 100).cast("long"))
            .as("sum_price_cents"))
    }),

    // q17: arbitrary GROUPING SETS — the subtotal shapes ROLLUP/CUBE
    // can't express (each dim alone, neither the pair nor the grand
    // total); same single-shuffle Expand-before-partial-agg plan as q5
    "q17_grouping_sets" -> ((s, d) => {
      import s.implicits._
      lineitem(s, d)
        .groupingSets(Seq(Seq($"l_returnflag"), Seq($"l_linestatus")),
          $"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(round($"l_extendedprice" * 100).cast("long"))
            .as("sum_price_cents"))
    }),

    // q18: data-quality expectations — all row rules + the key-
    // uniqueness rule in ONE scan (each rule a conditional count in
    // the same aggregate), referential integrity as a left-anti probe;
    // the publish-gate validation pass generalizing promote's J6 abort
    "q18_expectations" -> ((s, d) => {
      import s.implicits._
      val li = lineitem(s, d)
      graft.ops.Expectations.check(li,
        rowRules = Seq(
          "qty_in_range" -> ($"l_quantity" >= 1 && $"l_quantity" <= 50),
          "discount_in_range" -> ($"l_discount" >= 0 && $"l_discount" <= 0.1),
          "shipdate_not_null" -> $"l_shipdate".isNotNull),
        uniqueKeys = Seq("pk_unique" -> Seq("l_orderkey", "l_linenumber")))
        .unionByName(graft.ops.Expectations.checkRef(
          li, Seq("l_orderkey"), orders(s, d), Seq("o_orderkey"),
          "fk_orders"))
    }),

    // a14: join-size estimation from stored sketches alone (the
    // Cormode–Muthukrishnan CM inner product — size the join BEFORE
    // running it, no data scanned at estimate time). Exact regime: the
    // active key sets are tiny relative to the 2^16 row width, so no
    // row has cross-collisions and the upper bound IS the true size —
    // which is what the plain-COUNT oracle checks
    "a14_join_estimate" -> ((s, d) => {
      import s.implicits._
      val sn = nation(s, d)
        .agg(graft.functions.CountMin
          .cmSketch($"n_regionkey".cast("long"), 4, 1 << 16, 8)
          .as("sk"))
      val sr = region(s, d)
        .agg(graft.functions.CountMin
          .cmSketch($"r_regionkey".cast("long"), 4, 1 << 16, 8)
          .as("sk"))
      sn.crossJoin(sr.withColumnRenamed("sk", "sk2"))
        .select(graft.functions.CountMin
          .cmInner($"sk", $"sk2", 4, 1 << 16).as("est_join_size"))
    }),

    // q8: statistical moments + correlation per group. Sums are exact
    // BIGINTs over rounded integer units (so partial-agg order can't
    // perturb them); the correlation is then ONE double expression over
    // those exact sums, written identically in the oracle — bit-stable
    // across engines, unlike corr() whose streaming accumulation order
    // differs. Single-shuffle partial-agg plan, same as q1
    "q8_moments" -> ((s, d) => {
      import s.implicits._
      val q = round($"l_quantity").cast("long")
      val p = round($"l_extendedprice").cast("long")
      lineitem(s, d)
        .select($"l_returnflag", q.as("q"), p.as("p"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum($"q").as("sum_q"), sum($"q" * $"q").as("sum_q2"),
          sum($"p").as("sum_p"), sum($"p" * $"p").as("sum_p2"),
          sum($"q" * $"p").as("sum_qp"))
        .withColumn("corr_qp",
          ($"n".cast("double") * $"sum_qp".cast("double") -
            $"sum_q".cast("double") * $"sum_p".cast("double")) /
            (sqrt($"n".cast("double") * $"sum_q2".cast("double") -
              $"sum_q".cast("double") * $"sum_q".cast("double")) *
             sqrt($"n".cast("double") * $"sum_p2".cast("double") -
               $"sum_p".cast("double") * $"sum_p".cast("double"))))
    }),

    // q9: unpivot/melt — wide per-flag measures to long (measure, value)
    // rows via the native Unpivot node (Expand: no shuffle, no join
    // against a measure-name dimension)
    "q9_unpivot" -> ((s, d) => {
      import s.implicits._
      lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          sum(round($"l_quantity" * 100).cast("long")).as("qty_c"),
          sum(round($"l_extendedprice" * 100).cast("long")).as("price_c"),
          sum(round($"l_discount" * 10000).cast("long")).as("disc_bp"))
        .unpivot(Array($"l_returnflag"),
          Array($"qty_c", $"price_c", $"disc_bp"), "measure", "value")
    }),

    // q10: incremental aggregate maintenance — the stored pre-cut
    // aggregate absorbs the post-cut delta via partial-agg merge; the
    // oracle recomputes from scratch, proving merge == recompute. At
    // scale the base is never rescanned; this gate's base/delta split is
    // the worst case (both sides from the same table)
    "q10_incremental" -> ((s, d) => {
      import s.implicits._
      val li = lineitem(s, d)
      val cut = lit("1996-01-01").cast("timestamp")
      val stored = li.where($"l_shipdate" < cut)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(round($"l_quantity" * 100).cast("long")).as("sum_qty_c"))
      graft.ops.IncrementalAgg.mergeCounts(
        stored, li.where($"l_shipdate" >= cut), Seq("l_returnflag"),
        Seq("sum_qty_c" -> "CAST(round(l_quantity * 100) AS LONG)"))
    }),

    // A8: heavy hitters via a native Space-Saving TypedImperativeAggregate
    // — O(capacity) memory per buffer however many distinct keys stream
    // through, no raw-key shuffle. Capacity 256 > |users| here, so counts
    // are exact (err = 0) and the oracle is a plain GROUP BY top-10
    "a8_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      events(s, d)
        .agg(graft.functions.SpaceSaving
          .spaceSavingTopK($"user_id", capacity = 256, k = 10).as("hh"))
        .select(posexplode($"hh").as(Seq("pos", "e")))
        .select($"e.item".as("user_id"), $"e.cnt".as("cnt"),
          $"e.err".as("err"), ($"pos" + 1).cast("int").as("rnk"))
    }),

    // A10: the Count-Min twin of a8 — same harness, opposite bias:
    // CM only over-counts (linear sketch, merge = cell-wise sum), so the
    // exact regime needs candidates tracked AND no item colliding in all
    // 4 rows; with ~256 users in 4 × 4096 cells that's a deterministic
    // property of the fixture. err = the ceil(e·N/width) envelope
    "a10_cm_topk" -> ((s, d) => {
      import s.implicits._
      events(s, d)
        .agg(graft.functions.CountMin
          .countMinTopK($"user_id", depth = 4, width = 4096,
            capacity = 256, k = 10).as("hh"))
        .select(posexplode($"hh").as(Seq("pos", "e")))
        .select($"e.item".as("user_id"), $"e.cnt".as("cnt"),
          $"e.err".as("err"), ($"pos" + 1).cast("int").as("rnk"))
    }),

    // Q12: grouped quantiles from ONE mergeable KLL-sketch pass — the
    // order-statistics member of the sketch family (a8 Space-Saving, a10
    // Count-Min, ts7b Bloom, q11-approx HLL++). l_quantity has a FIXED
    // 50-value domain, so the sketch's exact-head regime (distinct ≤ k)
    // holds at every scale factor: err = 0 and the answer is
    // quantile_disc-identical while memory stays O(k), not O(rows) — an
    // exact-percentile GROUP BY would sort whole groups. Only sketches
    // shuffle (partial aggregation), never rows
    "q12_quantile_sketch" -> ((s, d) => {
      import s.implicits._
      lineitem(s, d)
        .select($"l_returnflag",
          round($"l_quantity" * 100).cast("long").as("qty_c"))
        .groupBy($"l_returnflag")
        .agg(graft.functions.Kll
          .kllQuantiles($"qty_c", k = 256, probs = Seq(0.25, 0.5, 0.75, 0.95))
          .as("s"))
        .select($"l_returnflag",
          $"s.qs".getItem(0).as("q25"), $"s.qs".getItem(1).as("q50"),
          $"s.qs".getItem(2).as("q75"), $"s.qs".getItem(3).as("q95"),
          $"s.err".as("err"), $"s.n".as("n"))
    }),

    // Q13: distribution profiling — per-column quantiles for several
    // columns from ONE scan (one KLL sketch per column; no Expand, no
    // per-column sort — q11's profiling sweep extended to order
    // statistics). All three gate columns have small fixed domains, so
    // the exact-head regime holds at every scale factor
    "q13_profile_quantiles" -> ((s, d) =>
      graft.ops.Profiling.profileQuantiles(lineitem(s, d),
        Seq(("l_quantity", 100), ("l_discount", 10000), ("l_tax", 10000)))),

    // Q14: Tukey-fence outliers per event type — per-group q1/q3 from
    // one sketch aggregation, fences broadcast back, flag test map-side
    // (rows never shuffle). All-integer fence arithmetic (2v vs
    // 2q1 − 3·IQR) so both engines compute identical cuts; exact-head
    // regime at gate scale (≤ ~1.8k distinct cents per type, k = 4096)
    "q14_iqr_outliers" -> ((s, d) => {
      import s.implicits._
      val ev = events(s, d).select($"event_id", $"event_type",
        round($"value" * 100).cast("long").as("v_cents"))
      graft.ops.Profiling.iqrOutliers(ev, "event_type", "v_cents")
        .select($"event_id", $"event_type", $"v_cents", $"q1", $"q3",
          $"err")
    }),

    // Q15: mergeable-summary rollup (Agarwal et al., PODS 2012) — the
    // pre-aggregated sketch-table pattern: per-(type, day) partial KLL
    // sketches are built once (as BINARY — what a summary table stores),
    // then a query over any slice merges the covered sketches instead of
    // rescanning rows. The oracle is the DIRECT per-type quantile over
    // the raw rows: merged-partials == direct is exactly the mergeable
    // property under the zero-compaction regime (per-type distinct
    // ≤ k at gate scale); past it, bounds telescope into err
    "q15_sketch_rollup" -> ((s, d) => {
      import s.implicits._
      val probs = Seq(0.25, 0.5, 0.75, 0.95)
      val ev = events(s, d).select($"event_type",
        expr("unix_micros(ts) DIV 86400000000").as("day"),
        round($"value" * 100).cast("long").as("v_cents"))
      val partials = ev.groupBy($"event_type", $"day")
        .agg(graft.functions.Kll.kllSketch($"v_cents", 4096).as("sk"))
      partials.groupBy($"event_type")
        .agg(graft.functions.Kll.kllMerge($"sk", 4096, probs).as("s"))
        .select($"event_type",
          $"s.qs".getItem(0).as("q25"), $"s.qs".getItem(1).as("q50"),
          $"s.qs".getItem(2).as("q75"), $"s.qs".getItem(3).as("q95"),
          $"s.err".as("err"), $"s.n".as("n"))
    }),

    // A12: heavy-hitter SUMMARY TABLE — per-day CM partials stored as
    // binary, merged at query time (q15's pattern for top-k). CM is
    // LINEAR, so merged partials == a direct sketch over the union with
    // NO extra condition (cell arrays sum) — only the candidate union is
    // capacity-bound, covered here as in a10's exact regime. Same
    // oracle as a10: the direct GROUP BY top-10
    "a12_cm_rollup" -> ((s, d) => {
      import s.implicits._
      val ev = events(s, d).select($"user_id",
        expr("unix_micros(ts) DIV 86400000000").as("day"))
      val partials = ev.groupBy($"day")
        .agg(graft.functions.CountMin
          .cmSketch($"user_id", depth = 4, width = 4096, capacity = 256)
          .as("sk"))
      partials
        .agg(graft.functions.CountMin
          .cmMerge($"sk", depth = 4, width = 4096, capacity = 256, k = 10)
          .as("hh"))
        .select(posexplode($"hh").as(Seq("pos", "e")))
        .select($"e.item".as("user_id"), $"e.cnt".as("cnt"),
          $"e.err".as("err"), ($"pos" + 1).cast("int").as("rnk"))
    }),

    // A13: audience-overlap SUMMARY TABLE — the set-INTERSECTION member
    // of the mergeable-sketch family (HLL registers union losslessly but
    // cannot intersect; KMV keeps the actual k-minimum hash SAMPLE, so
    // stored sketches answer "how many users did BOTH" as a scalar probe
    // — no row rescan, and the pairwise join is over the group-
    // cardinality-sized sketch table, never the events). Exact regime at
    // gate scale (distinct users per type << k = 4096), the same
    // discipline as q12/a10: the oracle is the exact pairwise distinct
    // intersection
    "a13_kmv_overlap" -> ((s, d) => {
      import s.implicits._
      val sk = events(s, d).groupBy($"event_type")
        .agg(graft.functions.Kmv.kmvSketch($"user_id", 4096).as("sk"))
      val a = sk.select($"event_type".as("type_a"), $"sk".as("sk_a"))
      val b = sk.select($"event_type".as("type_b"), $"sk".as("sk_b"))
      a.join(b, $"type_a" < $"type_b")
        .select($"type_a", $"type_b",
          graft.functions.Kmv.kmvEst($"sk_a").as("n_a"),
          graft.functions.Kmv.kmvEst($"sk_b").as("n_b"),
          graft.functions.Kmv.kmvIntersect($"sk_a", $"sk_b")
            .as("n_overlap"))
    }),

    // Q16: snapshot-drift report — the data-validation pass between two
    // corpus slices, composed from the sketch family (KLL median + KMV
    // distinct + KMV overlap): each side costs one scan, only sketches
    // shuffle, and the distinct-entity overlap between the sides — the
    // question two separate profiles cannot answer without rescanning —
    // is a scalar probe over the stored sketches. Exact regime at gate
    // scale (distincts per group-side << k), q12/a13's discipline
    "q16_drift_report" -> ((s, d) => {
      import s.implicits._
      val ev = events(s, d).select($"event_type",
        round($"value" * 100).cast("long").as("v_cents"),
        $"user_id", $"event_id")
      graft.ops.Profiling.driftReport(
        ev.where($"event_id" % 2 === 0), ev.where($"event_id" % 2 === 1),
        "event_type", "v_cents", "user_id")
    }),

    // W6: ntile decile assignment per priority class — PARTITIONED
    // window (a global ntile would be a single-partition total sort, the
    // classic window scale hazard; within-group deciles shuffle once on
    // the group key). Ties broken by orderkey for a deterministic oracle
    "w6_ntile" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      orders(s, d)
        .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
        .withColumn("decile", ntile(10).over(w))
    }),

    // q11: whole-table column profiling — one scan computes per-column
    // (n, nulls, distinct, min, max) for several columns at once (the
    // multi-count-distinct Expand), then unpivots to one row per column.
    // The data-quality sweep you run ONCE per snapshot instead of one
    // scan per column
    // (the approx_count_distinct twin — same shape, no Expand — is
    // Profiling.profile(approx = true), spec-gated against this exact
    // form with HLL++ rsd bounds in ProfilingSpec)
    "q11_profile_all" -> ((s, d) =>
      graft.ops.Profiling.profile(lineitem(s, d),
        Seq(("l_quantity", 100), ("l_extendedprice", 100),
          ("l_discount", 10000)))),

    // W7: cumulative distribution (percentile rank with peers) per
    // priority class — value depends only on the ordering key, so ties
    // need no arbitrary break
    "w7_cume_dist" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice")
      orders(s, d)
        .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
        .withColumn("cd", cume_dist().over(w))
    }),

    // W10: percent_rank + first_value — the last members of the window
    // family not yet gated: each order's price percentile within its
    // priority class, next to the class minimum carried on every row
    // (first_value over the ordered frame; orderkey tie-break keeps the
    // frame head deterministic)
    "w10_pct_first" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice", $"o_orderkey")
      orders(s, d)
        .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
        .withColumn("pr", percent_rank().over(w))
        .withColumn("class_min", first($"o_totalprice").over(w))
    }),

    // W8: nth_value over the FULL partition frame — third-highest order
    // value per priority class (deterministic orderkey tiebreak),
    // collapsed to one row per class
    "w8_nth_value" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      orders(s, d)
        .select($"o_orderpriority",
          nth_value($"o_totalprice", 3).over(w).as("third_price"))
        .distinct()
    }),

    // J10: binned range join — events attributed to the 30-minute window
    // after each purchase, as an equi-join on (time bin, user) + exact
    // residual, never a nested-loop non-equi join
    "j10_range_attr" -> ((s, d) => {
      import s.implicits._
      val ev = events(s, d)
        .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"))
      val purchases = events(s, d).where($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("p_event_id"),
          unix_micros($"ts").as("lo_us"),
          (unix_micros($"ts") + 1800000000L).as("hi_us"))
      graft.ops.RangeJoin.pointInInterval(ev, purchases,
          t = "ts_us", lo = "lo_us", hi = "hi_us",
          binWidth = 1800000000L, keys = Seq("user_id"))
        .groupBy($"p_event_id").agg(count(lit(1)).as("n_in_window"))
    }),

    // J11: interval-overlap join — pairs of same-user purchase windows
    // that intersect, via the binned equi-join (first-overlap-bin filter
    // dedups without a distinct shuffle; never a nested loop)
    "j11_interval_overlap" -> ((s, d) => {
      import s.implicits._
      val p = events(s, d).where($"event_type" === "purchase")
        .select($"user_id", $"event_id",
          unix_micros($"ts").as("lo"),
          (unix_micros($"ts") + 1800000000L).as("hi"))
      val a = p.select($"user_id", $"event_id".as("a_id"),
        $"lo".as("a_lo"), $"hi".as("a_hi"))
      val b = p.select($"user_id", $"event_id".as("b_id"),
        $"lo".as("b_lo"), $"hi".as("b_hi"))
      graft.ops.RangeJoin.intervalOverlap(a, b,
          aLo = "a_lo", aHi = "a_hi", bLo = "b_lo", bHi = "b_hi",
          binWidth = 1800000000L, keys = Seq("user_id"))
        .where($"a_id" < $"b_id")
        .select($"user_id", $"a_id", $"b_id",
          (least($"a_hi", $"b_hi") - greatest($"a_lo", $"b_lo"))
            .as("overlap_us"))
    }),

    // W4: as-of (point-in-time) join — each event gets the user's latest
    // purchase at-or-before its timestamp, via the union-window form
    // (one shuffle on user_id; no range-join cross product)
    "w4_asof_lookup" -> ((s, d) => {
      import s.implicits._
      val ev = events(s, d)
        .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
          $"event_type", $"value")
      val purchases = ev.where($"event_type" === "purchase")
        .select($"user_id", $"ts_us".as("p_ts_us"),
          $"event_id".as("p_event_id"), $"value".as("p_value"))
      graft.ops.AsOf.asofJoin(
        ev.select($"event_id", $"user_id", $"ts_us"), purchases,
        keys = Seq("user_id"), leftTime = "ts_us", rightTime = "p_ts_us",
        leftTie = "event_id", rightTie = "p_event_id",
        valueCols = Seq("p_event_id", "p_value"))
    }),

    // W2: LEAD successor lookup — the validity-interval fill
    // (ref: fill_diaobject_validity_end.sql:16-31)
    "w2_lead_validity" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      events(s, d)
        .select($"event_id", $"user_id",
          unix_micros($"ts").as("start_us"),
          unix_micros(lead($"ts", 1).over(w)).as("end_us"))
    }),

    // W3: last-write-wins dedup via descending row_number
    // (ref: P/bigquery/updates/expanded_updates_table.py:173-204)
    "w3_lww_dedup" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"ts".desc, $"event_id".desc)
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .where($"rn" === 1)
        .select($"user_id", $"event_type", $"event_id")
    }),

    // §2.6: ordered top-k
    "topk_orders" -> ((s, d) => {
      import s.implicits._
      orders(s, d)
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .select($"o_orderkey", $"o_totalprice")
        .limit(10)
    }),

    // §2.7: union-by-concatenation (WRITE_APPEND accumulation)
    "set_union_all" -> ((s, d) => {
      import s.implicits._
      val e = events(s, d).select($"event_id", $"event_type")
      e.where($"event_type" === "error")
        .unionByName(e.where($"event_type" === "signup"))
    }),

    // §2.7: set difference (ids - found)
    // (ref: P/sql/_ppdb_sql.py:312-314)
    "set_except" -> ((s, d) => {
      import s.implicits._
      val e = events(s, d)
      e.where($"event_type" === "signup").select($"user_id")
        .except(e.where($"event_type" === "churn").select($"user_id"))
    }),

    // P12: substring predicate — pushed to the data source as
    // StringContains (PlanAudit-asserted). NOTE the honest scale story:
    // Spark's ParquetFilters converts StartsWith to a row-group
    // min/max range but has no parquet-level translation for Contains,
    // so this prunes nothing below the scan operator; its value is that
    // the filter runs inside the scan's codegen'd loop before any
    // downstream operator, and that a source that CAN evaluate contains
    // (e.g. an indexed store) receives it
    "p12_like_scan" -> ((s, d) => {
      import s.implicits._
      part(s, d).where($"p_name".contains("bolt"))
        .select($"p_partkey", $"p_name")
    }),

    // P13: prefix predicate — the variant that DOES reach parquet:
    // StringStartsWith converts to a row-group min/max range, so at
    // 100 TB row groups outside the prefix range never decompress
    "p13_prefix_scan" -> ((s, d) => {
      import s.implicits._
      part(s, d).where($"p_name".startsWith("blue"))
        .select($"p_partkey", $"p_name")
    }),

    // Q6: decorrelated scalar subquery (TPC-H Q17 shape) — lineitems
    // below a fifth of their part's average quantity. The correlated
    // form re-evaluates the subquery per row; the scalable plan is one
    // per-part aggregate joined back. All-integer arithmetic
    // (qty < sum/(5·cnt) ⟺ 5·qty·cnt < sum in cents) so the oracle
    // bit-matches with no float division
    "q6_small_order_parts" -> ((s, d) => {
      import s.implicits._
      val li = lineitem(s, d).select($"l_partkey",
        round($"l_quantity" * 100).cast("long").as("qc"))
      val stats = li.groupBy($"l_partkey")
        .agg(sum($"qc").as("sum_qc"), count(lit(1)).as("cnt"))
      li.join(stats, "l_partkey")
        .where($"qc" * 5 * $"cnt" < $"sum_qc")
        .groupBy($"l_partkey")
        .agg(count(lit(1)).as("n_small"), sum($"qc").as("sum_small_cents"))
    }),

    // W5: top-k per group — each customer's 3 highest-value orders. The
    // rank window shuffles once on the group key and AQE coalesces the
    // post-filter; at scale this beats a groupBy+sort_array collect
    // because no group's orders ever materialize as one array
    "w5_topk_per_group" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      orders(s, d)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
        .withColumn("rn", row_number().over(w))
        .where($"rn" <= 3)
    }),

    // T5: contiguous-prefix barrier (promote only an uninterrupted run)
    // (ref: P/bigquery/ppdb_bigquery.py:546-576)
    "t5_staged_prefix" -> ((s, d) => {
      import s.implicits._
      val o = orders(s, d)
      val firstBad = o.where($"o_orderstatus" =!= "O")
        .agg(min($"o_orderkey").as("bad"))
      o.join(broadcast(firstBad))
        .where($"o_orderkey" < coalesce($"bad", lit(Long.MaxValue)))
        .select($"o_orderkey", $"o_orderstatus")
    })
  )

  val oracles: Map[String, String] = Map(
    "p12_like_scan" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE p_name LIKE '%bolt%'""".stripMargin,
    "p13_prefix_scan" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE p_name LIKE 'blue%'""".stripMargin,
    "q6_small_order_parts" ->
      """WITH li AS (SELECT l_partkey,
        |              CAST(round(l_quantity * 100) AS BIGINT) AS qc
        |            FROM lineitem),
        |st AS (SELECT l_partkey, CAST(sum(qc) AS BIGINT) AS sum_qc,
        |              count(*) AS cnt
        |       FROM li GROUP BY 1)
        |SELECT li.l_partkey, count(*) AS n_small,
        |       CAST(sum(qc) AS BIGINT) AS sum_small_cents
        |FROM li JOIN st USING (l_partkey)
        |WHERE qc * 5 * cnt < sum_qc
        |GROUP BY 1""".stripMargin,
    "w5_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin,
    "s1_chunk_scan" ->
      """SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
        |FROM events WHERE event_id >= 500 ORDER BY ts_us, event_id""".stripMargin,
    "s2_pred_compose" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'O' AND o_totalprice > 50000.0
        |ORDER BY o_orderkey""".stripMargin,
    "p2_select_except" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |       l_returnflag, l_linestatus
        |FROM lineitem WHERE l_orderkey < 100""".stripMargin,
    "p7_in_list" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')""".stripMargin,
    "p6_not_in" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderstatus NOT IN ('F', 'P')""".stripMargin,
    "p9_exists_probe" ->
      "SELECT 1 AS one FROM lineitem WHERE l_orderkey = 1 LIMIT 1",
    "j3_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)""".stripMargin,
    // NOT EXISTS, not NOT IN: the Spark side is a left_anti join, and
    // the two agree under NULL keys only in the EXISTS form (one NULL
    // on either side silently changes a NOT IN result set)
    "j7_frontier_anti" ->
      """SELECT p_partkey, p_name FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_partkey = p.p_partkey)""".stripMargin,
    "j8_consistency_join" ->
      """SELECT o_orderkey, c_custkey, c_acctbal
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_acctbal < 0.0""".stripMargin,
    "p8_null_probe" ->
      """SELECT c_custkey, c_name
        |FROM customer LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
        |  ON c_custkey = o_custkey
        |WHERE o_custkey IS NULL""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_price_cents,
        |       count(*) AS n
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "a2_distinct" ->
      "SELECT DISTINCT o_orderpriority FROM orders",
    "a4_min_sum" ->
      """SELECT min(event_id) AS min_id, max(event_id) AS max_id,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_value_cents,
        |       count(*) AS n
        |FROM events""".stripMargin,
    "q3_join_agg" ->
      """SELECT n_name,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS rev_cents,
        |       count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q4_profile" ->
      """SELECT l_returnflag,
        |       count(*) AS n,
        |       count(CASE WHEN l_quantity IS NULL THEN 1 END) AS n_null_qty,
        |       min(l_quantity) AS min_qty,
        |       max(l_quantity) AS max_qty,
        |       quantile_cont(l_quantity, 0.5) AS p50_qty,
        |       quantile_cont(l_quantity, 0.95) AS p95_qty,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |         AS BIGINT) AS sum_price_cents
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q5_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |         AS BIGINT) AS sum_price_cents
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "j11_interval_overlap" ->
      """WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS lo,
        |                  epoch_us(ts) + 1800000000 AS hi
        |           FROM events WHERE event_type = 'purchase')
        |SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
        |       least(a.hi, b.hi) - greatest(a.lo, b.lo) AS overlap_us
        |FROM p a JOIN p b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND a.lo <= b.hi AND b.lo <= a.hi""".stripMargin,
    "q7_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |         AS BIGINT) AS sum_price_cents
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q17_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |         AS BIGINT) AS sum_price_cents
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))"""
        .stripMargin,

    // exact regime: no cross-collisions in a 2^16-wide row at ≤ 25
    // active keys, so the sketch estimate equals the true join count
    "a14_join_estimate" ->
      """SELECT CAST(count(*) AS BIGINT) AS est_join_size
        |FROM nation JOIN region ON n_regionkey = r_regionkey"""
        .stripMargin,

    // violation = predicate false OR null (the CASE ELSE arm catches
    // both, matching when(pred, 0).otherwise(1))
    "q18_expectations" ->
      """SELECT 'qty_in_range' AS rule,
        |  CAST(sum(CASE WHEN l_quantity >= 1 AND l_quantity <= 50
        |    THEN 0 ELSE 1 END) AS BIGINT) AS n_violations FROM lineitem
        |UNION ALL
        |SELECT 'discount_in_range',
        |  CAST(sum(CASE WHEN l_discount >= 0 AND l_discount <= 0.1
        |    THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem
        |UNION ALL
        |SELECT 'shipdate_not_null',
        |  CAST(sum(CASE WHEN l_shipdate IS NOT NULL
        |    THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem
        |UNION ALL
        |SELECT 'pk_unique',
        |  count(*) - count(DISTINCT (l_orderkey, l_linenumber))
        |  FROM lineitem
        |UNION ALL
        |SELECT 'fk_orders', count(*) FROM lineitem l
        |  LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderkey IS NULL AND l.l_orderkey IS NOT NULL"""
        .stripMargin,

    "q8_moments" ->
      """WITH t AS (
        |  SELECT l_returnflag,
        |         CAST(round(l_quantity) AS BIGINT) AS q,
        |         CAST(round(l_extendedprice) AS BIGINT) AS p
        |  FROM lineitem),
        |m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |         CAST(sum(q) AS BIGINT) AS sum_q,
        |         CAST(sum(q * q) AS BIGINT) AS sum_q2,
        |         CAST(sum(p) AS BIGINT) AS sum_p,
        |         CAST(sum(p * p) AS BIGINT) AS sum_p2,
        |         CAST(sum(q * p) AS BIGINT) AS sum_qp
        |  FROM t GROUP BY l_returnflag)
        |SELECT *,
        |       (CAST(n AS DOUBLE) * CAST(sum_qp AS DOUBLE) -
        |         CAST(sum_q AS DOUBLE) * CAST(sum_p AS DOUBLE)) /
        |       (sqrt(CAST(n AS DOUBLE) * CAST(sum_q2 AS DOUBLE) -
        |          CAST(sum_q AS DOUBLE) * CAST(sum_q AS DOUBLE)) *
        |        sqrt(CAST(n AS DOUBLE) * CAST(sum_p2 AS DOUBLE) -
        |          CAST(sum_p AS DOUBLE) * CAST(sum_p AS DOUBLE)))
        |         AS corr_qp
        |FROM m""".stripMargin,

    "q9_unpivot" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
        |           AS BIGINT) AS qty_c,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |           AS BIGINT) AS price_c,
        |         CAST(sum(CAST(round(l_discount * 10000) AS BIGINT))
        |           AS BIGINT) AS disc_bp
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, measure, value
        |FROM m UNPIVOT (value FOR measure IN (qty_c, price_c, disc_bp))""".stripMargin,

    "q10_incremental" ->
      """SELECT l_returnflag, count(*) AS n,
        |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
        |         AS BIGINT) AS sum_qty_c
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "a8_heavy_hitters" ->
      """SELECT user_id, cnt, CAST(0 AS BIGINT) AS err, rnk FROM (
        |  SELECT user_id, count(*) AS cnt,
        |         CAST(row_number() OVER (ORDER BY count(*) DESC, user_id)
        |           AS INTEGER) AS rnk
        |  FROM events GROUP BY user_id) t
        |WHERE rnk <= 10""".stripMargin,

    // exact regime: estimates equal true counts, err = ceil(e·N/4096)
    // with the same double op order (E * N, then / width)
    "a10_cm_topk" ->
      """SELECT user_id, cnt,
        |       CAST(ceil(2.718281828459045 * CAST(
        |         (SELECT count(*) FROM events) AS DOUBLE) / CAST(4096 AS DOUBLE))
        |         AS BIGINT) AS err,
        |       rnk FROM (
        |  SELECT user_id, count(*) AS cnt,
        |         CAST(row_number() OVER (ORDER BY count(*) DESC, user_id)
        |           AS INTEGER) AS rnk
        |  FROM events GROUP BY user_id) t
        |WHERE rnk <= 10""".stripMargin,

    // linearity: merged per-day partials == the direct sketch, so the
    // oracle is a10's verbatim — the plain GROUP BY top-10
    "a12_cm_rollup" ->
      """SELECT user_id, cnt,
        |       CAST(ceil(2.718281828459045 * CAST(
        |         (SELECT count(*) FROM events) AS DOUBLE) / CAST(4096 AS DOUBLE))
        |         AS BIGINT) AS err,
        |       rnk FROM (
        |  SELECT user_id, count(*) AS cnt,
        |         CAST(row_number() OVER (ORDER BY count(*) DESC, user_id)
        |           AS INTEGER) AS rnk
        |  FROM events GROUP BY user_id) t
        |WHERE rnk <= 10""".stripMargin,

    // exact regime on every sketch: KLL median == quantile_disc (rank
    // max(1, ceil(p·n))), KMV distinct/overlap == exact distinct counts
    "q16_drift_report" ->
      """WITH ea AS (SELECT event_type,
        |              CAST(round(value * 100) AS BIGINT) AS v, user_id
        |            FROM events WHERE event_id % 2 = 0),
        |eb AS (SELECT event_type,
        |         CAST(round(value * 100) AS BIGINT) AS v, user_id
        |       FROM events WHERE event_id % 2 = 1),
        |ca AS (SELECT event_type, count(*) AS n_a,
        |         quantile_disc(v, 0.5) AS p50_a,
        |         count(DISTINCT user_id) AS nd_a
        |       FROM ea GROUP BY 1),
        |cb AS (SELECT event_type, count(*) AS n_b,
        |         quantile_disc(v, 0.5) AS p50_b,
        |         count(DISTINCT user_id) AS nd_b
        |       FROM eb GROUP BY 1),
        |ov AS (SELECT x.event_type, count(*) AS nd_overlap
        |       FROM (SELECT DISTINCT event_type, user_id FROM ea) x
        |       JOIN (SELECT DISTINCT event_type, user_id FROM eb) y
        |         USING (event_type, user_id)
        |       GROUP BY 1)
        |SELECT COALESCE(ca.event_type, cb.event_type) AS event_type,
        |       CAST(COALESCE(n_a, 0) AS BIGINT) AS n_a,
        |       CAST(COALESCE(n_b, 0) AS BIGINT) AS n_b,
        |       p50_a, p50_b, nd_a, nd_b,
        |       CAST(COALESCE(ov.nd_overlap, 0) AS BIGINT) AS nd_overlap
        |FROM ca FULL JOIN cb USING (event_type)
        |LEFT JOIN ov
        |  ON ov.event_type = COALESCE(ca.event_type, cb.event_type)
        |""".stripMargin,

    // exact regime (distinct users per type << k): the stored KMV
    // sketches ARE the distinct hash sets, so estimates and overlaps
    // equal the exact pairwise distinct-intersection counts
    "a13_kmv_overlap" ->
      """WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
        |c AS (SELECT event_type, count(*) AS n FROM d GROUP BY 1),
        |ov AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
        |              count(*) AS n_overlap
        |       FROM d x JOIN d y
        |         ON x.user_id = y.user_id AND x.event_type < y.event_type
        |       GROUP BY 1, 2)
        |SELECT ca.event_type AS type_a, cb.event_type AS type_b,
        |       ca.n AS n_a, cb.n AS n_b,
        |       CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap
        |FROM c ca JOIN c cb ON ca.event_type < cb.event_type
        |LEFT JOIN ov ON ov.type_a = ca.event_type
        |            AND ov.type_b = cb.event_type""".stripMargin,

    // exact regime: 50 distinct cents values ≤ k=256 ⇒ the sketch is the
    // exact weighted histogram and err = 0; quantile_disc rank rule is
    // max(1, ceil(p·n)), the same rule KllBuf.quantiles implements
    "q12_quantile_sketch" ->
      """SELECT l_returnflag,
        |       quantile_disc(qty_c, 0.25) AS q25,
        |       quantile_disc(qty_c, 0.50) AS q50,
        |       quantile_disc(qty_c, 0.75) AS q75,
        |       quantile_disc(qty_c, 0.95) AS q95,
        |       CAST(0 AS BIGINT) AS err, count(*) AS n
        |FROM (SELECT l_returnflag,
        |        CAST(round(l_quantity * 100) AS BIGINT) AS qty_c
        |      FROM lineitem) t
        |GROUP BY l_returnflag""".stripMargin,

    "q13_profile_quantiles" ->
      Seq(("l_quantity", 100), ("l_discount", 10000), ("l_tax", 10000))
        .map { case (c, k) =>
          val sc = s"CAST(round($c * $k) AS BIGINT)"
          s"""SELECT '$c' AS col_name, count($c) AS n,
             |  quantile_disc($sc, 0.25) AS q1,
             |  quantile_disc($sc, 0.50) AS q2,
             |  quantile_disc($sc, 0.75) AS q3,
             |  quantile_disc($sc, 0.95) AS q4,
             |  CAST(0 AS BIGINT) AS err
             |FROM lineitem""".stripMargin
        }.mkString("\nUNION ALL\n"),

    "q14_iqr_outliers" ->
      """WITH q AS (SELECT event_type,
        |    quantile_disc(CAST(round(value*100) AS BIGINT), 0.25) AS q1,
        |    quantile_disc(CAST(round(value*100) AS BIGINT), 0.75) AS q3
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type,
        |       CAST(round(e.value*100) AS BIGINT) AS v_cents,
        |       q.q1, q.q3, CAST(0 AS BIGINT) AS err
        |FROM events e JOIN q USING (event_type)
        |WHERE 2*CAST(round(e.value*100) AS BIGINT) < 2*q.q1 - 3*(q.q3-q.q1)
        |   OR 2*CAST(round(e.value*100) AS BIGINT) > 2*q.q3 + 3*(q.q3-q.q1)""".stripMargin,

    // merged per-day partials must equal the direct per-type quantiles
    "q15_sketch_rollup" ->
      """SELECT event_type,
        |  quantile_disc(CAST(round(value*100) AS BIGINT), 0.25) AS q25,
        |  quantile_disc(CAST(round(value*100) AS BIGINT), 0.50) AS q50,
        |  quantile_disc(CAST(round(value*100) AS BIGINT), 0.75) AS q75,
        |  quantile_disc(CAST(round(value*100) AS BIGINT), 0.95) AS q95,
        |  CAST(0 AS BIGINT) AS err, count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "w6_ntile" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |       CAST(ntile(10) OVER (PARTITION BY o_orderpriority
        |         ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER)
        |         AS decile
        |FROM orders""".stripMargin,

    "q11_profile_all" ->
      Seq(("l_quantity", 100), ("l_extendedprice", 100),
        ("l_discount", 10000)).map { case (c, k) =>
        s"""SELECT '$c' AS col_name, count($c) AS n,
           |  count(DISTINCT CAST(round($c * $k) AS BIGINT)) AS n_distinct,
           |  min(CAST(round($c * $k) AS BIGINT)) AS lo_scaled,
           |  max(CAST(round($c * $k) AS BIGINT)) AS hi_scaled
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n"),

    "w7_cume_dist" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |       cume_dist() OVER (PARTITION BY o_orderpriority
        |         ORDER BY o_totalprice) AS cd
        |FROM orders""".stripMargin,

    "w8_nth_value" ->
      """SELECT DISTINCT o_orderpriority,
        |       nth_value(o_totalprice, 3) OVER (
        |         PARTITION BY o_orderpriority
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |         AS third_price
        |FROM orders""".stripMargin,

    "w10_pct_first" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |       percent_rank() OVER (PARTITION BY o_orderpriority
        |         ORDER BY o_totalprice, o_orderkey) AS pr,
        |       first_value(o_totalprice) OVER (
        |         PARTITION BY o_orderpriority
        |         ORDER BY o_totalprice, o_orderkey) AS class_min
        |FROM orders""".stripMargin,

    "j10_range_attr" ->
      """SELECT p.event_id AS p_event_id, count(*) AS n_in_window
        |FROM events p JOIN events e
        |  ON e.user_id = p.user_id
        | AND epoch_us(e.ts) >= epoch_us(p.ts)
        | AND epoch_us(e.ts) <= epoch_us(p.ts) + 1800000000
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1""".stripMargin,

    "w4_asof_lookup" ->
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |       p.p_event_id, p.p_value
        |FROM events e LEFT JOIN LATERAL (
        |  SELECT r.event_id AS p_event_id, r.value AS p_value
        |  FROM events r
        |  WHERE r.user_id = e.user_id AND r.event_type = 'purchase'
        |    AND r.ts <= e.ts
        |  ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) p ON true""".stripMargin,

    "w1_rank" ->
      """SELECT event_id, user_id,
        |       rank() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rnk
        |FROM events""".stripMargin,
    "w2_lead_validity" ->
      """SELECT event_id, user_id, epoch_us(ts) AS start_us,
        |       epoch_us(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS end_us
        |FROM events""".stripMargin,
    "w3_lww_dedup" ->
      """SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "set_union_all" ->
      """SELECT event_id, event_type FROM events WHERE event_type = 'error'
        |UNION ALL
        |SELECT event_id, event_type FROM events WHERE event_type = 'signup'""".stripMargin,
    "set_except" ->
      """SELECT user_id FROM events WHERE event_type = 'signup'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'churn'""".stripMargin,
    "t5_staged_prefix" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderkey < coalesce(
        |  (SELECT min(o_orderkey) FROM orders WHERE o_orderstatus <> 'O'),
        |  9223372036854775807)""".stripMargin
  )
}
