package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (materialized-view) aggregate maintenance: fold a DELTA
  * batch into a stored per-key aggregate without rescanning the base
  * fact table — the maintenance loop behind "keep per-source corpus
  * stats / per-object counters current as chunks land".
  *
  * [[mergeCounts]] merges every measure with SUM, so it serves counts
  * and sums (and anything derived from them — means, rates) directly;
  * min/max-style state would need a least/greatest merge and is NOT
  * covered. Re-aggregating `stored ∪ partial(delta)` is exactly
  * the partial-aggregate MERGE Spark's own two-phase aggregation runs,
  * so the plan shuffles |stored| + |delta-groups| rows, never the base.
  * At 100 TB the base is petabyte-scale history that is NEVER re-read:
  * cost tracks the delta (and the key cardinality), not the corpus.
  */
object IncrementalAgg {

  /** Merge a stored (key → n, sum per measure) aggregate with a raw
    * delta batch. `sums` maps output column → the delta expression that
    * feeds it (SQL string, evaluated on `delta`). The stored side must
    * carry the same columns: key ++ ("n" +: sums.keys).
    */
  def mergeCounts(stored: DataFrame, delta: DataFrame, keys: Seq[String],
      sums: Seq[(String, String)]): DataFrame = {
    val deltaAgg = delta
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sums.map { case (out, e) => sum(expr(e)).as(out) }: _*)
    val measures = "n" +: sums.map(_._1)
    stored.select((keys ++ measures).map(col): _*)
      .unionByName(deltaAgg.select((keys ++ measures).map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sums.map { case (out, _) => sum(col(out)).as(out) }: _*)
  }
}
