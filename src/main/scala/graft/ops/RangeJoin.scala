package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join — point-in-interval joins without a nested loop.
  *
  * Spark plans a bare `p.t BETWEEN i.lo AND i.hi` join as
  * BroadcastNestedLoopJoin (O(|P|·|I|) comparisons): fatal at scale.
  * The binned form quantizes the time axis: every interval explodes to
  * the bins it overlaps, every point maps to its single bin, and the
  * join becomes an EQUI-join on (bin [+ keys]) with an exact residual
  * filter. A true (point, interval) pair meets in exactly one bin — the
  * point's — so no post-join dedup is needed.
  *
  * Cost: shuffle of points (1 row each) + intervals replicated
  * ceil(span/binWidth)+1 times. Pick `binWidth` near the typical
  * interval span: replication stays O(1) per interval while each bin's
  * candidate set stays local. The PPDB analogue is observation-in-
  * validity-interval matching; the pipeline analogue is event-in-session
  * attribution.
  */
object RangeJoin {

  /** Join `points` (time column `t`) to `intervals` (`[lo, hi]`, both
    * inclusive, epoch numbers) on containment, optionally also equi on
    * `keys`. Returns matched pairs with all columns of both inputs
    * (names must not collide apart from `keys`).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      t: String, lo: String, hi: String, binWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pBinned = points.withColumn("__bin", floor(col(t) / binWidth))
    val iBinned = intervals.withColumn("__bin",
      explode(sequence(floor(col(lo) / binWidth), floor(col(hi) / binWidth))))
    val joinCols = "__bin" +: keys
    pBinned.join(iBinned, joinCols)
      .where(col(t) >= col(lo) && col(t) <= col(hi))
      .drop("__bin")
  }

  /** Interval-overlap join: pairs where [aLo, aHi] and [bLo, bHi]
    * intersect (inclusive). Both sides explode to their bins; a pair
    * overlapping in several shared bins is kept only where the shared
    * bin is the FIRST bin of the overlap region — a per-row filter, not
    * a distinct shuffle.
    */
  def intervalOverlap(a: DataFrame, b: DataFrame,
      aLo: String, aHi: String, bLo: String, bHi: String, binWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__bin",
        explode(sequence(floor(col(lo) / binWidth), floor(col(hi) / binWidth))))
    val joinCols = "__bin" +: keys
    binned(a, aLo, aHi).join(binned(b, bLo, bHi), joinCols)
      .where(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .where(col("__bin") ===
        floor(greatest(col(aLo), col(bLo)) / binWidth))
      .drop("__bin")
  }
}
