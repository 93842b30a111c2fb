package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.{TableDelta, VersionedCatalog}

/** Incremental column statistics for append-only catalog tables, built
  * on the mergeable-summary pattern ([[graft.functions.Kll]]): every
  * append commits, ATOMICALLY WITH THE DATA, one serialized KLL sketch
  * row per profiled column into a sibling `<table>__colstats` table.
  * Whole-table (or slice-by-commit-label) quantile statistics then come
  * from merging the stored sketch rows — the stats cost of an append is
  * the batch, never the table, and answering "what does this 100 TB
  * column look like now" reads a few KB of sketches instead of the
  * corpus. The same discipline as the incremental ANN / dup-cluster
  * index maintenance: build once, maintain per batch, query the index.
  *
  * Scope: append-shaped fact tables (the catalog's time-series posture).
  * A rewrite invalidates the summary by definition — rebuild with
  * [[rebuildStats]], which is also the bootstrap for pre-existing data.
  */
object SketchStats {

  def statsTable(table: String): String = s"${table}__colstats"

  /** One (col_name, n, sketch, hll) row per profiled column of `batch` —
    * a single aggregation pass, unpivoted the profileQuantiles way. The
    * KLL sketch carries order statistics, the HLL registers distinct
    * counts; both merge across appends.
    */
  private[graft] def sketchRows(batch: DataFrame, cols: Seq[String],
      k: Int, hllP: Int = 12): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"n|$c"),
        graft.functions.Kll.kllSketch(col(c).cast("long"), k).as(s"s|$c"),
        graft.functions.Hll.hllSketch(col(c).cast("long"), hllP)
          .as(s"h|$c"))
    }
    batch.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"), col(s"n|$c").as("n"),
          col(s"s|$c").as("sketch"), col(s"h|$c").as("hll"))
      }: _*)).as("p"))
      .select(col("p.col_name"), col("p.n"), col("p.sketch"), col("p.hll"))
  }

  /** Append `batch` to `table` AND its per-column sketches to the stats
    * table in ONE atomic commit — a crash or a lost optimistic-
    * concurrency race leaves data and stats consistent with each other,
    * never data-without-stats. `expected` passes straight through to the
    * catalog's commit-id CAS.
    */
  def appendWithStats(cat: VersionedCatalog, table: String,
      batch: DataFrame, cols: Seq[String], k: Int = 4096,
      label: String = "", expected: Option[Long] = None): Long =
    cat.commitAll(Map(
      table -> TableDelta(appends = Seq((batch, label))),
      statsTable(table) ->
        TableDelta(appends = Seq((sketchRows(batch, cols, k), label)))),
      expected)

  /** Column statistics for the CURRENT table state from the stats table
    * alone — the data table is never touched. Returns
    * (col_name, n, n_distinct, q1..qm, err); n_distinct is the
    * HLL-merged estimate (idempotent register max, so replayed or
    * overlapping stats rows can't inflate it).
    */
  def quantiles(cat: VersionedCatalog, spark: SparkSession, table: String,
      probs: Seq[Double], k: Int = 4096, hllP: Int = 12): DataFrame = {
    val merged = cat.read(spark, statsTable(table))
      .groupBy(col("col_name"))
      .agg(graft.functions.Kll.kllMerge(col("sketch"), k, probs).as("s"),
        graft.functions.Hll.hllMerge(col("hll"), hllP).as("h"))
    merged.select(Seq(col("col_name"), col("s.n").as("n"),
      col("h.n_distinct").as("n_distinct")) ++
      probs.indices.map(i =>
        col("s.qs").getItem(i).as(s"q${i + 1}")) :+
      col("s.err").as("err"): _*)
  }

  /** Exactly-once STREAMING ingest with stats maintenance — the
    * continuous form of [[appendWithStats]], same discipline as the
    * dup-cluster maintenance loop: foreachBatch + a catalog-recorded
    * batch id, so a replayed micro-batch (restart, retry) is a no-op and
    * data/stats/marker advance in ONE atomic commit per batch.
    */
  def maintainStats(stream: DataFrame, cat: VersionedCatalog,
      table: String, cols: Seq[String], k: Int = 4096)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        applyStatsBatch(batch.toDF(), batchId, cat, table, cols, k)
        ()
    }

  /** One maintenance step (the foreachBatch body, exposed for direct
    * testing and batch-driven backfills): true when applied, false when
    * skipped (replayed id or empty batch).
    */
  def applyStatsBatch(batch: DataFrame, batchId: Long,
      cat: VersionedCatalog, table: String, cols: Seq[String],
      k: Int = 4096): Boolean = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return false
    val meta = s"${table}__stats_meta"
    if (cat.exists(meta) &&
      batchId <= cat.read(spark, meta).head().getAs[Long]("last_batch_id"))
      return false // replay
    val marker = spark.range(1).select(lit(batchId).as("last_batch_id"))
    cat.commitAll(Map(
      table -> TableDelta(appends = Seq((batch, s"b$batchId"))),
      statsTable(table) ->
        TableDelta(appends = Seq((sketchRows(batch, cols, k), s"b$batchId"))),
      meta -> TableDelta(rewrite = Some(marker))))
    true
  }

  /** Rebuild the stats table from the table's current contents (one full
    * scan — the bootstrap for pre-existing data, or recovery after a
    * rewrite). Rewrites the stats table in place.
    */
  def rebuildStats(cat: VersionedCatalog, spark: SparkSession,
      table: String, cols: Seq[String], k: Int = 4096,
      expected: Option[Long] = None): Long =
    cat.commitAll(Map(statsTable(table) -> TableDelta(
      rewrite = Some(sketchRows(cat.read(spark, table), cols, k)))),
      expected)
}
