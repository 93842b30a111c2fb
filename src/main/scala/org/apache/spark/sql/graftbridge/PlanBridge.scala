package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame

/** Plan-truncation bridge for iterative DataFrame algorithms.
  *
  * Each round of an iterative algorithm (connected components, Lloyd
  * iterations) nests the previous round's logical plan; after k rounds
  * plan compilation/stringification is O(2^k) and OOMs long before data
  * size matters. `localCheckpoint` truncates, but its blocks live outside
  * the CacheManager — `spark.catalog.clearCache()` (the repo-wide release
  * convention for persisted query internals) can't free them, and they
  * linger until driver GC.
  *
  * `truncated` rebuilds a DataFrame directly over the physical RDD of the
  * input's plan (`internalCreateDataFrame` is private[sql], hence this
  * bridge): the new plan is a single leaf node, and a `persist()` on it
  * IS CacheManager-visible, so the caller keeps deterministic release.
  * Lineage beyond the leaf is plain RDD lineage — cheap for the ≤ 50
  * rounds these loops cap at, and recompute-correct if blocks are
  * evicted.
  */
object PlanBridge {
  def truncated(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // copy each InternalRow: toRdd yields operator-reused UnsafeRow
    // buffers (Dataset.checkpoint does the same defensive copy)
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd.map(_.copy()), df.schema, isStreaming = false)
  }
}
