package graft.replicate

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.{TableDelta, VersionedCatalog}
import graft.ops.PpdbOps
import graft.schema.{PpdbSchema, UpdateRecord}

/** One replica chunk's payload: the three table deltas plus ordered update
  * records (P/ppdb.py:117-153).
  */
final case class ChunkData(
    chunkId: Long,
    uniqueId: String,
    lastUpdateTimeUs: Long,
    diaObjects: DataFrame,
    diaSources: DataFrame,
    diaForcedSources: DataFrame,
    updates: Seq[(Long, UpdateRecord)])

/** The PPDB store interface (P/ppdb.py:51-153): ordered chunk ingestion
  * with exactly-once semantics, plus chunk bookkeeping queries.
  */
trait Ppdb {
  def store(chunk: ChunkData): Unit
  def replicaChunks(minId: Option[Long] = None): DataFrame
  def metadata: Map[String, String]
}

/** Spark-native PPDB over a [[VersionedCatalog]], reproducing the SQL
  * backend's per-chunk transaction (P/sql/_ppdb_sql.py:127-155): insert
  * DiaObject rows, close superseded validity intervals, append the fact
  * tables, apply ordered update records with existence validation, and
  * upsert the chunk bookkeeping row — all published in ONE atomic catalog
  * commit (T7), so readers never observe partial chunks.
  */
final class PpdbSpark(spark: SparkSession, val catalog: VersionedCatalog)
    extends Ppdb {

  val schemaVersion = "graft-ppdb:0.1.0"

  private def emptyDf(schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** Idempotent initialization: publish empty versions of all tables. */
  def init(): Unit = {
    if (!catalog.exists("DiaObject")) {
      catalog.commit(Map(
        "DiaObject" -> emptyDf(PpdbSchema.diaObject),
        "DiaSource" -> emptyDf(PpdbSchema.diaSource),
        "DiaForcedSource" -> emptyDf(PpdbSchema.diaForcedSource),
        "PpdbReplicaChunk" -> emptyDf(PpdbSchema.replicaChunk)))
    }
  }

  def replicaChunks(minId: Option[Long] = None): DataFrame = {
    val base = catalog.read(spark, "PpdbReplicaChunk")
    val filtered = minId.fold(base)(m => base.where(col("apdb_replica_chunk") >= m))
    filtered.orderBy("last_update_time_us")
  }

  def metadata: Map[String, String] = Map(
    "schema_version" -> schemaVersion,
    "catalog_root" -> catalog.root)

  /** Exactly-once, in-order chunk store (T3): re-storing a known chunk id
    * is a no-op; chunk ids must arrive in ascending order.
    *
    * Cost model at scale: the fact tables (the 100 TB of a PPDB) are
    * ingested as APPEND deltas — one new directory per chunk, zero
    * rewrite — unless an update record patches them. DiaObject is
    * rewritten (the LEAD fill mutates prior rows) but is bounded by the
    * object catalog, orders of magnitude smaller than the fact volume.
    */
  def store(chunk: ChunkData): Unit = {
    val chunks = catalog.read(spark, "PpdbReplicaChunk")
    val known = chunks.where(col("apdb_replica_chunk") === chunk.chunkId)
      .limit(1).count() > 0
    if (known) return

    val objects = catalog.read(spark, "DiaObject")
    val sources = catalog.read(spark, "DiaSource")
    val forced = catalog.read(spark, "DiaForcedSource")

    // 1. insert new DiaObject versions, then close superseded intervals
    //    (LEAD fill scoped to the touched object ids, W2+J3)
    val objectsAll = objects.unionByName(
      chunk.diaObjects.select(objects.columns.map(col).toSeq: _*))
    val filled = graft.Metrics.time("update_validity_time",
        "table" -> "DiaObject") {
      if (chunk.diaObjects.isEmpty) objectsAll
      else PpdbOps.fillValidityEnd(objectsAll, chunk.diaObjects)
    }

    val srcDelta = chunk.diaSources.select(sources.columns.map(col).toSeq: _*)
    val fsrcDelta = chunk.diaForcedSources.select(forced.columns.map(col).toSeq: _*)

    // 2. ordered update records: LWW collapse + per-table patch merge on
    //    the tables they touch, with existence validation (J6) matching
    //    the SQL backend's per-row check (P/sql/_ppdb_sql.py:303-314)
    val tables0 = Map(
      "DiaObject" -> filled,
      "DiaSource" -> sources.unionByName(srcDelta),
      "DiaForcedSource" -> forced.unionByName(fsrcDelta))
    var touched: Set[String] = Set.empty
    val tables =
      if (chunk.updates.isEmpty) tables0
      else {
        val expanded = PpdbOps.expandUpdates(spark, chunk.updates)
        val latest = PpdbOps.latestOnly(expanded).cache()
        touched = latest.select("table_name").distinct()
          .collect().map(_.getString(0)).toSet
        PpdbSchema.dataTables.filter(touched).foreach { t =>
          val spec = PpdbOps.mergeSpecs(t)
          val patch = PpdbOps.buildPatch(latest, spec)
          val dangling = PpdbOps.danglingUpdates(tables0(t), patch, spec)
          val bad = dangling.limit(1).collect()
          if (bad.nonEmpty)
            throw new IllegalStateException(
              s"chunk ${chunk.chunkId}: update for missing $t row " +
                bad.head.toString)
        }
        PpdbOps.applyUpdates(tables0, expanded)
      }

    // 3. chunk bookkeeping row (appended; the control table stays tiny)
    val newChunkRow = spark.createDataFrame(
      java.util.List.of(Row(chunk.chunkId, chunk.lastUpdateTimeUs,
        chunk.uniqueId, System.currentTimeMillis() * 1000L,
        PpdbSchema.ChunkStatus.Promoted, null,
        chunk.updates.size.toLong)),
      PpdbSchema.replicaChunk)

    // 4. single atomic commit: DiaObject rewrite + fact appends (or
    //    rewrites when patched) + bookkeeping append
    val label = s"chunk${chunk.chunkId}"
    def factDelta(name: String, delta: org.apache.spark.sql.DataFrame) =
      if (touched.contains(name)) TableDelta(rewrite = Some(tables(name)))
      else TableDelta(appends = Seq(delta -> label))
    graft.Metrics.time("store_data_time",
        "chunk_id" -> chunk.chunkId.toString) {
    catalog.commitAll(Map(
      "DiaObject" -> TableDelta(rewrite = Some(tables("DiaObject"))),
      "DiaSource" -> factDelta("DiaSource", srcDelta),
      "DiaForcedSource" -> factDelta("DiaForcedSource", fsrcDelta),
      "PpdbReplicaChunk" -> TableDelta(appends = Seq(newChunkRow -> label))))
    }
    ()
  }
}
