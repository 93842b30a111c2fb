package graft.replicate

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}

import graft.schema.{PpdbSchema, UpdateRecord}
import graft.schema.UpdateRecord.RawUpdate

/** An APDB chunk source staged as parquet — the cross-process form of
  * [[ApdbSource]] that the CLI `run` loop reads (the reference reaches its
  * APDB through a database client, P/replicator.py:165-191; on Spark the
  * natural wire format between the capture side and the replication loop
  * is a parquet drop zone on shared/object storage).
  *
  * Layout under `root`:
  *   - `chunks/` — the descriptor index (apdb_replica_chunk,
  *     last_update_time_us, unique_id), one row per READY chunk;
  *   - `data/chunk=<id>/{DiaObject,DiaSource,DiaForcedSource,Updates}/` —
  *     the chunk payload tables (Updates optional).
  *
  * [[ParquetApdb.stage]] writes the payload dirs FIRST and appends the
  * descriptor row LAST, and listing trusts only the index — so a writer
  * that dies mid-stage leaves an invisible (re-stageable) chunk, never a
  * half-readable one. The same publish-then-index pattern the promoter
  * uses on the PPDB side.
  */
final class ParquetApdb(spark: SparkSession, root: String) extends ApdbSource {

  private def fs = new Path(root).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def chunksPath = new Path(root, "chunks")
  private def dataPath(id: Long, table: String) =
    new Path(new Path(root, s"data/chunk=$id"), table)

  override def listChunks(): DataFrame =
    if (fs.exists(chunksPath))
      // one descriptor SUBDIR per chunk (see stage): recursive lookup
      // flattens them; a descriptor torn by a dead writer is ignored —
      // that chunk is simply invisible until re-staged, and no other
      // chunk's row is affected
      spark.read
        .option("recursiveFileLookup", "true")
        .option("ignoreCorruptFiles", "true")
        .schema(ParquetApdb.chunkDescriptor)
        .parquet(chunksPath.toString)
    else spark.createDataFrame(
      java.util.Collections.emptyList[Row](), ParquetApdb.chunkDescriptor)

  override def chunkData(id: Long): ChunkData = {
    val desc = listChunks()
      .where(org.apache.spark.sql.functions.col("apdb_replica_chunk") === id)
      .collect()
    require(desc.nonEmpty, s"chunk $id not present in $root/chunks")
    val d = desc.head
    val updates =
      if (fs.exists(dataPath(id, "Updates")))
        spark.read.parquet(dataPath(id, "Updates").toString)
          .orderBy("update_order")
          .collect()
          .map { r =>
            val fields = r.getSeq[String](r.fieldIndex("payload_fields"))
            val values = r.getSeq[String](r.fieldIndex("payload_values"))
            val rec: UpdateRecord =
              RawUpdate(r.getLong(r.fieldIndex("update_time_ns")),
                r.getLong(r.fieldIndex("update_order")),
                r.getString(r.fieldIndex("table_name")),
                r.getSeq[Long](r.fieldIndex("record_id")),
                fields.zip(values))
            (r.getLong(r.fieldIndex("chunk")), rec)
          }.toSeq
      else Nil
    ChunkData(id,
      d.getString(d.fieldIndex("unique_id")),
      d.getLong(d.fieldIndex("last_update_time_us")),
      spark.read.parquet(dataPath(id, "DiaObject").toString),
      spark.read.parquet(dataPath(id, "DiaSource").toString),
      spark.read.parquet(dataPath(id, "DiaForcedSource").toString),
      updates)
  }
}

object ParquetApdb {

  val chunkDescriptor: org.apache.spark.sql.types.StructType =
    new org.apache.spark.sql.types.StructType()
      .add("apdb_replica_chunk", "long", nullable = false)
      .add("last_update_time_us", "long", nullable = false)
      .add("unique_id", "string", nullable = false)

  private val updateSchema = new org.apache.spark.sql.types.StructType()
    .add("chunk", "long", nullable = false)
    .add("update_time_ns", "long", nullable = false)
    .add("update_order", "long", nullable = false)
    .add("table_name", "string", nullable = false)
    .add("record_id", "array<long>", nullable = false)
    .add("payload_fields", "array<string>", nullable = false)
    .add("payload_values", "array<string>", nullable = false)

  /** Publish one chunk into the drop zone: payload dirs first, descriptor
    * row last (see class doc for the atomicity argument).
    */
  def stage(spark: SparkSession, root: String, data: ChunkData): Unit = {
    val base = s"$root/data/chunk=${data.chunkId}"
    data.diaObjects.write.mode(SaveMode.Overwrite).parquet(s"$base/DiaObject")
    data.diaSources.write.mode(SaveMode.Overwrite).parquet(s"$base/DiaSource")
    data.diaForcedSources.write.mode(SaveMode.Overwrite)
      .parquet(s"$base/DiaForcedSource")
    if (data.updates.nonEmpty) {
      val rows = data.updates.map { case (chunk, u) =>
        Row(chunk, u.updateTimeNs, u.updateOrder, u.tableName, u.recordId,
          u.payload.map(_._1), u.payload.map(_._2))
      }
      spark.createDataFrame(java.util.List.of(rows: _*), updateSchema)
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$base/Updates")
    }
    // upsert the descriptor: each chunk owns its own index SUBDIR, so a
    // re-stage (regenerated data, new unique_id) overwrites exactly one
    // chunk's row, a writer dying mid-descriptor-write tears only that
    // chunk's (ignored, re-stageable) file, and no write ever touches
    // another chunk's descriptor — the cross-process readers the drop
    // zone exists for never observe a deleted or partial INDEX.
    val desc = Row(data.chunkId, data.lastUpdateTimeUs, data.uniqueId)
    spark.createDataFrame(java.util.List.of(desc), chunkDescriptor)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$root/chunks/c${data.chunkId}")
  }
}
