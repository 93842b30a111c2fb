package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.replicate.Promoter

/** Structured-Streaming host for the staged chunk pipeline: exported chunk
  * manifests are a file stream, and each micro-batch stages + promotes the
  * newly-arrived chunk ids through the catalog via `foreachBatch` — the
  * streaming form of the reference's Pub/Sub-triggered load + promotion
  * loop (P/bigquery/chunk_uploader.py:303-310 → chunk_promoter.py).
  *
  * Exactly-once falls out of the composition: the file source checkpoints
  * which manifests it has seen, `stageChunks` skips non-exported chunks,
  * and `promote` only advances the contiguous staged prefix — so replays
  * are no-ops at every stage.
  */
object ChunkStream {

  val manifestSchema: StructType = StructType(Seq(
    StructField("chunk_id", LongType, nullable = false),
    StructField("schema_version", StringType, nullable = true),
    StructField("is_empty_chunk", BooleanType, nullable = true),
    StructField("update_count", LongType, nullable = true)))

  /** Manifest arrivals as a streaming DataFrame. */
  def manifests(spark: SparkSession, exportRoot: String): DataFrame =
    spark.readStream
      .schema(manifestSchema)
      .option("maxFilesPerTrigger", 8)
      .json(s"$exportRoot/chunk_*/manifest.json")

  /** Run the stage+promote loop over manifest arrivals. `AvailableNow`
    * drains what exists and stops; swap the trigger for continuous
    * operation.
    */
  def run(spark: SparkSession, promoter: Promoter, exportRoot: String,
      checkpoint: String): StreamingQuery =
    manifests(spark, exportRoot).writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ids = batch.select("chunk_id").distinct()
          .collect().map(_.getLong(0)).sorted.toSeq
        if (ids.nonEmpty) {
          promoter.stageChunks(ids)
          promoter.promote()
        }
        ()
      }
      .start()
}
