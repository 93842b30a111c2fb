package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.replicate.{ApdbSource, ChunkData}
import graft.schema.UpdateRecord

/** Synthetic ×N corpus inflation for scale-stress testing. No fixture
  * beyond sf0.1 exists, so the stress harness inflates a real table
  * executor-side: each input row explodes into N variants inside its own
  * partition — nothing materializes on the driver, and the inflated
  * frame is plain lineage any query plan consumes like a real table.
  * Used by ScaleStressSpec to pin that the dedup/ANN plans keep their
  * shape (banded equi-joins, broadcast ADC, no nested-loop fallback) and
  * that shuffle volume scales linearly when the corpus grows 10×.
  */
object ScaleStress {

  /** documents ×n: variant 0 is the original; variants 1..n−1 append
    * deterministic rep-specific noise tokens, so each group of n stays a
    * tight near-dup cluster without collapsing to exact dups (the
    * adversarial shape for MinHash/SimHash banding: every band bucket
    * fills with the variant groups). doc_id' = doc_id·n + rep keeps ids
    * unique and provenance recoverable (original = doc_id' div n).
    */
  def inflateDocs(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("*"), explode(sequence(lit(0), lit(n - 1))).as("rep"))
      .select(
        (col("doc_id") * n + col("rep")).as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" zq"), col("rep"),
            lit("q"), pmod(col("doc_id"), lit(89)))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))

  /** documents with a REALISTIC VOCABULARY bolted on: the synthetic
    * fixture text draws from ~31 distinct words (plus the ≤89·(n−1)
    * inflation noise tokens), so a BPE trajectory exhausts after a few
    * hundred merges — real corpora carry 10^5..10^6 distinct words
    * (Heaps' law) and train 32k+ merges. Appends `wordsPerDoc`
    * deterministic pseudo-random 8-letter words per doc (a Weyl mix of
    * (doc_id, position, letter slot) — pure projection, executor-side,
    * no driver data), giving vocab ≈ n_docs·wordsPerDoc distinct words.
    * Used by the ts25e BenchScale row to measure the incremental
    * trainer at real merge depth.
    */
  def vocabStress(docs: DataFrame, wordsPerDoc: Int = 8): DataFrame = {
    // per-letter xxhash64 of (doc_id, word slot, letter slot): affine
    // integer mixes mod 26 collapse to arithmetic progressions (≤26²
    // distinct words no matter how many docs); a real hash per letter
    // samples the full 26^8 word space
    val words = transform(sequence(lit(0), lit(wordsPerDoc - 1)),
      j => concat_ws("", transform(sequence(lit(0), lit(7)), i =>
        chr(lit(97) + pmod(xxhash64(col("doc_id"), j, i), lit(26))))))
    docs.select(col("doc_id"),
      concat(col("text"), lit(" "), concat_ws(" ", words)).as("text"),
      col("lang"), col("source"))
  }

  /** events ×n: event_id' = event_id·n + rep; variants keep their
    * window (same ts) and group (same event_type) but perturb `value`
    * by a deterministic per-rep cent so the per-group value sets GROW
    * with n — the adversarial shape for distinct-bounded sketches
    * (forces the compaction path, not just bigger exact heads).
    */
  def inflateEvents(events: DataFrame, n: Int): DataFrame =
    events
      .select(col("*"), explode(sequence(lit(0), lit(n - 1))).as("rep"))
      .select(
        (col("event_id") * n + col("rep")).as("event_id"),
        col("ts"), col("user_id"), col("event_type"),
        (col("value") + col("rep").cast("double") * lit(0.0001) *
          pmod(col("event_id"), lit(997)).cast("double")).as("value"),
        col("props"))

  /** A synthetic APDB at benchmark scale: `nObjects` sky objects
    * re-versioned across `nChunks` ~10-minute replica chunks, one
    * DiaSource + one DiaForcedSource per object per chunk (the
    * reference's fill_apdb shape, P/tests/_ppdb.py:120-161), generated
    * EXECUTOR-side with `spark.range` — unlike the spec fixtures, no row
    * ever materializes on the driver, so nObjects can be millions.
    * Chunks 2.. also carry `updatesPerChunk` field-level update records
    * against chunk-1 rows, exercising the LWW patch-merge path of
    * promotion at the same scale.
    */
  final class ScaleApdb(spark: SparkSession, nObjects: Long, nChunks: Int,
      updatesPerChunk: Int = 0) extends ApdbSource {

    val baseMjd = 60000.0
    val chunkUs: Long = 600L * 1000000L

    override def listChunks(): DataFrame =
      spark.range(1, nChunks + 1L).select(
        col("id").as("apdb_replica_chunk"),
        (col("id") * chunkUs).as("last_update_time_us"),
        concat(lit("uuid-"), col("id")).as("unique_id"))

    override def chunkData(id: Long): ChunkData = {
      val mjd = baseMjd + id * 0.007
      val base = spark.range(nObjects)
      val even = col("id") % 2 === 0
      val ra = when(even, lit(45.0) + col("id") * 0.00001)
        .otherwise(lit(225.0) + col("id") * 0.00001).as("ra")
      val dec = when(even, lit(-30.0)).otherwise(lit(30.0)).as("dec")
      val objs = base.select(
        (col("id") + 1000L).as("diaObjectId"),
        lit(mjd).as("validityStartMjdTai"),
        lit(null).cast("double").as("validityEndMjdTai"),
        ra, dec,
        lit(null).cast("float").as("parallax"),
        lit(id.toInt).as("nDiaSources"),
        lit(baseMjd).as("firstDiaSourceMjdTai"))
      val srcs = base.select(
        (lit(id) * 100000000L + col("id")).as("diaSourceId"),
        lit(id).as("visit"),
        (col("id") % 4).cast("short").as("detector"),
        (col("id") + 1000L).as("diaObjectId"),
        lit(null).cast("long").as("ssObjectId"),
        lit(null).cast("long").as("parentDiaSourceId"),
        ra, dec,
        lit(null).cast("double").as("ssObjectReassocTimeMjdTai"),
        lit(mjd).as("midpointMjdTai"),
        lit(null).cast("boolean").as("centroid_flag"),
        lit(mjd).as("timeProcessedMjdTai"),
        lit(null).cast("double").as("timeWithdrawnMjdTai"))
      val fsrcs = base.select(
        (col("id") + 1000L).as("diaObjectId"),
        ra, dec,
        lit(id).as("visit"),
        (col("id") % 4).cast("short").as("detector"),
        lit(mjd).as("midpointMjdTai"),
        lit(0L).as("flags"),
        lit(mjd).as("timeProcessedMjdTai"),
        lit(null).cast("double").as("timeWithdrawnMjdTai"))
      val updates: Seq[(Long, UpdateRecord)] =
        if (id < 2 || updatesPerChunk == 0) Nil
        else (0 until updatesPerChunk).map { k =>
          val tNs = id * chunkUs * 1000L + k
          id -> (UpdateRecord.UpdateNDiaSources(tNs, k.toLong,
            1000L + k % nObjects, id.toInt * 10): UpdateRecord)
        }
      ChunkData(id, s"uuid-$id", id * chunkUs, objs, srcs, fsrcs, updates)
    }
  }

  /** embeddings ×n: vec_id' = vec_id·n + rep; variants 1.. get a small
    * deterministic per-rep offset on every dimension — distinct vectors,
    * same neighborhood structure.
    */
  def inflateEmbeddings(emb: DataFrame, n: Int): DataFrame =
    emb
      .select(col("*"), explode(sequence(lit(0), lit(n - 1))).as("rep"))
      .select(
        (col("vec_id") * n + col("rep")).as("vec_id"),
        transform(col("embedding"),
          x => (x + col("rep").cast("float") * lit(0.0013f)).cast("float"))
          .as("embedding"),
        col("label"))
}
