package graft.replicate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.PpdbOps

/** An APDB-side chunk source (the process boundary the reference crosses
  * via its APDB client, P/replicator.py:165-191).
  */
trait ApdbSource {
  /** Chunk descriptors: (apdb_replica_chunk, last_update_time_us, unique_id). */
  def listChunks(): DataFrame
  def chunkData(chunkId: Long): ChunkData
}

/** Replication gating/cadence knobs (defaults from P/cli/options.py:105-124,
  * in micros).
  */
final case class ReplicatorConfig(
    minWaitUs: Long = 300L * 1000000L,
    maxWaitUs: Long = 900L * 1000000L,
    checkIntervalUs: Long = 360L * 1000000L)

/** The replication driver loop (P/replicator.py:193-247): list both sides,
  * consistency-check the overlap, compute the not-yet-copied frontier,
  * gate on settledness, and copy chunks strictly in ascending id order.
  * One `runOnce` = one poll.
  */
final class Replicator(spark: SparkSession, source: ApdbSource, ppdb: PpdbSpark,
    config: ReplicatorConfig = ReplicatorConfig()) {

  /** One poll; returns the chunk ids copied. */
  def runOnce(nowUs: Long = System.currentTimeMillis() * 1000L): Seq[Long] = {
    val apdbChunks = source.listChunks().cache()
    val ppdbChunks = ppdb.replicaChunks().cache()

    // T4/J8: same chunk id must carry the same unique_id on both sides
    val mism = PpdbOps.chunkMismatches(apdbChunks, ppdbChunks).limit(1).collect()
    if (mism.nonEmpty)
      throw new IllegalStateException(
        s"chunk unique_id mismatch between APDB and PPDB: ${mism.head}")

    // J7 frontier + T2 settled gate, ascending order (T3)
    val frontier = PpdbOps.frontier(apdbChunks, ppdbChunks)
    val settled = PpdbOps.settledChunks(frontier, nowUs,
      config.minWaitUs, config.maxWaitUs)
    val ids = settled.select("apdb_replica_chunk")
      .orderBy("apdb_replica_chunk").collect().map(_.getLong(0)).toSeq

    ids.foreach { id =>
      graft.Metrics.time("replicate_chunk_time", "chunk_id" -> id.toString) {
        val data = graft.Metrics.time("get_chunks_time",
          "chunk_id" -> id.toString)(source.chunkData(id))
        graft.Metrics.time("store_chunks_time",
          "chunk_id" -> id.toString)(ppdb.store(data))
      }
    }
    ids
  }
}
