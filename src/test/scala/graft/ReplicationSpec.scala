package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.VersionedCatalog
import graft.ops.PpdbOps
import graft.replicate._
import graft.schema.{PpdbSchema, UpdateRecord}
import graft.schema.UpdateRecord._

/** Synthetic APDB: `nObjects` objects across two sky regions observed over
  * `nChunks` 10-minute replica chunks, each visit re-versioning every
  * object and emitting one DiaSource + one DiaForcedSource per object
  * (the reference's fill_apdb shape, P/tests/_ppdb.py:120-161).
  */
class TestApdb(spark: SparkSession, nObjects: Int, nChunks: Int,
    extraUpdates: Map[Long, Seq[(Long, UpdateRecord)]] = Map.empty)
    extends ApdbSource {

  val baseMjd = 60000.0
  val chunkUs: Long = 600L * 1000000L

  def chunkIds: Seq[Long] = (1L to nChunks.toLong)
  def updateTimeUs(id: Long): Long = id * chunkUs

  override def listChunks(): DataFrame = {
    val rows = chunkIds.map(id => Row(id, updateTimeUs(id), s"uuid-$id"))
    spark.createDataFrame(java.util.List.of(rows: _*),
      new org.apache.spark.sql.types.StructType()
        .add("apdb_replica_chunk", "long", nullable = false)
        .add("last_update_time_us", "long", nullable = false)
        .add("unique_id", "string", nullable = false))
  }

  override def chunkData(id: Long): ChunkData = {
    val mjd = baseMjd + id * 0.007 // ~10 min per chunk
    val objRows = (0 until nObjects).map { i =>
      val (ra, dec) = if (i % 2 == 0) (45.0 + i * 0.01, -30.0)
        else (225.0 + i * 0.01, 30.0)
      Row(1000L + i, mjd, null, ra, dec, null, id.toInt, baseMjd)
    }
    val srcRows = (0 until nObjects).map { i =>
      Row(id * 100000L + i, id, (i % 4).toShort, 1000L + i, null, null,
        45.0, -30.0, null, mjd, null, mjd, null)
    }
    val fsrcRows = (0 until nObjects).map { i =>
      Row(1000L + i, 45.0, -30.0, id, (i % 4).toShort, mjd, 0L, mjd, null)
    }
    ChunkData(id, s"uuid-$id", updateTimeUs(id),
      spark.createDataFrame(java.util.List.of(objRows: _*), PpdbSchema.diaObject),
      spark.createDataFrame(java.util.List.of(srcRows: _*), PpdbSchema.diaSource),
      spark.createDataFrame(java.util.List.of(fsrcRows: _*), PpdbSchema.diaForcedSource),
      extraUpdates.getOrElse(id, Nil))
  }
}

class ReplicationSpec extends SparkSpec {
  import spark.implicits._

  private def freshPpdb(): PpdbSpark = {
    val p = new PpdbSpark(spark, new VersionedCatalog(tmpDir("ppdb")))
    p.init(); p
  }

  val farFuture: Long = 100L * 24 * 3600 * 1000000L

  test("end-to-end: replicate all chunks, validity chains correct") {
    val apdb = new TestApdb(spark, nObjects = 10, nChunks = 3)
    val ppdb = freshPpdb()
    val rep = new Replicator(spark, apdb, ppdb)
    val copied = rep.runOnce(nowUs = farFuture)
    assert(copied == Seq(1L, 2L, 3L))

    val objects = ppdb.catalog.read(spark, "DiaObject")
    assert(objects.count() == 30, "3 versions x 10 objects")
    // per object: versions at start(1) < start(2) < start(3); first two
    // closed by the successor, last open
    val byObj = objects.collect()
      .groupBy(_.getLong(0)).view.mapValues { rows =>
        rows.sortBy(_.getDouble(1)).map(r => Option(r.get(2))).toSeq
      }.toMap
    assert(byObj.size == 10)
    byObj.values.foreach { ends =>
      assert(ends.length == 3)
      assert(ends(0).isDefined && ends(1).isDefined && ends(2).isEmpty)
    }
    assert(ppdb.catalog.read(spark, "DiaSource").count() == 30)
    assert(ppdb.catalog.read(spark, "DiaForcedSource").count() == 30)
    // latest snapshot: exactly one open row per object
    assert(PpdbOps.latestSnapshot(objects).count() == 10)
  }

  test("fact tables ingest as appends, not rewrites (100 TB posture)") {
    val apdb = new TestApdb(spark, 5, 3)
    val ppdb = freshPpdb()
    new Replicator(spark, apdb, ppdb).runOnce(nowUs = farFuture)
    val (_, dirs) = ppdb.catalog.current
    // init dir + one labeled append dir per chunk, original dir intact
    assert(dirs("DiaSource").size == 4, dirs("DiaSource").mkString(","))
    assert(dirs("DiaForcedSource").size == 4)
    assert(dirs("DiaSource").exists(_.contains("v00000001")),
      "initial version dir never rewritten")
    assert(dirs("DiaSource").count(_.contains("_chunk")) == 3)
  }

  test("exactly-once: second poll copies nothing and changes nothing") {
    val apdb = new TestApdb(spark, 5, 2)
    val ppdb = freshPpdb()
    val rep = new Replicator(spark, apdb, ppdb)
    assert(rep.runOnce(nowUs = farFuture).nonEmpty)
    val commitBefore = ppdb.catalog.current._1
    assert(rep.runOnce(nowUs = farFuture).isEmpty)
    assert(ppdb.catalog.current._1 == commitBefore, "no new commit")
  }

  test("settled gating holds back the newest chunk until maxWait") {
    val apdb = new TestApdb(spark, 3, 3)
    val ppdb = freshPpdb()
    val rep = new Replicator(spark, apdb, ppdb,
      ReplicatorConfig(minWaitUs = 1000L, maxWaitUs = 10L * 600L * 1000000L))
    // just after chunk 3 lands: chunks 1,2 settled via minWait (newer
    // exists), chunk 3 too young for maxWait
    val copied = rep.runOnce(nowUs = apdb.updateTimeUs(3) + 2000L)
    assert(copied == Seq(1L, 2L))
    // much later: chunk 3 passes maxWait
    assert(rep.runOnce(nowUs = farFuture) == Seq(3L))
  }

  test("unique_id mismatch aborts the poll") {
    val apdb = new TestApdb(spark, 3, 2)
    val ppdb = freshPpdb()
    new Replicator(spark, apdb, ppdb).runOnce(nowUs = farFuture)
    // second source claiming different uuid for an already-copied chunk
    val evil = new TestApdb(spark, 3, 2) {
      override def listChunks(): DataFrame =
        super.listChunks().withColumn("unique_id", lit("uuid-evil"))
    }
    intercept[IllegalStateException] {
      new Replicator(spark, evil, ppdb).runOnce(nowUs = farFuture)
    }
  }

  test("update records in later chunks patch earlier rows (T6)") {
    val t0 = 1640995200000000000L
    val updates = Map(3L -> Seq(
      // reassign a chunk-1 source; two conflicting patches, later wins
      (3L, ReassignDiaSourceToDiaObject(t0, 0, 100001L, 1005L): UpdateRecord),
      (3L, ReassignDiaSourceToDiaObject(t0 + 1000000000L, 1, 100001L, 1007L): UpdateRecord),
      // withdraw a chunk-2 forced source (composite key)
      (3L, WithdrawDiaForcedSource(t0, 2, 1002L, 2L, 2L, 60021.0): UpdateRecord)))
    val apdb = new TestApdb(spark, 10, 3, updates)
    val ppdb = freshPpdb()
    new Replicator(spark, apdb, ppdb).runOnce(nowUs = farFuture)

    val src = ppdb.catalog.read(spark, "DiaSource")
      .where($"diaSourceId" === 100001L).collect()
    assert(src.length == 1 && src.head.getLong(3) == 1007L,
      "last-write-wins reassign applied")
    val fsrc = ppdb.catalog.read(spark, "DiaForcedSource")
      .where($"diaObjectId" === 1002L && $"visit" === 2L && $"detector" === 2)
      .collect()
    assert(fsrc.length == 1 && fsrc.head.getDouble(8) == 60021.0)

    // partition-scoped patching: only the chunk dirs holding patched keys
    // were dereferenced; every other chunk's dir carried over untouched
    val dirs = ppdb.catalog.current._2
    assert(!dirs("DiaSource").exists(_.endsWith("_chunk1")),
      "patched DiaSource chunk-1 dir dereferenced")
    assert(dirs("DiaSource").exists(_.endsWith("_chunk2")),
      "untouched DiaSource chunk-2 dir survives")
    assert(dirs("DiaForcedSource").exists(_.endsWith("_chunk1")),
      "untouched DiaForcedSource chunk-1 dir survives")
    assert(!dirs("DiaForcedSource").exists(_.endsWith("_chunk2")),
      "patched DiaForcedSource chunk-2 dir dereferenced")
  }

  test("dangling update record aborts the chunk store (J6)") {
    val t0 = 1640995200000000000L
    val updates = Map(1L -> Seq(
      (1L, WithdrawDiaSource(t0, 0, 999999L, 60000.0): UpdateRecord)))
    val apdb = new TestApdb(spark, 3, 1, updates)
    val ppdb = freshPpdb()
    intercept[IllegalStateException] {
      new Replicator(spark, apdb, ppdb).runOnce(nowUs = farFuture)
    }
    // nothing published
    assert(ppdb.catalog.read(spark, "DiaObject").count() == 0)
  }
}
