package graft.schema

import org.apache.spark.sql.types._

/** Table schemas for the PPDB data model (re-expressed from the reference's
  * Felis YAML, python/lsst/dax/ppdb/resources/config/schemas/
  * test_apdb_schema.yaml:21-360).
  *
  * DiaObject is temporally versioned: one row per validity interval, PK
  * (diaObjectId, validityStartMjdTai), open interval has
  * validityEndMjdTai IS NULL. DiaSource / DiaForcedSource are append-only
  * fact tables. All science times are double MJD TAI.
  */
object PpdbSchema {

  /** Version of this data model (the reference test schema declares
    * 0.1.1, test_apdb_schema.yaml:4); stored in the metadata table and
    * compatibility-checked on reopen.
    */
  val schemaVersion: VersionTuple = VersionTuple(0, 1, 1)

  val diaObject: StructType = StructType(Seq(
    StructField("diaObjectId", LongType, nullable = false),
    StructField("validityStartMjdTai", DoubleType, nullable = false),
    StructField("validityEndMjdTai", DoubleType, nullable = true),
    StructField("ra", DoubleType, nullable = false),
    StructField("dec", DoubleType, nullable = false),
    StructField("parallax", FloatType, nullable = true),
    StructField("nDiaSources", IntegerType, nullable = false),
    StructField("firstDiaSourceMjdTai", DoubleType, nullable = true)))

  val diaSource: StructType = StructType(Seq(
    StructField("diaSourceId", LongType, nullable = false),
    StructField("visit", LongType, nullable = false),
    StructField("detector", ShortType, nullable = false),
    StructField("diaObjectId", LongType, nullable = true),
    StructField("ssObjectId", LongType, nullable = true),
    StructField("parentDiaSourceId", LongType, nullable = true),
    StructField("ra", DoubleType, nullable = false),
    StructField("dec", DoubleType, nullable = false),
    StructField("ssObjectReassocTimeMjdTai", DoubleType, nullable = true),
    StructField("midpointMjdTai", DoubleType, nullable = false),
    StructField("centroid_flag", BooleanType, nullable = true),
    StructField("timeProcessedMjdTai", DoubleType, nullable = false),
    StructField("timeWithdrawnMjdTai", DoubleType, nullable = true)))

  val diaForcedSource: StructType = StructType(Seq(
    StructField("diaObjectId", LongType, nullable = false),
    StructField("ra", DoubleType, nullable = false),
    StructField("dec", DoubleType, nullable = false),
    StructField("visit", LongType, nullable = false),
    StructField("detector", ShortType, nullable = false),
    StructField("midpointMjdTai", DoubleType, nullable = false),
    StructField("flags", LongType, nullable = false),
    StructField("timeProcessedMjdTai", DoubleType, nullable = false),
    StructField("timeWithdrawnMjdTai", DoubleType, nullable = true)))

  /** Materialized latest-version snapshot of DiaObject (the reference's
    * DiaObjectLast / public DiaObject CTAS, chunk_promoter.py:286-304).
    */
  val diaObjectLast: StructType = StructType(Seq(
    StructField("diaObjectId", LongType, nullable = false),
    StructField("validityStartMjdTai", DoubleType, nullable = false),
    StructField("ra", DoubleType, nullable = false),
    StructField("dec", DoubleType, nullable = false),
    StructField("parallax", FloatType, nullable = true),
    StructField("nDiaSources", IntegerType, nullable = false),
    StructField("firstDiaSourceMjdTai", DoubleType, nullable = true),
    StructField("cellId", LongType, nullable = false)))

  /** Replica-chunk bookkeeping (P/sql/_ppdb_sql_base.py:449-508 + BigQuery
    * extended columns, P/bigquery/ppdb_bigquery.py:351-397). Times are
    * epoch micros (TAI convention handled by TaiTime).
    */
  val replicaChunk: StructType = StructType(Seq(
    StructField("apdb_replica_chunk", LongType, nullable = false),
    StructField("last_update_time_us", LongType, nullable = false),
    StructField("unique_id", StringType, nullable = false),
    StructField("replica_time_us", LongType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("uri", StringType, nullable = true),
    StructField("update_count", LongType, nullable = true)))

  /** Long-format expanded field-level update rows
    * (P/bigquery/updates/expanded_update_record.py:33-113).
    */
  val expandedUpdates: StructType = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("record_id", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("field_name", StringType, nullable = false),
    StructField("value_json", StringType, nullable = true),
    StructField("apdb_replica_chunk", LongType, nullable = false),
    StructField("update_time_ns", LongType, nullable = false),
    StructField("update_order", LongType, nullable = false)))

  val metadata: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** Chunk lifecycle states (P/bigquery/ppdb_replica_chunk_extended.py:42-56). */
  object ChunkStatus {
    val Exported = "exported"
    val Uploaded = "uploaded"
    val Staged = "staged"
    val Promoted = "promoted"
    val Skipped = "skipped"
    val Failed = "failed"
  }

  val dataTables: Seq[String] = Seq("DiaObject", "DiaSource", "DiaForcedSource")
}

/** Typed update-record ADT — the six event types the reference replicates
  * (P/tests/_updates.py:44-149). Each expands to one long-format row per
  * patched field; `recordId` is the (composite) key of the target row, in
  * key order.
  */
sealed trait UpdateRecord {
  def updateTimeNs: Long
  def updateOrder: Long
  def tableName: String
  def recordId: Seq[Long]
  /** (field name, JSON-encoded new value) pairs. */
  def payload: Seq[(String, String)]
}

object UpdateRecord {
  private def j(v: Double): String = v.toString
  private def j(v: Long): String = v.toString
  private def j(v: Int): String = v.toString

  final case class ReassignDiaSourceToDiaObject(
      updateTimeNs: Long, updateOrder: Long,
      diaSourceId: Long, diaObjectId: Long) extends UpdateRecord {
    def tableName = "DiaSource"
    def recordId = Seq(diaSourceId)
    def payload = Seq("diaObjectId" -> j(diaObjectId))
  }

  final case class ReassignDiaSourceToSSObject(
      updateTimeNs: Long, updateOrder: Long,
      diaSourceId: Long, ssObjectId: Long,
      ssObjectReassocTimeMjdTai: Double) extends UpdateRecord {
    def tableName = "DiaSource"
    def recordId = Seq(diaSourceId)
    def payload = Seq(
      "ssObjectId" -> j(ssObjectId),
      "ssObjectReassocTimeMjdTai" -> j(ssObjectReassocTimeMjdTai))
  }

  final case class WithdrawDiaSource(
      updateTimeNs: Long, updateOrder: Long,
      diaSourceId: Long, timeWithdrawnMjdTai: Double) extends UpdateRecord {
    def tableName = "DiaSource"
    def recordId = Seq(diaSourceId)
    def payload = Seq("timeWithdrawnMjdTai" -> j(timeWithdrawnMjdTai))
  }

  final case class WithdrawDiaForcedSource(
      updateTimeNs: Long, updateOrder: Long,
      diaObjectId: Long, visit: Long, detector: Long,
      timeWithdrawnMjdTai: Double) extends UpdateRecord {
    def tableName = "DiaForcedSource"
    def recordId = Seq(diaObjectId, visit, detector)
    def payload = Seq("timeWithdrawnMjdTai" -> j(timeWithdrawnMjdTai))
  }

  final case class CloseDiaObjectValidity(
      updateTimeNs: Long, updateOrder: Long,
      diaObjectId: Long, validityEndMjdTai: Double,
      nDiaSources: Option[Int]) extends UpdateRecord {
    def tableName = "DiaObject"
    def recordId = Seq(diaObjectId)
    def payload = Seq("validityEndMjdTai" -> j(validityEndMjdTai)) ++
      nDiaSources.map(n => "nDiaSources" -> j(n))
  }

  final case class UpdateNDiaSources(
      updateTimeNs: Long, updateOrder: Long,
      diaObjectId: Long, nDiaSources: Int) extends UpdateRecord {
    def tableName = "DiaObject"
    def recordId = Seq(diaObjectId)
    def payload = Seq("nDiaSources" -> j(nDiaSources))
  }

  /** An update record rehydrated from storage (the parquet-staged APDB
    * wire format). Downstream processing consumes only the trait surface
    * (tableName / recordId / payload), so a typed subclass and its raw
    * round-trip behave identically.
    */
  final case class RawUpdate(
      updateTimeNs: Long, updateOrder: Long,
      tableName: String, recordId: Seq[Long],
      payload: Seq[(String, String)]) extends UpdateRecord
}
