package graft.streaming

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.replicate.PpdbJdbc

/** Exactly-once Structured-Streaming sink into a live JDBC store.
  *
  * `foreachBatch` is at-least-once: a crash between the sink write and
  * the checkpoint commit redelivers the micro-batch. This sink makes the
  * write idempotent the transactional way (the same recipe the Spark
  * docs prescribe for JDBC sinks, and the streaming twin of
  * [[graft.replicate.PpdbJdbc.store]]'s per-chunk transaction): each
  * batch inserts a (sink_id, batch_id) marker row into `stream_commits`
  * AND the batch's data rows in ONE database transaction. A redelivered
  * batch trips the marker's primary key before any data lands → clean
  * skip; a crash mid-write rolls back marker and rows together → the
  * retry starts from nothing. Micro-batches are trigger-bounded, so the
  * driver-side materialization is bounded by batch size, not stream
  * history (same cost contract as chunk ingest).
  */
final class JdbcStreamSink(url: String, table: String, schema: StructType,
    sinkId: String) {
  require(schema.fields.forall(f => f.dataType match {
    case LongType | IntegerType | ShortType | DoubleType | FloatType |
         BooleanType | StringType => true
    case _ => false
  }), s"JdbcStreamSink supports flat primitive schemas, got $schema")

  /** Create the target table (no PK — an append stream) and the shared
    * `stream_commits` marker table when absent. Idempotent.
    */
  def init(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val existing = PpdbJdbc.listTables(conn)
      if (!existing.contains(table))
        PpdbJdbc.exec(conn, PpdbJdbc.createDdl(table, schema, Seq.empty))
      if (!existing.contains(JdbcStreamSink.CommitsTable))
        PpdbJdbc.exec(conn, PpdbJdbc.createDdl(JdbcStreamSink.CommitsTable,
          JdbcStreamSink.commitsSchema, Seq("sink_id", "batch_id")))
    } finally conn.close()
  }

  /** One micro-batch, transactionally: marker first (known batch id ⇒
    * replayed batch ⇒ skip before any data moves; the marker PK backstops
    * the probe), then the rows, then COMMIT. Returns true when the batch
    * landed, false when skipped as a replay.
    */
  def applyBatch(batch: DataFrame, batchId: Long): Boolean = {
    // materialize the micro-batch BEFORE opening the transaction: a
    // failed Spark job must surface its own error, not pin an open
    // transaction that conn.close() then rejects (Derby 25001)
    val rows: Array[Row] =
      batch.select(schema.fieldNames.map(col).toSeq: _*).collect()
    val conn = DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      val probe = conn.prepareStatement(
        s"""SELECT 1 FROM "${JdbcStreamSink.CommitsTable}"
           | WHERE "sink_id" = ? AND "batch_id" = ?""".stripMargin)
      val replayed =
        try { probe.setString(1, sinkId); probe.setLong(2, batchId)
          probe.executeQuery().next() }
        finally probe.close()
      if (replayed) { conn.rollback(); return false }
      try {
        PpdbJdbc.insertBatch(conn, JdbcStreamSink.CommitsTable,
          JdbcStreamSink.commitsSchema,
          Array(Row(sinkId, batchId, rows.length.toLong)))
        PpdbJdbc.insertBatch(conn, table, schema, rows)
        conn.commit()
        true
      } catch {
        // ONLY 23505 (duplicate key) means "replayed batch" — other
        // integrity violations (e.g. 23502 NOT NULL) are real failures
        // that must propagate so the stream retries the batch
        case e: java.sql.SQLException if PpdbJdbc.hasSqlState(e, "23505") =>
          conn.rollback(); false // concurrent replay lost the marker race
        case e: Throwable => conn.rollback(); throw e
      }
    } finally conn.close()
  }

  /** Keyed upsert variant — the `foreachBatch` MERGE pattern for
    * update-mode streaming aggregates: within the SAME marker
    * transaction, rows sharing the batch's key values are replaced
    * (delete + insert) instead of appended, so a re-aggregated window
    * overwrites its previous row and a replayed batch still skips
    * cleanly. Returns true when the batch landed.
    */
  def applyBatchUpsert(batch: DataFrame, batchId: Long,
      keys: Seq[String]): Boolean = {
    require(keys.nonEmpty && keys.forall(schema.fieldNames.contains),
      s"upsert keys $keys must be columns of $schema")
    val rows: Array[Row] =
      batch.select(schema.fieldNames.map(col).toSeq: _*).collect()
    val conn = DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      val probe = conn.prepareStatement(
        s"""SELECT 1 FROM "${JdbcStreamSink.CommitsTable}"
           | WHERE "sink_id" = ? AND "batch_id" = ?""".stripMargin)
      val replayed =
        try { probe.setString(1, sinkId); probe.setLong(2, batchId)
          probe.executeQuery().next() }
        finally probe.close()
      if (replayed) { conn.rollback(); return false }
      try {
        PpdbJdbc.insertBatch(conn, JdbcStreamSink.CommitsTable,
          JdbcStreamSink.commitsSchema,
          Array(Row(sinkId, batchId, rows.length.toLong)))
        val keyIdx = keys.map(schema.fieldIndex)
        val where = keys.map(k => s""""$k" = ?""").mkString(" AND ")
        val del = conn.prepareStatement(
          s"""DELETE FROM "$table" WHERE $where""")
        try {
          rows.foreach { r =>
            keyIdx.zipWithIndex.foreach { case (ri, i) =>
              PpdbJdbc.setParam(del, i + 1, schema(ri).dataType, r, ri)
            }
            del.addBatch()
          }
          del.executeBatch()
        } finally del.close()
        PpdbJdbc.insertBatch(conn, table, schema, rows)
        conn.commit()
        true
      } catch {
        case e: java.sql.SQLException if PpdbJdbc.hasSqlState(e, "23505") =>
          conn.rollback(); false
        case e: Throwable => conn.rollback(); throw e
      }
    } finally conn.close()
  }

  /** Plug into `df.writeStream.foreachBatch(sink.foreachBatchWriter)`. */
  def foreachBatchWriter: (org.apache.spark.sql.Dataset[Row], Long) => Unit =
    (batch, id) => { applyBatch(batch.toDF(), id); () }

  /** `foreachBatch` writer with [[applyBatchUpsert]] semantics. */
  def foreachBatchUpsertWriter(keys: Seq[String])
      : (org.apache.spark.sql.Dataset[Row], Long) => Unit =
    (batch, id) => { applyBatchUpsert(batch.toDF(), id, keys); () }
}

object JdbcStreamSink {
  val CommitsTable = "stream_commits"

  val commitsSchema: StructType = StructType(Seq(
    StructField("sink_id", StringType, nullable = false),
    StructField("batch_id", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = false)))
}
