package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned multi-table Parquet catalog with snapshot isolation and an
  * atomic multi-table commit — the Spark-native replacement for the
  * reference's zero-copy clone + atomic swap + single-transaction store
  * (P/bigquery/chunk_promoter.py:196-284, P/sql/_ppdb_sql.py:138-155).
  *
  * Layout:
  * {{{
  *   root/
  *     _CURRENT                      <- JSON pointer {commit, tables:{name: dataDir}}
  *     <table>/v000000N/ (parquet)   <- immutable version directories
  * }}}
  *
  * Semantics:
  *  - Readers resolve `_CURRENT` once and read immutable version dirs →
  *    snapshot isolation for free.
  *  - A commit writes NEW version dirs for the touched tables only, then
  *    atomically replaces `_CURRENT` (tmp file + ATOMIC_MOVE). Untouched
  *    tables keep their old dirs in the new pointer — that IS the
  *    reference's zero-copy clone (S12), with no data movement.
  *  - Crash anywhere before the pointer move publishes nothing; orphan
  *    version dirs are garbage-collected by [[vacuum]].
  *  - Single-writer assumption, like the reference's replication pipeline.
  *
  * At 100 TB the pointer file is O(#tables) bytes; commits cost only the
  * rewritten partitions plus one metadata rename, and a snapshot read
  * never blocks a concurrent commit.
  */
final class VersionedCatalog(val root: String) {

  private val rootPath: Path = Paths.get(root)
  private val pointer: Path = rootPath.resolve("_CURRENT")

  Files.createDirectories(rootPath)

  /** Current pointer state: commit id and table → data dir. */
  def current: (Long, Map[String, String]) =
    if (!Files.exists(pointer)) (0L, Map.empty)
    else parse(new String(Files.readAllBytes(pointer), StandardCharsets.UTF_8))

  def tables: Set[String] = current._2.keySet

  def exists(table: String): Boolean = current._2.contains(table)

  /** Snapshot read of one table at the current commit. */
  def read(spark: SparkSession, table: String): DataFrame = {
    val dirs = current._2
    val dir = dirs.getOrElse(table,
      throw new IllegalArgumentException(
        s"table '$table' not in catalog $root (have ${dirs.keys.mkString(",")})"))
    spark.read.parquet(dir)
  }

  /** Atomically publish new contents for `writes` (other tables keep their
    * current version dirs). Each DataFrame is fully materialized to a new
    * immutable version dir before the pointer moves; a crash mid-commit
    * publishes nothing.
    */
  def commit(writes: Map[String, DataFrame]): Long = synchronized {
    val (commitId, dirs) = current
    val next = commitId + 1
    val newDirs = writes.map { case (table, df) =>
      val dir = rootPath.resolve(table).resolve(f"v$next%08d").toString
      df.write.mode("overwrite").parquet(dir)
      table -> dir
    }
    publish(next, dirs ++ newDirs)
    next
  }

  /** Zero-copy clone: register `from`'s current data dir under a new table
    * name. No data is read or written (the reference's CREATE TABLE CLONE).
    */
  def clone(from: String, to: String): Unit = synchronized {
    val (commitId, dirs) = current
    val src = dirs.getOrElse(from,
      throw new IllegalArgumentException(s"clone source '$from' missing"))
    publish(commitId + 1, dirs + (to -> src))
  }

  /** Drop a table from the pointer (data dirs remain until vacuum). */
  def drop(table: String): Unit = synchronized {
    val (commitId, dirs) = current
    publish(commitId + 1, dirs - table)
  }

  /** Delete version dirs no longer referenced by `_CURRENT`. */
  def vacuum(): Int = synchronized {
    val live = current._2.values.map(Paths.get(_).toAbsolutePath.toString).toSet
    var removed = 0
    if (Files.exists(rootPath)) {
      Files.list(rootPath).iterator().asScala
        .filter(p => Files.isDirectory(p)).foreach { tableDir =>
          Files.list(tableDir).iterator().asScala
            .filter(p => Files.isDirectory(p))
            .filter(p => !live.contains(p.toAbsolutePath.toString))
            .foreach { dead => deleteRecursively(dead); removed += 1 }
        }
    }
    removed
  }

  private def publish(commitId: Long, dirs: Map[String, String]): Unit = {
    val tmp = rootPath.resolve(s"_CURRENT.tmp.$commitId")
    Files.write(tmp, render(commitId, dirs).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  // minimal flat JSON (no nested quoting needed: paths and table names)
  private def render(commitId: Long, dirs: Map[String, String]): String = {
    val entries = dirs.toSeq.sortBy(_._1)
      .map { case (t, d) => s""""${esc(t)}":"${esc(d)}"""" }
      .mkString(",")
    s"""{"commit":$commitId,"tables":{$entries}}"""
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def parse(json: String): (Long, Map[String, String]) = {
    val commit = """"commit"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong).getOrElse(0L)
    val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    val tablesBody = json.indexOf("\"tables\"") match {
      case -1 => ""
      case i => json.substring(json.indexOf('{', i) + 1)
    }
    val dirs = entry.findAllMatchIn(tablesBody)
      .map(m => unesc(m.group(1)) -> unesc(m.group(2))).toMap
    (commit, dirs)
  }

  private def unesc(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
