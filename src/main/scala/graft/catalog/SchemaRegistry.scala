package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.types.{DataType, StructType}

import graft.schema.VersionTuple

/** Declared-schema registry persisted next to the catalog data (the
  * reference's Felis-YAML-driven table management + version compat checks,
  * P/sql/_ppdb_sql_base.py:374-447 and 333-372, re-expressed over Spark's
  * own StructType JSON serialization).
  *
  * One JSON file per table under `root/_schemas/<table>.json` carrying the
  * StructType and the writer's schema version. [[check]] enforces the
  * VersionTuple compatibility rule before a table is opened.
  */
final class SchemaRegistry(root: String) {

  private val dir: Path = Paths.get(root, "_schemas")
  Files.createDirectories(dir)

  // injective escape (same scheme as VersionedCatalog.bucketedName):
  // '_' doubles before '/' maps to '_1', so distinct tables like `a/b`
  // and `a_b` can never collide on one schema file
  private def enc(table: String): String =
    table.replace("_", "__").replace("/", "_1")

  private def dec(name: String): String =
    """__|_1""".r.replaceAllIn(name,
      m => if (m.matched == "__") "_" else "/")

  private def fileOf(table: String): Path =
    dir.resolve(enc(table) + ".json")

  // earlier builds escaped only '/'→'_' (not injective); their files must
  // keep resolving, so reads fall back to — and migrate away from — the
  // legacy name when the current-scheme file is absent
  private def legacyFileOf(table: String): Path =
    dir.resolve(table.replace("/", "_") + ".json")

  private def escJ(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def unescJ(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  private def recordedTable(json: String): Option[String] =
    """"table"\s*:\s*"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(json)
      .map(m => unescJ(m.group(1)))

  /** Whether `table` may claim the legacy file holding `json`. Files
    * that record their owner (every new write does) are matched exactly
    * — `a_b` can never resolve, migrate, or delete a file recorded for
    * `a/b`. A file predating owner recording is claimable only by its
    * IDENTITY preimage (the '/'-free reading of the filename): a legacy
    * name like `a_b.json` is ambiguous between `a_b` and `a/b` by the
    * old scheme's design, and every name this system ever generated is
    * '/'-free, so the literal-name claimant is the owner of record and
    * a slash-name claim on an unowned file is refused.
    */
  private def legacyOwned(table: String, json: String): Boolean =
    recordedTable(json) match {
      case Some(owner) => owner == table
      case None => !table.contains("/")
    }

  def put(table: String, schema: StructType,
      version: VersionTuple = VersionTuple.Current): Unit = {
    val json = s"""{"table":"${escJ(table)}",""" +
      s""""version":"${version.render}","schema":${schema.json}}"""
    val tmp = dir.resolve(s".${enc(table)}.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, fileOf(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // retire a legacy-named twin (if it is really OURS) or tables()
    // would list the table twice
    val legacy = legacyFileOf(table)
    if (legacy != fileOf(table) && Files.exists(legacy) &&
        legacyOwned(table,
          new String(Files.readAllBytes(legacy), StandardCharsets.UTF_8)))
      Files.deleteIfExists(legacy)
    ()
  }

  def get(table: String): Option[(VersionTuple, StructType)] = {
    val f = fileOf(table)
    if (!Files.exists(f)) {
      val legacy = legacyFileOf(table)
      if (legacy != f && Files.exists(legacy) &&
          legacyOwned(table, new String(Files.readAllBytes(legacy),
            StandardCharsets.UTF_8))) {
        // migrate on first read so listing/decoding converges on the
        // injective scheme (legacy names containing '_' would otherwise
        // decode wrong in tables() forever). Concurrent readers (the
        // run/upload/promote services share one catalog root) can race
        // this move — the loser's exception means the winner already
        // populated fileOf(table), so swallow and fall through to the
        // re-check below rather than failing a read.
        try Files.move(legacy, f, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.NoSuchFileException |
               _: java.nio.file.FileAlreadyExistsException => ()
        }
      }
    }
    if (!Files.exists(f)) None
    else {
      val json = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      val v = """"version"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(json)
        .map(m => VersionTuple.parse(m.group(1)))
        .getOrElse(VersionTuple.Current)
      val schemaJson = json.substring(json.indexOf("\"schema\":") + 9,
        json.length - 1)
      Some((v, DataType.fromJson(schemaJson).asInstanceOf[StructType]))
    }
  }

  /** Delete a table's declared schema (both filename schemes; the legacy
    * file only when it is verifiably this table's).
    */
  def remove(table: String): Unit = {
    Files.deleteIfExists(fileOf(table))
    val legacy = legacyFileOf(table)
    if (Files.exists(legacy) && legacyOwned(table,
        new String(Files.readAllBytes(legacy), StandardCharsets.UTF_8)))
      Files.deleteIfExists(legacy)
    ()
  }

  def tables: Seq[String] = {
    import scala.jdk.CollectionConverters._
    val stream = Files.list(dir)
    try stream.iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".json") && !n.startsWith("."))
      .map(n => dec(n.stripSuffix(".json"))).toSeq.sorted
    finally stream.close()
  }

  /** Enforce the compat rule: running code must be able to read what was
    * written. Throws with a precise message otherwise.
    */
  def check(table: String,
      code: VersionTuple = VersionTuple.Current): StructType =
    get(table) match {
      case None =>
        throw new IllegalStateException(s"no declared schema for '$table'")
      case Some((stored, schema)) =>
        if (!code.compatibleWith(stored))
          throw new IllegalStateException(
            s"schema version mismatch for '$table': stored ${stored.render}, " +
              s"code ${code.render} (majors must match, code minor >= stored)")
        schema
    }
}
