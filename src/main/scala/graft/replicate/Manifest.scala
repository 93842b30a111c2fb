package graft.replicate

import java.io.{File, FileInputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

/** Per-chunk manifest: one JSON file describing the chunk directory's
  * parquet files (row counts, sha256, sizes) plus chunk-level flags —
  * the integrity contract between export and load stages
  * (P/bigquery/manifest.py:44-224).
  */
final case class ManifestEntry(table: String, fileName: String,
    rowCount: Long, sha256: String, sizeBytes: Long)

final case class ChunkManifest(chunkId: Long, schemaVersion: String,
    isEmptyChunk: Boolean, updateCount: Long, entries: Seq[ManifestEntry]) {

  def render: String = {
    val es = entries.map { e =>
      s"""{"table":"${e.table}","file":"${e.fileName}","row_count":${e.rowCount},""" +
        s""""sha256":"${e.sha256}","size_bytes":${e.sizeBytes}}"""
    }.mkString("[", ",", "]")
    s"""{"chunk_id":$chunkId,"schema_version":"$schemaVersion",""" +
      s""""is_empty_chunk":$isEmptyChunk,"update_count":$updateCount,""" +
      s""""entries":$es}"""
  }
}

object ChunkManifest {
  val FileName = "manifest.json"

  def sha256Of(f: File): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val in = new FileInputStream(f)
    try {
      val buf = new Array[Byte](1 << 20)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** Build a manifest over the parquet files of `tableDirs` (table →
    * directory written for this chunk) with externally-counted rows.
    */
  def build(chunkId: Long, schemaVersion: String, updateCount: Long,
      tableDirs: Map[String, String], rowCounts: Map[String, Long]): ChunkManifest = {
    val entries = tableDirs.toSeq.sortBy(_._1).flatMap { case (table, dir) =>
      val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
      files.map { f =>
        // file name relative to the chunk dir (files live in per-table subdirs)
        ManifestEntry(table, s"$table/${f.getName}",
          rowCounts.getOrElse(table, 0L), sha256Of(f), f.length())
      }
    }
    ChunkManifest(chunkId, schemaVersion,
      isEmptyChunk = rowCounts.values.forall(_ == 0L), updateCount, entries)
  }

  def write(m: ChunkManifest, dir: String): Unit =
    Files.write(Paths.get(dir, FileName),
      m.render.getBytes(StandardCharsets.UTF_8))

  /** Parse + validate a written manifest: files must exist with matching
    * size and checksum (chunk_uploader.py:214-231 semantics). Returns
    * human-readable problems; empty = valid.
    */
  def validate(dir: String): Seq[String] = {
    val f = Paths.get(dir, FileName)
    if (!Files.exists(f)) return Seq(s"missing $FileName in $dir")
    val json = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
    val entry = """\{"table":"([^"]*)","file":"([^"]*)","row_count":(\d+),"sha256":"([^"]*)","size_bytes":(\d+)\}""".r
    entry.findAllMatchIn(json).flatMap { m =>
      val file = new File(dir, m.group(2))
      if (m.group(2).contains("..") || m.group(2).startsWith("/") ||
          m.group(2).count(_ == '/') > 1)
        Seq(s"unsafe file name ${m.group(2)}")
      else if (!file.exists()) Seq(s"missing file ${m.group(2)}")
      else if (file.length() != m.group(5).toLong)
        Seq(s"size mismatch for ${m.group(2)}")
      else if (sha256Of(file) != m.group(4))
        Seq(s"sha256 mismatch for ${m.group(2)}")
      else Nil
    }.toSeq
  }
}
