package graft.cli

import org.apache.spark.sql.{Row, SparkSession}

import graft.catalog.{SchemaRegistry, VersionedCatalog}
import graft.replicate._
import graft.schema.PpdbSchema

/** Command-line entry points mirroring the reference's CLI surface
  * (P/cli/ppdb_replication.py: create / run / upload / promote /
  * list-chunks).
  *
  * Usage:
  *   runMain graft.cli.Cli create <catalogRoot>
  *   runMain graft.cli.Cli list-chunks <catalogRoot>
  *   runMain graft.cli.Cli upload <catalogRoot> <exportRoot> <remoteRoot>
  *   runMain graft.cli.Cli promote <catalogRoot> <exportRoot>
  *   runMain graft.cli.Cli demo <catalogRoot> [nObjects nChunks]
  *   runMain graft.cli.Cli vacuum <catalogRoot>
  */
object Cli {

  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "create" :: root :: Nil =>
      val spark = session()
      val ppdb = new PpdbSpark(spark,
        new VersionedCatalog(root, VersionedCatalog.ppdbWriteOptions))
      ppdb.init()
      val reg = new SchemaRegistry(root)
      Seq("DiaObject" -> PpdbSchema.diaObject,
        "DiaSource" -> PpdbSchema.diaSource,
        "DiaForcedSource" -> PpdbSchema.diaForcedSource,
        "PpdbReplicaChunk" -> PpdbSchema.replicaChunk)
        .foreach { case (t, sc) => reg.put(t, sc) }
      println(s"created catalog at $root (tables: ${reg.tables.mkString(", ")})")
      spark.stop()

    case "list-chunks" :: root :: Nil =>
      val spark = session()
      new PpdbSpark(spark, new VersionedCatalog(root))
        .replicaChunks().show(1000, truncate = false)
      spark.stop()

    case "upload" :: root :: exportRoot :: remoteRoot :: Nil =>
      val spark = session()
      val promoter = new Promoter(spark, new VersionedCatalog(root), exportRoot)
      promoter.init()
      val uploader = new ChunkUploader(spark, promoter, remoteRoot,
        exitOnEmpty = true,
        exitOnError = sys.env.get("GRAFT_EXIT_ON_ERROR").contains("1"))
      val ids = uploader.runOnce()
      println(if (ids.isEmpty) "nothing to upload"
        else s"uploaded chunks ${ids.mkString(", ")} to $remoteRoot")
      spark.stop()

    case "promote" :: root :: exportRoot :: Nil =>
      val spark = session()
      val promoter = new Promoter(spark, new VersionedCatalog(root), exportRoot)
      promoter.init()
      val ids = promoter.promote()
      println(if (ids.isEmpty) "nothing promotable"
        else s"promoted chunks ${ids.mkString(", ")}")
      spark.stop()

    case "vacuum" :: root :: Nil =>
      val removed = new VersionedCatalog(root).vacuum()
      println(s"removed $removed unreferenced version dirs")

    case "demo" :: root :: rest =>
      val (nObjects, nChunks) = rest match {
        case o :: c :: Nil => (o.toInt, c.toInt)
        case _ => (100, 4)
      }
      val spark = session()
      graft.Metrics.logEnabled = true
      val ppdb = new PpdbSpark(spark,
        new VersionedCatalog(root, VersionedCatalog.ppdbWriteOptions))
      ppdb.init()
      val source = new SyntheticApdb(spark, nObjects, nChunks)
      val copied = new Replicator(spark, source, ppdb)
        .runOnce(nowUs = Long.MaxValue / 2)
      println(s"replicated chunks: ${copied.mkString(", ")}")
      println(s"DiaObject rows: ${ppdb.catalog.read(spark, "DiaObject").count()}")
      println("latest snapshot: " +
        graft.ops.PpdbOps.latestSnapshot(
          ppdb.catalog.read(spark, "DiaObject")).count())
      graft.Metrics.summary().toSeq.sortBy(_._1).foreach {
        case (m, (n, s)) => println(f"  $m%-24s n=$n%-4d total=${s}%.2f s")
      }
      spark.stop()

    case other =>
      val known = Set("create", "list-chunks", "upload", "promote",
        "vacuum", "demo")
      val msg = other.headOption match {
        case Some(cmd) if known(cmd) =>
          s"missing arguments for: ${other.mkString(" ")}\n" +
            "usage: create <root> | list-chunks <root> | " +
            "upload <root> <exportRoot> <remoteRoot> | " +
            "promote <root> <exportRoot> | vacuum <root> | " +
            "demo <root> [nObjects nChunks]"
        case _ =>
          s"unknown command: ${other.mkString(" ")}\n" +
            "commands: create | list-chunks | upload | promote | vacuum | demo"
      }
      System.err.println(msg)
      sys.exit(2)
  }
}

/** Synthetic APDB source for the CLI demo (same shape as the test
  * generator: per chunk, every object gets a new version plus one
  * DiaSource and one DiaForcedSource row).
  */
final class SyntheticApdb(spark: SparkSession, nObjects: Int, nChunks: Int)
    extends ApdbSource {
  private val baseMjd = 60000.0
  private val chunkUs = 600L * 1000000L

  override def listChunks() = {
    val rows = (1L to nChunks.toLong).map(id =>
      Row(id, id * chunkUs, s"uuid-$id"))
    spark.createDataFrame(java.util.List.of(rows: _*),
      new org.apache.spark.sql.types.StructType()
        .add("apdb_replica_chunk", "long", nullable = false)
        .add("last_update_time_us", "long", nullable = false)
        .add("unique_id", "string", nullable = false))
  }

  override def chunkData(id: Long): ChunkData = {
    val mjd = baseMjd + id * 0.007
    val objRows = (0 until nObjects).map { i =>
      Row(1000L + i, mjd, null, (i * 0.036) % 360.0, (i % 180) - 90.0,
        null, id.toInt, baseMjd)
    }
    val srcRows = (0 until nObjects).map { i =>
      Row(id * 1000000L + i, id, (i % 9).toShort, 1000L + i, null, null,
        (i * 0.036) % 360.0, (i % 180) - 90.0, null, mjd, null, mjd, null)
    }
    val fsrcRows = (0 until nObjects).map { i =>
      Row(1000L + i, (i * 0.036) % 360.0, (i % 180) - 90.0, id,
        (i % 9).toShort, mjd, 0L, mjd, null)
    }
    ChunkData(id, s"uuid-$id", id * chunkUs,
      spark.createDataFrame(java.util.List.of(objRows: _*), PpdbSchema.diaObject),
      spark.createDataFrame(java.util.List.of(srcRows: _*), PpdbSchema.diaSource),
      spark.createDataFrame(java.util.List.of(fsrcRows: _*), PpdbSchema.diaForcedSource),
      Nil)
  }
}
