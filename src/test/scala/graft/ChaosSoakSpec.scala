package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.catalog.VersionedCatalog
import graft.replicate._
import graft.schema.PpdbSchema.ChunkStatus

/** The three reference services — replicate (export), upload, promote —
  * racing CONCURRENTLY over one catalog while the soak controller injects
  * the failures the reference's deployment docs call out
  * (P/bigquery/chunk_uploader.py:57-75 rollback, chunk_promoter.py:117-348
  * atomicity): a tampered chunk file mid-upload, a crash between a promote
  * commit's data writes and its pointer move, and continuous
  * optimistic-concurrency contention on the chunk-status table. The end
  * state must be byte-equivalent to a failure-free serial run: every chunk
  * applied exactly once, validity chains intact, no partial publish ever
  * observable, catalog reopenable cold.
  */
class ChaosSoakSpec extends SparkSpec {

  private val far = Long.MaxValue / 4

  test("chaos soak: concurrent run+upload+promote survive a tampered " +
      "chunk, a crash before publish, and CAS contention — exactly-once, " +
      "no partial state, recoverable catalog") {
    val nObjects = 6
    val nChunks = 10
    val catRoot = tmpDir("soak-cat")
    // short orphan grace: the induced crash leaves an orphaned commit
    // claim, and the surviving services must usurp it promptly
    val cat = new VersionedCatalog(catRoot, orphanGraceMs = 300L)
    val promoter = new Promoter(spark, cat, tmpDir("soak-export"))
    promoter.init()
    val apdb = new TestApdb(spark, nObjects, nChunks)
    val replicator =
      new Replicator(spark, apdb, new PpdbStaged(spark, promoter))
    val remoteRoot = tmpDir("soak-remote")

    def statuses(): Map[Long, String] =
      cat.read(spark, "PpdbReplicaChunk")
        .select("apdb_replica_chunk", "status").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap

    // ---- phase A (serial): export chunks 1-3, then tamper chunk 3's
    // DiaObject parquet before any uploader ever sees it
    replicator.runOnce(nowUs = far, limit = Some(3))
    assert(statuses().keySet == Set(1L, 2L, 3L))
    val tamperTarget = Files.list(Paths.get(promoter.chunkDir(3), "DiaObject"))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    val originalBytes = Files.readAllBytes(tamperTarget)
    Files.write(tamperTarget, (originalBytes :+ 0x5a.toByte))

    // ---- phase B (concurrent): the three service loops race; the
    // promoter's FIRST publish is killed between its table writes and its
    // pointer move (armed from the start, fires once)
    val armKill = new AtomicBoolean(true)
    @volatile var crashFired = false
    cat.beforePointerMove = () =>
      if (Thread.currentThread().getName == "chaos-promoter" &&
          armKill.getAndSet(false)) {
        crashFired = true
        throw new RuntimeException("induced-crash before publish")
      }

    @volatile var stop = false
    val errors = mutable.ArrayBuffer.empty[Throwable] // promoter-loop escapes
    val repDone = new AtomicBoolean(false)

    val repThread = new Thread(() => {
      try {
        while (!stop && statuses().size < nChunks)
          replicator.runOnce(nowUs = far, limit = Some(2))
      } finally repDone.set(true)
    }, "chaos-replicator")
    val uploader = new ChunkUploader(spark, promoter, remoteRoot,
      notify = (id, _) => promoter.stageChunks(Seq(id)))
    val upThread = new Thread(() => {
      while (!stop) { uploader.runOnce(); Thread.sleep(20L) }
    }, "chaos-uploader")
    val promoThread = new Thread(() => {
      while (!stop) {
        try {
          promoter.stageUploaded()
          promoter.promote(Some(2))
        } catch { case e: Throwable => errors.synchronized(errors += e) }
        Thread.sleep(20L)
      }
    }, "chaos-promoter")
    Seq(repThread, upThread, promoThread).foreach(_.start())

    // the tampered chunk wedges the contiguous-promote barrier while its
    // successors keep flowing: wait until 1-2 promoted (proves recovery
    // from the induced crash), 3 still stuck exported, and at least one
    // later chunk progressed past it
    val deadline = System.nanoTime() + 240L * 1000000000L
    def waitFor(what: String)(cond: => Boolean): Unit =
      while (!cond) {
        assert(System.nanoTime() < deadline, s"soak timed out waiting: $what")
        Thread.sleep(100L)
      }
    waitFor("blocked prefix under tamper") {
      val s = statuses()
      s.get(1L).contains(ChunkStatus.Promoted) &&
        s.get(2L).contains(ChunkStatus.Promoted) &&
        s.get(3L).contains(ChunkStatus.Exported) &&
        (4L to nChunks.toLong).exists(id => s.get(id).exists(st =>
          st == ChunkStatus.Uploaded || st == ChunkStatus.Staged))
    }
    assert(crashFired, "induced crash never fired")
    // T5 under failure: nothing beyond the wedge ever promoted
    val mid = statuses()
    (4L to nChunks.toLong).foreach(id =>
      assert(!mid.get(id).contains(ChunkStatus.Promoted),
        s"chunk $id promoted past the wedged chunk 3"))

    // ---- heal: restore chunk 3's original bytes; the uploader's next
    // poll retries it and promotion drains the whole backlog
    Files.write(tamperTarget, originalBytes)
    waitFor("full drain after heal") {
      val s = statuses()
      s.size == nChunks && s.values.forall(_ == ChunkStatus.Promoted)
    }
    stop = true
    Seq(repThread, upThread, promoThread).foreach(_.join(30000L))

    // ---- end state == failure-free serial run, exactly once
    val objects = cat.read(spark, "internal.DiaObject")
    assert(objects.count() == nObjects.toLong * nChunks)
    val chains = objects
      .select("diaObjectId", "validityStartMjdTai", "validityEndMjdTai")
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getDouble(1))).toMap
    assert(chains.size == nObjects)
    chains.values.foreach { rows =>
      assert(rows.length == nChunks)
      rows.init.zip(rows.tail).foreach { case (a, b) =>
        assert(a.getDouble(2) == b.getDouble(1), "validity chain broken")
      }
      assert(rows.last.isNullAt(2), "latest version must stay open")
    }
    val sources = cat.read(spark, "internal.DiaSource")
    assert(sources.count() == nObjects.toLong * nChunks)
    assert(sources.select("diaSourceId").distinct().count() ==
      nObjects.toLong * nChunks, "duplicate fact rows applied")
    assert(cat.read(spark, "public.DiaObjectLast").count() == nObjects.toLong)
    assert(cat.read(spark, "staging.DiaObject").count() == 0L)
    assert(cat.read(spark, "staging.updates").count() == 0L)

    // the only promoter-loop escape is the induced crash; everything else
    // (CAS contention, concurrent staging) resolved internally
    val unexpected = errors.synchronized(errors.toList).filterNot(e =>
      Option(e.getMessage).exists(_.contains("induced-crash")) ||
        e.isInstanceOf[graft.catalog.ConcurrentCommitException])
    assert(unexpected.isEmpty,
      s"unexpected service errors: ${unexpected.map(_.toString).take(3)}")

    // cold recovery: a fresh catalog handle on the same root reads every
    // table (no dangling dirs from the crashed commit's written-but-
    // unpublished data)
    val reopened = new VersionedCatalog(catRoot)
    Seq("internal.DiaObject", "internal.DiaSource",
      "internal.DiaForcedSource", "public.DiaObjectLast",
      "PpdbReplicaChunk").foreach { t =>
      assert(reopened.read(spark, t).count() >= 0L, s"reopen failed: $t")
    }
  }
}
