package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.VersionedCatalog
import graft.ops.{CurationConfig, Dedup, TextPipeline}

/** Continuous curated ingestion: per-batch parity with batch curation,
  * greedy cross-batch admission semantics (incl. the documented chain
  * divergence), the rejection audit trail, and exactly-once commits.
  */
class TextIngestSpec extends SparkSpec {
  import spark.implicits._

  private val good = "the cat sat on the mat and then the dog sat too"
  // one batch's worth of planted offenders — the TextPipelineSpec corpus
  private val docs = Seq(
    (1L, "srcA", good),                                   // keeper
    (2L, "srcA", good),                                   // exact dup of 1
    (3L, "srcA", good + " extra"),                        // near dup of 1
    (4L, "srcA", "x"),                                    // too short
    (5L, "srcB", "el la de y en que es el la de y en"),   // not English
    (6L, "srcB", "the quick brown fox jumps over a lazy dog near a river"),
    (8L, "srcB",
      "the secret eval answer is forty two said the examiner kindly")
  ).toDF("doc_id", "source", "text")
  private val bench = Seq(
    (100L, "the secret eval answer is different here")
  ).toDF("doc_id", "text")

  private val cfg = CurationConfig(minTokens = 5, langs = Set("en"),
    dedupExact = true, nearDupThreshold = Some(0.5),
    benchmark = Some(bench))

  private def apply(cat: VersionedCatalog, name: String, batch: DataFrame,
      id: Long, c: CurationConfig = cfg): Boolean =
    TextPipeline.applyCuratedIngestBatch(batch, id, "doc_id", "text",
      cat, name, c)

  private def survivors(cat: VersionedCatalog, name: String): DataFrame =
    cat.read(spark, s"$name.survivors")

  private def rejReasons(cat: VersionedCatalog,
      name: String): Map[Long, (String, Option[Long])] =
    cat.read(spark, s"$name.rejections")
      .select($"doc_id", $"reason", $"matched_id")
      .as[(Long, String, Option[Long])].collect()
      .map { case (d, r, m) => d -> (r, m) }.toMap

  test("single batch admits exactly what batch curation keeps, " +
      "with the full rejection audit") {
    val cat = new VersionedCatalog(tmpDir("ingest-one"))
    assert(apply(cat, "cur", docs, 0L))
    val got = survivors(cat, "cur")
    def norm(df: DataFrame) = df
      .select($"doc_id", $"n_tokens".cast("long"),
        $"quality".cast("double"), $"pred_lang")
      .as[(Long, Long, Double, String)].collect().toSet
    val want = Dedup.withCaches {
      norm(TextPipeline.curate(docs, "doc_id", "text", "source", cfg))
    }
    val gotRows = norm(got)
    assert(gotRows == want, "ingest batch-1 != batch curate")
    assert(got.columns.contains("content_sha") &&
      got.columns.contains("ingest_batch"))
    // every planted offender rejected for its planted reason, pointing
    // at its admitted/canonical doc where one exists
    val rej = rejReasons(cat, "cur")
    assert(rej(2L) == (("exact_batch", Some(1L))), s"doc 2: ${rej.get(2L)}")
    assert(rej(3L) == (("near_batch", Some(1L))), s"doc 3: ${rej.get(3L)}")
    assert(rej(4L)._1 == "gate")
    assert(rej(5L)._1 == "gate")
    assert(rej(8L)._1 == "contaminated")
    assert(rej.keySet == Set(2L, 3L, 4L, 5L, 8L))
    // the committed index is the ADMITTED corpus only
    val indexed = cat.read(spark, "cur.sets").select($"doc")
      .as[Long].collect().toSet
    val admitted = gotRows.map(_._1)
    assert(indexed.subsetOf(admitted),
      "index contains rows for non-admitted docs")
  }

  test("cross-batch: exact and near dups of ADMITTED docs are rejected " +
      "against the corpus; clique clusters match batch curation") {
    val cat = new VersionedCatalog(tmpDir("ingest-multi"))
    assert(apply(cat, "cur", docs, 0L))
    val batch2 = Seq(
      (11L, "srcA", good),             // exact dup of admitted 1
      (12L, "srcA", good + " extra"),  // near dup of admitted 1
      (13L, "srcB",
        "completely fresh words about sailing ships across the wide sea")
    ).toDF("doc_id", "source", "text")
    assert(apply(cat, "cur", batch2, 1L))
    val rej = rejReasons(cat, "cur")
    assert(rej(11L) == (("exact_corpus", Some(1L))), s"11: ${rej.get(11L)}")
    assert(rej(12L) == (("near_corpus", Some(1L))), s"12: ${rej.get(12L)}")
    val admitted = survivors(cat, "cur").select($"doc_id")
      .as[Long].collect().toSet
    assert(admitted.contains(13L) && !admitted.contains(11L) &&
      !admitted.contains(12L))
    // clique semantics: id-ordered arrival == batch curation of the union
    val union = docs.unionByName(batch2)
    val want = Dedup.withCaches {
      TextPipeline.curate(union, "doc_id", "text", "source", cfg)
        .select($"doc_id").as[Long].collect().toSet
    }
    assert(admitted == want,
      s"stream admissions $admitted != batch curate $want on a " +
        "clique-cluster corpus")
  }

  test("dup CHAIN split across batches: greedy admission keeps both " +
      "endpoints — the documented divergence from batch curation") {
    // a–b–c suffix-growth chain: jacc(a,b) = 0.77, jacc(b,c) = 0.59,
    // jacc(a,c) = 0.45 — premise asserted below, not assumed. (A
    // sliding-window chain over synthetic ordered tokens does NOT work
    // here: the rolling shingle hash correlates with token order, so
    // the minimum-hash shingle sits systematically in the non-shared
    // window edge and banding never collides.)
    val t = "the cat sat on the mat and then the dog sat too"
    val a = t
    val b = t + " while rain fell"
    val c = t + " while rain fell and wind blew hard across the quiet " +
      "town tonight"
    val chainCfg = CurationConfig(minTokens = 5,
      dedupExact = true, nearDupThreshold = Some(0.5))
    val fixture = Seq((1L, "s", a), (2L, "s", b), (3L, "s", c))
      .toDF("doc_id", "source", "text")
    val pairs = Dedup.minhashLshPairs(fixture, "doc_id", "text",
        n = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    Dedup.releaseCaches()
    assert(pairs == Set((1L, 2L), (2L, 3L)),
      s"fixture premise broken: pair set $pairs")
    // batch curation over the whole chain keeps only the canonical a
    val batchKeeps = Dedup.withCaches {
      TextPipeline.curate(fixture, "doc_id", "text", "source", chainCfg)
        .select($"doc_id").as[Long].collect().toSet
    }
    assert(batchKeeps == Set(1L), s"batch curate kept $batchKeeps")
    // streamed as {a,b} then {c}: b rejects against a; c's only near-dup
    // was never admitted, so greedy admission keeps it
    val cat = new VersionedCatalog(tmpDir("ingest-chain"))
    assert(apply(cat, "cur", fixture.where($"doc_id" <= 2), 0L, chainCfg))
    assert(apply(cat, "cur", fixture.where($"doc_id" === 3), 1L, chainCfg))
    val admitted = survivors(cat, "cur").select($"doc_id")
      .as[Long].collect().toSet
    assert(admitted == Set(1L, 3L), s"greedy admission got $admitted")
    // the admission invariant that DOES hold: no two admitted docs are
    // near-dups, and every near-rejection points at an admitted doc
    val admittedPairs = Dedup.minhashLshPairs(
        survivors(cat, "cur"), "doc_id", "text",
        n = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    Dedup.releaseCaches()
    assert(admittedPairs.isEmpty,
      s"admitted set is not an independent set: ${admittedPairs.toSeq}")
    val rej = rejReasons(cat, "cur")
    assert(rej(2L)._1 == "near_batch" &&
      admitted.contains(rej(2L)._2.get),
      "near rejection must point at an admitted doc")
  }

  test("replay, empty batch, id clash and non-streamable configs are " +
      "refused; commits stay exactly-once") {
    val cat = new VersionedCatalog(tmpDir("ingest-replay"))
    assert(apply(cat, "cur", docs, 0L))
    val commitAfter = cat.currentCommit
    assert(!apply(cat, "cur", docs, 0L), "replayed batch id applied")
    assert(cat.currentCommit == commitAfter, "replay moved the catalog")
    assert(!apply(cat, "cur", docs.limit(0), 1L), "empty batch applied")
    val clash = intercept[IllegalArgumentException] {
      apply(cat, "cur", Seq((1L, "s", "some brand new text here today"))
        .toDF("doc_id", "source", "text"), 1L)
    }
    assert(clash.getMessage.contains("already admitted"))
    val drift = intercept[IllegalArgumentException] {
      apply(cat, "cur", Seq((99L, "s", "t")).toDF("doc_id", "source",
        "text"), 1L, cfg.copy(nearDupThreshold = Some(0.9)))
    }
    assert(drift.getMessage.contains("drift"))
    for (bad <- Seq(
        cfg.copy(minModelQuality = Some(0.5)),
        cfg.copy(lmFilter = Some((bench, 8.0))),
        cfg.copy(budgetPerSource = Some(100L)),
        cfg.copy(split = Some((80, 10))),
        cfg.copy(chunk = Some((64, 8))),
        cfg.copy(nearDupPairs = Some(bench))))
      intercept[IllegalArgumentException] {
        apply(cat, "cur", docs, 5L, bad)
      }
  }

  test("streaming driver: two micro-batches through curatedIngestStream " +
      "== the same batches applied directly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = docs.as[(Long, String, String)].collect().toSeq
    val extra = Seq(
      (11L, "srcA", good),
      (13L, "srcB",
        "completely fresh words about sailing ships across the wide sea"))
    val src = MemoryStream[(Long, String, String)]
    val streamCat = new VersionedCatalog(tmpDir("ingest-stream"))
    val q = TextPipeline.curatedIngestStream(
        src.toDF().toDF("doc_id", "source", "text"), "doc_id", "text",
        streamCat, "cur", cfg)
      .option("checkpointLocation", tmpDir("ingest-ckpt"))
      .start()
    src.addData(rows: _*)
    q.processAllAvailable()
    src.addData(extra: _*)
    q.processAllAvailable()
    q.stop()
    val direct = new VersionedCatalog(tmpDir("ingest-direct"))
    assert(apply(direct, "cur", docs, 0L))
    assert(apply(direct, "cur",
      extra.toDF("doc_id", "source", "text"), 1L))
    def state(c: VersionedCatalog) = (
      survivors(c, "cur").select($"doc_id").as[Long].collect().toSet,
      rejReasons(c, "cur"))
    assert(state(streamCat) == state(direct),
      "streamed ingestion != direct batch application")
  }

  test("delta dirs stay bounded under maxDeltaDirs while pinned readers " +
      "keep their snapshots") {
    val cat = new VersionedCatalog(tmpDir("ingest-compact"))
    val base = CurationConfig(minTokens = 3, dedupExact = true,
      nearDupThreshold = Some(0.5))
    def batchDf(k: Long) = (0 until 4).map { i =>
      val id = k * 10 + i
      (id, "s", s"batch $k row $i says unique words num$id plus " +
        s"filler alpha beta gamma delta")
    }.toDF("doc_id", "source", "text")
    var pinnedCommit = -1L
    var pinnedCount = -1L
    (0 until 6).foreach { k =>
      assert(TextPipeline.applyCuratedIngestBatch(batchDf(k.toLong),
        k.toLong, "doc_id", "text", cat, "cur", base, maxDeltaDirs = 2))
      if (k == 2) {
        pinnedCommit = cat.currentCommit
        pinnedCount = cat.readAt(spark, "cur.survivors", pinnedCommit)
          .count()
      }
    }
    Seq("survivors", "rejections", "banded", "sets").foreach { t =>
      val dirs = cat.current._2(s"cur.$t").size
      assert(dirs <= 2, s"cur.$t grew to $dirs dirs under maxDeltaDirs=2")
    }
    // the reader pinned before compactions still sees its exact snapshot
    assert(cat.readAt(spark, "cur.survivors", pinnedCommit).count()
      == pinnedCount, "pinned snapshot changed across compaction")
    assert(survivors(cat, "cur").count() == 24L)
  }
}
