package graft

import org.apache.spark.sql.functions._

import graft.ops.{CurationConfig, TextPipeline}

/** End-to-end corpus curation: each stage removes exactly the planted
  * offenders and the canonical survivors come out annotated.
  */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val good = "the cat sat on the mat and then the dog sat too"
  private val docs = Seq(
    (1L, "srcA", good),                                   // keeper
    (2L, "srcA", good),                                   // exact dup of 1
    (3L, "srcA", good + " extra"),                        // near dup of 1
    (4L, "srcA", "x"),                                    // too short
    (5L, "srcB", "el la de y en que es el la de y en"),   // not English
    (6L, "srcB", "the quick brown fox jumps over a lazy dog near a river"),
    (7L, "srcB", "a b"),                                  // too short
    (8L, "srcB",
      "the secret eval answer is forty two said the examiner kindly")
  ).toDF("doc_id", "source", "text")
  // benchmark shares a 4-gram with doc 8 only
  private val bench = Seq(
    (100L, "the secret eval answer is different here")
  ).toDF("doc_id", "text")

  test("Dedup.withCaches: two sequential curate runs leak no cached plans") {
    graft.ops.Dedup.releaseCaches()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val cfg = CurationConfig(minTokens = 5, langs = Set("en"),
      dedupExact = true, nearDupThreshold = Some(0.5),
      benchmark = Some(bench))
    // the long-lived-service shape: each call scoped, results
    // materialized inside the block
    val ids1 = graft.ops.Dedup.withCaches {
      TextPipeline.curate(docs, "doc_id", "text", "source", cfg)
        .select("doc_id").as[Long].collect().toSet
    }
    val leaked1 = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked1.isEmpty, s"first run leaked cached RDDs: $leaked1")
    val ids2 = graft.ops.Dedup.withCaches {
      TextPipeline.curate(docs, "doc_id", "text", "source", cfg)
        .select("doc_id").as[Long].collect().toSet
    }
    assert(ids2 == ids1, "second scoped run changed the answer")
    val leaked2 = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked2.isEmpty, s"second run leaked cached RDDs: $leaked2")
    // scoping: a cache registered BEFORE the block survives it
    val outer = graft.ops.Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.5)
    outer.count()
    val outerCached = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(outerCached.nonEmpty, "fixture: outer call registered no cache")
    graft.ops.Dedup.withCaches {
      TextPipeline.curate(docs, "doc_id", "text", "source", cfg).count()
    }
    val stillCached = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(stillCached == outerCached,
      "withCaches released a cache registered before the block")
    graft.ops.Dedup.releaseCaches()
  }

  test("withCaches: two CONCURRENT interleaved scopes release only their " +
      "own frames (per-thread scoping)") {
    graft.ops.Dedup.releaseCaches()
    val dfA = Seq(1L).toDF("a")
    val dfB = Seq(2L).toDF("b")
    val aRegistered = new java.util.concurrent.CountDownLatch(1)
    val bRegistered = new java.util.concurrent.CountDownLatch(1)
    // scope A opens first and registers first, but FINISHES while scope
    // B is still open — under the old before/after registry diff A's
    // exit would have unpersisted B's frame (registered after A's
    // snapshot); per-thread scoping must leave it cached
    @volatile var threadErr: Option[Throwable] = None
    val tA = new Thread(() => {
      try graft.ops.Dedup.withCaches {
        graft.ops.Dedup.trackExisting(dfA.persist())
        dfA.count()
        aRegistered.countDown()
        assert(bRegistered.await(30, java.util.concurrent.TimeUnit.SECONDS))
      } catch { case e: Throwable => threadErr = Some(e) }
    }, "withcaches-scope-a")
    tA.start()
    graft.ops.Dedup.withCaches {
      assert(aRegistered.await(30, java.util.concurrent.TimeUnit.SECONDS))
      graft.ops.Dedup.trackExisting(dfB.persist())
      dfB.count()
      bRegistered.countDown()
      tA.join(30000L) // A's scope exits here, while B is still open
      assert(threadErr.isEmpty, s"scope A failed: $threadErr")
      assert(dfA.storageLevel ==
        org.apache.spark.storage.StorageLevel.NONE,
        "A's exit must release A's own frame")
      assert(dfB.storageLevel !=
        org.apache.spark.storage.StorageLevel.NONE,
        "A's exit must NOT release B's in-flight frame")
    }
    assert(dfB.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "B's exit must release B's frame")
    graft.ops.Dedup.releaseCaches()
  }

  test("curate removes junk, dups, near-dups, contamination; keeps canon") {
    val out = TextPipeline.curate(docs, "doc_id", "text", "source",
      CurationConfig(
        minTokens = 5,
        langs = Set("en"),
        dedupExact = true,
        nearDupThreshold = Some(0.5),
        benchmark = Some(bench)))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 6L),
      s"kept $ids: 2 exact-dup, 3 near-dup, 4/7 short, 5 non-en, 8 contaminated")
    // annotations survive
    assert(out.columns.toSet ==
      Set("doc_id", "source", "text", "n_tokens", "quality", "pred_lang"))
    assert(out.where($"doc_id" === 1L).head().getAs[String]("pred_lang") == "en")
  }

  test("near-dedup from a committed pair graph == the inline LSH stage " +
      "(edges pruned to survivors; no corpus re-hash)") {
    // the index is built over the FULL corpus with the same LSH family
    // curate uses inline (n=3, 8 hashes, 2 rows/band) — its edges
    // restricted to the heuristic survivors must be exactly the pairs
    // the inline stage computes, so the survivor sets match
    val idx = graft.ops.Dedup.pairGraphIndex(docs, "doc_id", "text",
      n = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.5)
    val cfgInline = CurationConfig(minTokens = 5, langs = Set("en"),
      dedupExact = true, nearDupThreshold = Some(0.5),
      benchmark = Some(bench))
    val cfgIndexed = cfgInline.copy(nearDupThreshold = None,
      nearDupPairs = Some(idx.pairs))
    val inline = TextPipeline.curate(docs, "doc_id", "text", "source",
      cfgInline).select("doc_id").as[Long].collect().toSet
    val indexed = TextPipeline.curate(docs, "doc_id", "text", "source",
      cfgIndexed).select("doc_id").as[Long].collect().toSet
    idx.release()
    assert(indexed == inline, s"indexed $indexed vs inline $inline")
    assert(inline == Set(1L, 6L))
  }

  test("stages toggle independently") {
    val noDedup = TextPipeline.curate(docs, "doc_id", "text", "source",
      CurationConfig(minTokens = 5, dedupExact = false))
    val ids = noDedup.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(2L), "exact dup kept when dedup off")

    val budget = TextPipeline.curate(docs, "doc_id", "text", "source",
      CurationConfig(minTokens = 1, dedupExact = false,
        budgetPerSource = Some(1000000L)))
    assert(budget.count() == docs.count(),
      "budget >> corpus keeps everything")
  }

  test("pii scrub rewrites text before hashing; chunking re-grains output") {
    val piiDocs = Seq(
      (1L, "srcA", "contact alice@example.com about the big cat today ok"),
      (2L, "srcA", "contact bob@sample.org about the big cat today ok"))
      .toDF("doc_id", "source", "text")
    // with scrubbing, both docs normalize to the same <EMAIL> text —
    // exact dedup must see the REDACTED content and collapse them
    val out = TextPipeline.curate(piiDocs, "doc_id", "text", "source",
      CurationConfig(scrubPii = true, minTokens = 1, dedupExact = true))
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L))
    assert(out.head().getAs[String]("text").contains("<EMAIL>"))

    // decontamination must compare scrubbed-vs-scrubbed: the shared span
    // SPANS the redacted token, so raw texts share no 4-gram but
    // scrubbed texts do — the doc is contaminated only under scrubbing
    val leakyTrain = Seq(
      (1L, "srcA",
        "alpha alice@example.com beta gamma delta one two three four five"))
      .toDF("doc_id", "source", "text")
    val leakyBench = Seq(
      (100L, "alpha bob@other.org beta gamma delta six seven eight"))
      .toDF("doc_id", "text")
    val scrubbedRun = TextPipeline.curate(leakyTrain, "doc_id", "text",
      "source", CurationConfig(scrubPii = true, minTokens = 1,
        dedupExact = false, benchmark = Some(leakyBench)))
    assert(scrubbedRun.count() == 0,
      "PII-spanning contamination caught when both sides are scrubbed")
    val rawRun = TextPipeline.curate(leakyTrain, "doc_id", "text",
      "source", CurationConfig(scrubPii = false, minTokens = 1,
        dedupExact = false, benchmark = Some(leakyBench)))
    assert(rawRun.count() == 1, "raw texts share no 4-gram")

    val chunked = TextPipeline.curate(docs, "doc_id", "text", "source",
      CurationConfig(minTokens = 5, dedupExact = false,
        chunk = Some((8, 2))))
    assert(chunked.columns.contains("chunk_text") &&
      chunked.columns.contains("chunk_idx"))
    // doc 1 has 12 tokens -> chunks at 0 and 6 under (k=8, stride=6)
    assert(chunked.where($"doc_id" === 1L).count() == 2)
    // per-chunk annotations still present
    assert(chunked.columns.contains("quality"))
  }

  test("phrase blocklist scrubs before hashing: banned spans vanish " +
      "and exact dedup sees the scrubbed content") {
    val docs = Seq(
      (1L, "srcA", "one two BANNED PHRASE three four five six seven"),
      (2L, "srcA", "one two three four five six seven"))
      .toDF("doc_id", "source", "text")
    val out = TextPipeline.curate(docs, "doc_id", "text", "source",
      CurationConfig(blocklist = Seq("BANNED PHRASE "), minTokens = 1,
        dedupExact = true))
    // with the banned span deleted, doc 1's text equals doc 2's — the
    // dedup stage must see scrubbed content and collapse them
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L))
    assert(!out.head().getAs[String]("text").contains("BANNED"))
  }

  test("CCNet LM filter: docs that don't read like the reference drop") {
    val ref = Seq(
      (100L, "the cat sat on the mat"),
      (101L, "the cat ran on the mat"),
      (102L, "the dog sat on the mat")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "srcA", "the cat sat on the mat"), // reference-like
      (2L, "srcA", "zx qv wq jj kk zz pp qq")) // every bigram OOV (32 bits)
      .toDF("doc_id", "source", "text")
    val out = TextPipeline.curate(docs, "doc_id", "text", "source",
      CurationConfig(minTokens = 2, dedupExact = false,
        lmFilter = Some((ref, 8.0))))
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L))
    // a permissive threshold keeps both
    val loose = TextPipeline.curate(docs, "doc_id", "text", "source",
      CurationConfig(minTokens = 2, dedupExact = false,
        lmFilter = Some((ref, 33.0))))
    assert(loose.count() == 2)
  }

  test("model-quality gate and leakage-free split compose into curate") {
    // trained-model gate on the real fixture (the toy corpus is too
    // small to train on): a strict threshold must CUT something, a zero
    // threshold must cut nothing, and survivors of the strict run are a
    // subset of the lax run's
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", lit("src").as("source"), $"text")
    val lax = TextPipeline.curate(corpus, "doc_id", "text", "source",
      CurationConfig(minTokens = 1, dedupExact = false,
        minModelQuality = Some(0.0)))
    assert(lax.count() == corpus.count(), "p >= 0 cuts nothing")
    val strict = TextPipeline.curate(corpus, "doc_id", "text", "source",
      CurationConfig(minTokens = 1, dedupExact = false,
        minModelQuality = Some(0.5)))
    val nStrict = strict.count()
    assert(nStrict > 0 && nStrict < corpus.count(),
      s"p >= 0.5 keeps a proper subset ($nStrict of ${corpus.count()})")

    // split WITHOUT near-dedup: near-dups stay but never straddle splits
    val split = TextPipeline.curate(corpus, "doc_id", "text", "source",
      CurationConfig(minTokens = 1, dedupExact = false,
        split = Some((80, 10))))
    assert(split.columns.contains("split"))
    assert(split.count() == corpus.count())
    val pairs = graft.ops.Dedup.minhashLshPairs(corpus, "doc_id", "text",
      n = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.6)
    val straddle = pairs
      .join(split.select($"doc_id".as("id_a"), $"split".as("sa")), Seq("id_a"))
      .join(split.select($"doc_id".as("id_b"), $"split".as("sb")), Seq("id_b"))
      .where($"sa" =!= $"sb")
    assert(straddle.isEmpty, "a near-dup pair straddles train/eval")
    spark.catalog.clearCache()
  }

  test("Gopher gates fuse into curate: verdicts == gopherRules, " +
      "survivors == the rules' keep set intersected with the heuristics") {
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text", $"source")
    // expression twin == the ts37-gated operator, verdict for verdict
    val viaExpr = corpus.select($"doc_id",
      graft.ops.TextAnalysis.gopherKeepExpr($"text").as("keep"))
    val viaRules = graft.ops.TextAnalysis
      .gopherRules(corpus, "doc_id", "text")
      .select($"doc_id", $"keep")
    assert(viaExpr.exceptAll(viaRules).isEmpty &&
      viaRules.exceptAll(viaExpr).isEmpty)
    // fused into curate: survivors = heuristic survivors ∩ rules.keep
    val base = TextPipeline.curate(corpus, "doc_id", "text", "source",
      CurationConfig(minTokens = 1, dedupExact = false))
    val gated = TextPipeline.curate(corpus, "doc_id", "text", "source",
      CurationConfig(minTokens = 1, dedupExact = false,
        gopherGates = true))
    val expect = base.select($"doc_id")
      .join(viaRules.where($"keep").select($"doc_id"), Seq("doc_id"))
    val got = gated.select($"doc_id")
    assert(expect.exceptAll(got).isEmpty && got.exceptAll(expect).isEmpty)
    spark.catalog.clearCache()
  }
}
