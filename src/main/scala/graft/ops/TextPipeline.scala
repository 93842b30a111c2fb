package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-call corpus curation: the standard LLM training-data flow —
  * quality/language filtering, exact + near deduplication,
  * decontamination against a benchmark set, and per-source token-budget
  * sampling — composed from the engine's operators in their scale-path
  * forms. Each stage is optional via [[CurationConfig]]; the returned
  * DataFrame carries the surviving documents plus the computed
  * annotations (n_tokens, quality, pred_lang).
  *
  * Plan shape at 100 TB: stage 1 is one fused single-pass stats scan
  * (no shuffle); exact dedup is one shuffle on the 32-byte sha; near
  * dedup is the MinHash-banded candidate join + cluster propagation;
  * decontamination is a broadcast semi-join (corpus never shuffles);
  * sampling is the approximate two-pass rate estimate, so no stage
  * windows over a whole source.
  */
final case class CurationConfig(
    scrubPii: Boolean = false, // redact emails/phones/IPs BEFORE analysis
    // phrase blocklist: delete every matched span (one Aho–Corasick
    // pass) BEFORE analysis, like the PII scrub — downstream hashes and
    // stats must never see banned phrases
    blocklist: Seq[String] = Nil,
    minTokens: Int = 10,
    maxTokens: Int = 1 << 20,
    minQuality: Double = 0.0,
    langs: Set[String] = Set.empty, // empty = keep all languages
    // published Gopher hard gates (ts37 semantics), fused into stage 1's
    // single stats scan as one more projection-level verdict — never a
    // second corpus pass
    gopherGates: Boolean = false,
    // TRAINED quality gate: bootstrap-train QualityModel on the corpus
    // and drop docs whose model probability falls below this (the
    // learned smoothing of the heuristic filter above)
    minModelQuality: Option[Double] = None,
    // CCNet-style language-model filter: score every doc against a
    // bigram LM frozen on the reference corpus (ts27 semantics) and
    // drop docs whose mean bit-surprisal exceeds the threshold —
    // "doesn't read like the reference". Docs too short to score
    // (< 2 tokens) drop too; set minTokens >= 2 to make that explicit
    lmFilter: Option[(DataFrame, Double)] = None,
    dedupExact: Boolean = true,
    nearDupThreshold: Option[Double] = None, // e.g. Some(0.6)
    // near-dup pairs ALREADY COMPUTED — e.g. a committed
    // PairGraphIndex's `pairs` frame (id_a, id_b). When set, the
    // near-dedup stage prunes these edges to the surviving ids instead
    // of re-running the LSH pipeline over the corpus: LSH pair
    // existence is a function of the two documents alone (banding is
    // per-doc deterministic, the verify is pairwise), so the committed
    // graph restricted to survivors IS the inline pair set — the
    // equivalence TextPipelineSpec pins. Caller contract: the pairs
    // were built with the SAME (n, numHashes, rowsPerBand, threshold)
    // family over a superset of `docs`, on the same scrub level this
    // config applies (scrubbed text hashes differently)
    nearDupPairs: Option[DataFrame] = None,
    benchmark: Option[DataFrame] = None,     // docs with the text column
    decontaminateN: Int = 4,
    budgetPerSource: Option[Long] = None,
    // (trainPct, valPct): annotate survivors with a leakage-free
    // train/val/test split. With near-dedup ON the survivors are already
    // one-per-cluster, so the assignment is a map-only hash of the doc
    // id (still leakage-free — the near-dups are gone); with near-dedup
    // OFF the corpus keeps its near-dups and the split routes whole
    // clusters together (banded pairs computed at split time)
    split: Option[(Int, Int)] = None,
    // (chunkTokens, overlap): split survivors into context windows as the
    // final stage — output becomes chunk-granular (chunk_idx, chunk_text,
    // n_tok per chunk replace the doc text column)
    chunk: Option[(Int, Int)] = None)

object TextPipeline {

  /** Curate `docs` (idCol, textCol, sourceCol) per `cfg`. Deterministic:
    * every stage keeps the minimum-id canonical document.
    *
    * `stageTap` sees each configured stage's surviving frame and its
    * result FEEDS FORWARD (identity by default, zero extra jobs) — a
    * bench/monitoring seam: a tap that persists + counts gets per-stage
    * survivor counts while later stages read the materialized frame, so
    * instrumentation never re-executes a stage.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, cfg: CurationConfig,
      stageTap: (String, DataFrame) => DataFrame =
        (_, df) => df): DataFrame = {
    val id: Column = col(idCol)
    def tap(stage: String, df: DataFrame): DataFrame = stageTap(stage, df)

    // 0. PII scrub — BEFORE analysis/dedup so every downstream hash,
    // signature, and emitted row sees only the redacted text
    val piiScrubbed =
      if (cfg.scrubPii)
        docs.withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
      else docs

    // 0b. phrase blocklist — the automaton scrub, after PII redaction
    // (mask tokens can't re-assemble a banned phrase) and before
    // analysis for the same reason the PII scrub runs first
    val scrubbed =
      if (cfg.blocklist.nonEmpty)
        piiScrubbed.withColumn(textCol, graft.functions.TextExprs
          .blocklistScrub(col(textCol), cfg.blocklist))
      else piiScrubbed

    // 1. annotate + filter in ONE fused stats pass. Pre-existing
    // annotation columns (a re-curation of already-curated output) are
    // dropped first — appending would duplicate the names and the very
    // next filter would die on an ambiguous reference
    val stale = scrubbed.columns
      .filter(Set("n_tokens", "quality", "pred_lang"))
    val clean = stale.foldLeft(scrubbed)(_ drop _)
    // gate FIRST with the single-evaluation fused verdict (including the
    // Gopher hard gates — scrub + stats + heuristics + Gopher stay one
    // documents pass, the PlanAudit-asserted property), THEN annotate
    // only the survivors. Filtering on annotation columns instead
    // re-evaluates the whole scrub→stats chain once per predicate
    // reference after pushdown (FilterExec has no subexpression
    // elimination — see heuristicKeep's scaladoc; measured 15× at ×100).
    val gated = clean.where(TextAnalysis.heuristicKeep(col(textCol),
      cfg.minTokens, cfg.maxTokens, cfg.minQuality, cfg.langs.toSeq,
      cfg.gopherGates))
    val st = TextAnalysis.stats(col(textCol))
    var kept = gated.select(gated.columns.map(col) :+
        TextAnalysis.tokenCountOf(st).as("n_tokens") :+
        TextAnalysis.qualityScoreOf(st).as("quality") :+
        TextAnalysis.langIdOf(st).as("pred_lang"): _*)
    // every later stage (and the final consumer) re-reads the filtered
    // corpus — persist it once so the stats scan + filter runs one time,
    // not once per stage. Registered with Dedup's transient registry so
    // Dedup.withCaches { curate(...) } / releaseCaches() scopes it;
    // spark.catalog.clearCache() (the older convention) works too
    kept = Dedup.trackExisting(kept.persist())
    kept = tap("heuristics", kept)

    // 1b. TRAINED quality gate: bootstrap-train the classifier on the
    // heuristic-filtered corpus (16 one-agg GD rounds), then drop docs
    // whose model probability sits below the threshold — the learned
    // smoothing of stage 1's hard heuristic cuts
    cfg.minModelQuality.foreach { t =>
      val keep = QualityModel.trainScore(kept, textCol, idCol = idCol)
        .where(col("score_fx") >= math.round(t * QualityModel.Scale))
        .select(id)
      kept = tap("model_quality", kept.join(keep, Seq(idCol), "left_semi"))
    }

    // 1c. CCNet LM filter: frozen reference bigram LM, drop docs that
    // don't read like the reference. The reference is scrubbed with the
    // same redactions as the corpus (the benchmark-symmetry rule)
    cfg.lmFilter.foreach { case (ref0, maxBits) =>
      var ref = ref0
      if (cfg.scrubPii)
        ref = ref.withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
      if (cfg.blocklist.nonEmpty)
        ref = ref.withColumn(textCol, graft.functions.TextExprs
          .blocklistScrub(col(textCol), cfg.blocklist))
      val keepIds = TextAnalysis
        .bigramSurprisalAgainst(kept, ref, idCol, textCol)
        .where(col("mean_surprise") <= maxBits)
        .select(col("doc_id").as(idCol))
      kept = tap("lm_filter", kept.join(keepIds, Seq(idCol), "left_semi"))
    }

    // 2. exact dedup: keep the canonical (min id) doc per content hash
    if (cfg.dedupExact) {
      val canon = Dedup.exactDedup(kept, idCol, textCol)
        .select(col("canonical_id").as(idCol))
      kept = tap("exact_dedup", kept.join(canon, Seq(idCol), "left_semi"))
    }

    // 3. near dedup: keep each cluster's canonical doc. With committed
    // pairs supplied (cfg.nearDupPairs), the stage is two semi-joins on
    // the edge list + CC over batch-incident edges — the corpus is never
    // re-hashed; otherwise the inline LSH pipeline runs here
    if (cfg.nearDupPairs.isDefined || cfg.nearDupThreshold.isDefined) {
      val keptIds = kept.select(id)
      val pairs = cfg.nearDupPairs match {
        case Some(committed) => committed
          .select(col("id_a"), col("id_b"))
          .join(keptIds.select(id.as("id_a")), Seq("id_a"), "left_semi")
          .join(keptIds.select(id.as("id_b")), Seq("id_b"), "left_semi")
        case None => Dedup.minhashLshPairs(kept, idCol, textCol,
          n = 3, numHashes = 8, rowsPerBand = 2,
          threshold = cfg.nearDupThreshold.get)
          .select("id_a", "id_b")
      }
      val clusters = Dedup.dupClusters(keptIds, idCol, pairs)
      kept = tap("near_dedup", kept.join(
        clusters.where(col(idCol) === col("cluster_id")).select(id),
        Seq(idCol), "left_semi"))
    }

    // 4. decontamination: drop docs sharing any n-gram with the benchmark.
    // The benchmark is scrubbed with the SAME redaction when scrubPii is
    // on — otherwise a shared span containing PII shingles differently on
    // the two sides and the contaminated doc slips through
    cfg.benchmark.foreach { bench0 =>
      val bench =
        if (cfg.scrubPii)
          bench0.withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
        else bench0
      val hits = Dedup.decontaminate(kept, bench, idCol, textCol,
        cfg.decontaminateN).select(id)
      kept = tap("decontaminate", kept.join(hits, Seq(idCol), "left_anti"))
    }

    // 5. per-source token budget (approximate rate-based scale variant),
    // fed the n_tokens column stage 1 already materialized — no second
    // tokenizer scan over the surviving corpus
    cfg.budgetPerSource.foreach { budget =>
      val sample = TextAnalysis.tokenBudgetSampleApproxCounted(
        kept, idCol, "n_tokens", sourceCol, budget).select(id)
      kept = tap("budget", kept.join(sample, Seq(idCol), "left_semi"))
    }

    // 5b. leakage-free split annotation. With near-dedup ON, every
    // cluster already collapsed to its canonical doc, so clusters are
    // singletons and the assignment is the pure hash — still leakage-free
    // (the near-dups are gone). With near-dedup OFF the corpus KEEPS its
    // near-dups, so the split must route whole clusters together: compute
    // the banded pairs here at the standard 0.6 threshold
    cfg.split.foreach { case (trainPct, valPct) =>
      kept =
        if (cfg.nearDupThreshold.isDefined)
          // survivors are one-per-cluster: the split is the same hash
          // leakageFreeSplit would assign to these singleton clusters,
          // applied map-only — no point running connected components
          // against a known-empty pair set
          kept.withColumn("split", Dedup.splitOf(id, trainPct, valPct))
        else {
          val pairs = Dedup.minhashLshPairs(kept, idCol, textCol,
            n = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.6)
            .select("id_a", "id_b")
          val assign = Dedup.leakageFreeSplit(kept.select(id), idCol,
            pairs, trainPct, valPct).select(id, col("split"))
          kept.join(assign, Seq(idCol))
        }
    }

    // 6. context-window chunking: survivors become (doc, chunk) rows;
    // annotations ride THROUGH the explode (map-only) instead of being
    // re-joined on id, which would shuffle the chunk table
    cfg.chunk.foreach { case (k, overlap) =>
      val carry = kept.columns.toSeq
        .filterNot(c => c == idCol || c == textCol || c == "n_tokens")
      kept = TextAnalysis.chunkDocs(kept, idCol, textCol, k, overlap, carry)
    }
    kept
  }

  // ------------------------------------------------------------------
  // Continuous curated ingestion: curate as a STREAM, not a batch job.

  /** One curated-ingestion step (the foreachBatch body of
    * [[curatedIngestStream]], exposed for direct testing and
    * batch-driven backfills): gate → exact-dedup → near-dup ADMISSION
    * against the already-admitted corpus → decontaminate → one atomic
    * commit of (survivors append + rejections append + minhash-index
    * append + batch id). Returns true when applied, false when skipped
    * (replayed batch id or empty batch) — maintenance is EXACTLY-ONCE
    * end to end under at-least-once foreachBatch delivery, the same
    * contract as [[Dedup.applyPairGraphBatch]].
    *
    * SEMANTICS. Per-batch stages reuse [[curate]] VERBATIM (scrub, the
    * fused heuristic gate + annotations, batch-internal exact dedup), so
    * a single batch admits exactly what batch curation keeps — the
    * parity TextIngestSpec pins. Across batches the near-dedup rule is
    * GREEDY ADMISSION against the frozen admitted set (the
    * [[Similarity.semDedupAdmitStream]] contract, in MinHash space): an
    * arrival near-dupping any ADMITTED doc is rejected; survivors of the
    * corpus probe then collapse batch-internally to cluster
    * representatives exactly like curate's near_dedup stage. Greedy
    * admission equals batch curation whenever no cross-batch dup CHAIN
    * spans a rejected middleman (clusters that are cliques, or clusters
    * wholly inside one batch); on an a–b–c chain split a,b | c the batch
    * path keeps {a} while the stream admits {a, c} — c's only near-dup
    * was never admitted. Both sets are valid maximal independent
    * pickings; the spec pins the divergence explicitly.
    *
    * STATE. Five catalog tables under `name`: `survivors` (admitted docs
    * + annotations + content_sha + ingest_batch), `rejections` (doc id,
    * reason ∈ {gate, exact_batch, exact_corpus, near_corpus, near_batch,
    * contaminated}, matched admitted/canonical id where one exists,
    * ingest_batch), `banded`/`sets` (the admitted corpus's MinHash
    * tables — [[Dedup.MinhashIndex]] layout), `params` (near-dup family
    * + last_batch_id; threshold −1 when near-dedup is off). All five
    * move in ONE [[graft.catalog.VersionedCatalog.commitAll]] targeting
    * the batch's pinned load commit, so a concurrent writer fails loudly
    * and readers never see survivors without their index rows.
    *
    * SCALE SHAPE (the point of the design): per batch, everything
    * corpus-sized is SCANNED, never shuffled — the exact-dup probe
    * broadcasts the batch's sha set into the survivors scan
    * (batch-incident hits come back), the near-dup probe is
    * [[Dedup.probeMatches]]'s broadcast path (lite probe + candidate doc
    * ids broadcast; banded/sets scanned), and the commit APPENDS
    * O(batch) rows (params alone rewrites — 1 row). Delta dirs are
    * compacted past `maxDeltaDirs`, readers pinned at older commits
    * unaffected. Batch-internal work (gate, sha groupBy, selfPairs + CC)
    * is batch-sized by construction.
    *
    * Contract: `cfg` must be a STREAMABLE curation config —
    * model/LM-quality gates (bootstrap-train per corpus), per-source
    * budgets, split annotation and chunking are whole-corpus stages;
    * run those over the committed survivors table instead. Doc ids must
    * be fresh across the stream (the [[Dedup.PairGraphIndex.addDocs]]
    * contract; fail-fast probe against admitted ids).
    */
  def applyCuratedIngestBatch(batch: DataFrame, batchId: Long,
      idCol: String, textCol: String,
      cat: graft.catalog.VersionedCatalog, name: String,
      cfg: CurationConfig,
      n: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2,
      maxDeltaDirs: Int = 16): Boolean = {
    require(cfg.minModelQuality.isEmpty && cfg.lmFilter.isEmpty,
      "model/LM quality gates bootstrap-train on their corpus — a " +
        "per-batch model drifts with arrival order; gate with the " +
        "heuristics here and run the trained gates over the committed " +
        "survivors")
    require(cfg.budgetPerSource.isEmpty && cfg.split.isEmpty &&
      cfg.chunk.isEmpty,
      "budget/split/chunk are whole-corpus stages — run them on the " +
        "committed survivors table, not per micro-batch")
    require(cfg.nearDupPairs.isEmpty,
      "the ingest maintains its own near-dup state; nearDupPairs is " +
        "the batch-mode shortcut")
    val spark = batch.sparkSession
    import spark.implicits._
    import graft.catalog.TableDelta
    if (batch.isEmpty) return false
    val pinned = cat.currentCommit
    val hasState = cat.exists(s"$name.params")
    if (hasState) {
      val p = cat.readAt(spark, s"$name.params", pinned).head()
      require(p.getAs[Int]("n") == n &&
        p.getAs[Int]("num_hashes") == numHashes &&
        p.getAs[Int]("rows_per_band") == rowsPerBand &&
        p.getAs[Double]("threshold") ==
          cfg.nearDupThreshold.getOrElse(-1.0),
        s"ingest $name: near-dup family (n/hashes/bands/threshold) " +
          "differs from the committed one — admission rules must not " +
          "drift mid-stream")
      if (batchId <= p.getAs[Long]("last_batch_id")) return false // replay
      // fresh-id fail-fast (bounded collect: limit 1)
      val clash = cat.readAt(spark, s"$name.survivors", pinned)
        .join(broadcast(batch.select(col(idCol))), Seq(idCol), "left_semi")
        .limit(1).collect()
      require(clash.isEmpty,
        s"ingest $name: doc id ${clash.headOption.map(_.get(0)).orNull} " +
          "already admitted — re-ingesting an existing id is not a merge")
    }
    Dedup.withCaches {
      // scrub ONCE, before anything hashes: the content sha, the minhash
      // tables and every stage must see the identical redacted text.
      // curate() then runs with scrubbing OFF on the pre-scrubbed rows —
      // literally the same expressions, hoisted.
      var scrubbed = batch
      if (cfg.scrubPii) scrubbed = scrubbed.withColumn(textCol,
        TextAnalysis.redactPii(col(textCol)))
      if (cfg.blocklist.nonEmpty) scrubbed = scrubbed.withColumn(textCol,
        graft.functions.TextExprs.blocklistScrub(col(textCol),
          cfg.blocklist))
      val shaed = scrubbed.withColumn("content_sha", sha2(col(textCol), 256))
      val taps = scala.collection.mutable.LinkedHashMap
        .empty[String, DataFrame]
      val staged = curate(shaed, idCol, textCol, idCol,
        cfg.copy(scrubPii = false, blocklist = Nil,
          nearDupThreshold = None, nearDupPairs = None, benchmark = None),
        (s, df) => {
          val p = Dedup.trackExisting(df.persist()); taps(s) = p; p
        })
      val idT = batch.schema(idCol).dataType
      val nullId = lit(null).cast(idT)
      def rej(df: DataFrame, reason: String, matched: Column): DataFrame =
        df.select(col(idCol), lit(reason).as("reason"),
          matched.cast(idT).as("matched_id"),
          lit(batchId).as("ingest_batch"))
      val gateKept = taps("heuristics")
      var rejections = rej(shaed.join(gateKept.select(col(idCol)),
        Seq(idCol), "left_anti"), "gate", nullId)
      if (cfg.dedupExact) {
        // batch-internal exact losers, each pointing at its canonical
        val canon = Dedup.exactDedup(gateKept, idCol, textCol)
          .select(col("content_sha"), col("canonical_id"))
        val lost = gateKept
          .join(taps("exact_dedup").select(col(idCol)), Seq(idCol),
            "left_anti")
          .select(col(idCol), col("content_sha"))
          .join(canon, Seq("content_sha"))
        rejections = rejections.unionByName(
          rej(lost, "exact_batch", col("canonical_id")))
      }
      // exact vs the ADMITTED corpus: batch shas broadcast INTO the
      // survivors scan; hits (batch-bounded) broadcast back into the
      // batch-side anti-join — the corpus is scanned, never shuffled
      val afterCorpusExact =
        if (hasState && cfg.dedupExact) {
          val surv = cat.readAt(spark, s"$name.survivors", pinned)
          val hits = Dedup.trackExisting(surv
            .join(broadcast(staged.select(col("content_sha")).distinct()),
              Seq("content_sha"))
            .groupBy(col("content_sha"))
            .agg(min(col(idCol)).as("__matched"))
            .persist())
          rejections = rejections.unionByName(
            rej(staged.join(broadcast(hits), Seq("content_sha")),
              "exact_corpus", col("__matched")))
          staged.join(broadcast(hits), Seq("content_sha"), "left_anti")
        } else staged
      // near-dup admission + batch-internal representative collapse
      var nbns: Option[(DataFrame, DataFrame)] = None
      val admittedPre = cfg.nearDupThreshold match {
        case None => afterCorpusExact
        case Some(t) =>
          val (base, nb, ns) = Dedup.indexTables(afterCorpusExact, idCol,
            textCol, n, numHashes, rowsPerBand)
          Dedup.trackExisting(base.persist())
          nbns = Some((nb, ns))
          val afterCorpusNear =
            if (hasState) {
              val idx = Dedup.MinhashIndex(n, numHashes, rowsPerBand,
                cat.readAt(spark, s"$name.banded", pinned),
                cat.readAt(spark, s"$name.sets", pinned))
              // one audit row per rejected arrival: its strongest
              // admitted match
              val cr = Dedup.trackExisting(Dedup.probeMatches(
                  ns.select(col("doc").as("p_doc"), col("sh").as("p_sh"),
                    col("sig").as("p_sig")),
                  idx, t, broadcastProbe = true)
                .groupBy(col("probe_id"))
                .agg(max_by(col("corpus_id"), col("jaccard"))
                  .as("__matched"))
                .persist())
              rejections = rejections.unionByName(
                rej(afterCorpusExact.join(broadcast(cr),
                    col(idCol) === col("probe_id")),
                  "near_corpus", col("__matched")))
              afterCorpusExact.join(broadcast(cr),
                col(idCol) === col("probe_id"), "left_anti")
            } else afterCorpusExact
          // curate's near_dedup rule on what's left of the batch: CC over
          // the batch-internal pair set, keep each cluster's canonical.
          // Docs too short to shingle have no pairs — singletons, kept,
          // and absent from banded/sets exactly like the batch build.
          val keepDocs =
            broadcast(afterCorpusNear.select(col(idCol).as("doc")))
          val pairs = Dedup.selfPairs(
              nb.join(keepDocs, Seq("doc"), "left_semi"),
              ns.join(keepDocs, Seq("doc"), "left_semi"), t)
            .select(col("id_a"), col("id_b"))
          val clusters = Dedup.dupClusters(
            afterCorpusNear.select(col(idCol)), idCol, pairs)
          val nonReps = clusters.where(col(idCol) =!= col("cluster_id"))
          rejections = rejections.unionByName(
            rej(afterCorpusNear.join(
                broadcast(nonReps.select(col(idCol), col("cluster_id"))),
                Seq(idCol)),
              "near_batch", col("cluster_id")))
          afterCorpusNear.join(broadcast(nonReps.select(col(idCol))),
            Seq(idCol), "left_anti")
      }
      // decontamination LAST — curate's stage order (near-dedup first
      // means a cluster whose representative is contaminated vanishes
      // entirely; stream and batch must agree on that)
      val admitted = cfg.benchmark match {
        case Some(b0) =>
          var b = b0
          if (cfg.scrubPii) b = b.withColumn(textCol,
            TextAnalysis.redactPii(col(textCol)))
          if (cfg.blocklist.nonEmpty) b = b.withColumn(textCol,
            graft.functions.TextExprs.blocklistScrub(col(textCol),
              cfg.blocklist))
          val hits = Dedup.trackExisting(
            Dedup.decontaminate(admittedPre, b, idCol, textCol,
              cfg.decontaminateN).select(col(idCol)).persist())
          rejections = rejections.unionByName(
            rej(admittedPre.join(broadcast(hits), Seq(idCol), "left_semi"),
              "contaminated", nullId))
          admittedPre.join(broadcast(hits), Seq(idCol), "left_anti")
        case None => admittedPre
      }
      val admittedP = Dedup.trackExisting(admitted.persist())
      val params = Seq((n, numHashes, rowsPerBand,
        cfg.nearDupThreshold.getOrElse(-1.0), batchId))
        .toDF("n", "num_hashes", "rows_per_band", "threshold",
          "last_batch_id")
      val label = s"b$batchId"
      var deltas = Map(
        s"$name.survivors" -> TableDelta(appends = Seq(
          (admittedP.withColumn("ingest_batch", lit(batchId)), label))),
        s"$name.rejections" -> TableDelta(appends = Seq((rejections, label))),
        s"$name.params" -> TableDelta(rewrite = Some(params)))
      nbns.foreach { case (nb, ns) =>
        // index rows for the ADMITTED docs only (the frozen-kept-set
        // invariant: the index IS the admitted corpus)
        val adm = broadcast(admittedP.select(col(idCol).as("doc")))
        deltas ++= Map(
          s"$name.banded" -> TableDelta(appends = Seq(
            (nb.join(adm, Seq("doc"), "left_semi"), label))),
          s"$name.sets" -> TableDelta(appends = Seq(
            (ns.join(adm, Seq("doc"), "left_semi"), label))))
      }
      cat.commitAll(deltas, expected = Some(pinned))
      (Seq("survivors", "rejections") ++
        (if (nbns.isDefined) Seq("banded", "sets") else Nil))
        .foreach(t =>
          cat.compactIfNeeded(spark, s"$name.$t", maxDirs = maxDeltaDirs))
      true
    }
  }

  /** Continuous curated ingestion over a document stream: each
    * micro-batch runs [[applyCuratedIngestBatch]] — curate's gates,
    * exact + near dedup against everything already admitted, and one
    * atomic exactly-once commit of survivors + rejections + index.
    * Consumers read the latest committed `<name>.survivors` mid-stream;
    * whole-corpus stages (budget, split, chunk, trained quality gates)
    * run over that table on whatever cadence the pipeline needs.
    */
  def curatedIngestStream(docs: DataFrame, idCol: String, textCol: String,
      cat: graft.catalog.VersionedCatalog, name: String,
      cfg: CurationConfig,
      n: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2,
      maxDeltaDirs: Int = 16)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        applyCuratedIngestBatch(batch.toDF(), batchId, idCol, textCol,
          cat, name, cfg, n, numHashes, rowsPerBand, maxDeltaDirs)
        ()
    }
}
