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
}
