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
    minTokens: Int = 10,
    maxTokens: Int = 1 << 20,
    minQuality: Double = 0.0,
    langs: Set[String] = Set.empty, // empty = keep all languages
    dedupExact: Boolean = true,
    nearDupThreshold: Option[Double] = None, // e.g. Some(0.6)
    benchmark: Option[DataFrame] = None,     // docs with the text column
    decontaminateN: Int = 4,
    budgetPerSource: Option[Long] = None,
    // (chunkTokens, overlap): split survivors into context windows as the
    // final stage — output becomes chunk-granular (chunk_idx, chunk_text,
    // n_tok per chunk replace the doc text column)
    chunk: Option[(Int, Int)] = None)

object TextPipeline {

  /** Curate `docs` (idCol, textCol, sourceCol) per `cfg`. Deterministic:
    * every stage keeps the minimum-id canonical document.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, cfg: CurationConfig): DataFrame = {
    val id: Column = col(idCol)

    // 0. PII scrub — BEFORE analysis/dedup so every downstream hash,
    // signature, and emitted row sees only the redacted text
    val scrubbed =
      if (cfg.scrubPii)
        docs.withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
      else docs

    // 1. annotate + filter in ONE fused stats pass. Pre-existing
    // annotation columns (a re-curation of already-curated output) are
    // dropped first — appending would duplicate the names and the very
    // next filter would die on an ambiguous reference
    val stale = scrubbed.columns
      .filter(Set("n_tokens", "quality", "pred_lang"))
    val clean = stale.foldLeft(scrubbed)(_ drop _)
    val st = TextAnalysis.stats(col(textCol))
    val annotated = clean.select(clean.columns.map(col) :+
        TextAnalysis.tokenCountOf(st).as("n_tokens") :+
        TextAnalysis.qualityScoreOf(st).as("quality") :+
        TextAnalysis.langIdOf(st).as("pred_lang"): _*)
    var kept = annotated
      .where(col("n_tokens") >= cfg.minTokens &&
        col("n_tokens") <= cfg.maxTokens &&
        col("quality") >= cfg.minQuality)
    if (cfg.langs.nonEmpty)
      kept = kept.where(col("pred_lang").isin(cfg.langs.toSeq: _*))
    // every later stage (and the final consumer) re-reads the filtered
    // corpus — persist it once so the stats scan + filter runs one time,
    // not once per stage (callers release with clearCache, the repo-wide
    // convention for persisted query internals)
    kept = kept.persist()

    // 2. exact dedup: keep the canonical (min id) doc per content hash
    if (cfg.dedupExact) {
      val canon = Dedup.exactDedup(kept, idCol, textCol)
        .select(col("canonical_id").as(idCol))
      kept = kept.join(canon, Seq(idCol), "left_semi")
    }

    // 3. near dedup: keep each cluster's canonical doc
    cfg.nearDupThreshold.foreach { t =>
      val pairs = Dedup.minhashLshPairs(kept, idCol, textCol,
        n = 3, numHashes = 8, rowsPerBand = 2, threshold = t)
        .select("id_a", "id_b")
      val clusters = Dedup.dupClusters(kept.select(id), idCol, pairs)
      kept = kept.join(
        clusters.where(col(idCol) === col("cluster_id")).select(id),
        Seq(idCol), "left_semi")
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
      kept = kept.join(hits, Seq(idCol), "left_anti")
    }

    // 5. per-source token budget (approximate rate-based scale variant),
    // fed the n_tokens column stage 1 already materialized — no second
    // tokenizer scan over the surviving corpus
    cfg.budgetPerSource.foreach { budget =>
      val sample = TextAnalysis.tokenBudgetSampleApproxCounted(
        kept, idCol, "n_tokens", sourceCol, budget).select(id)
      kept = kept.join(sample, Seq(idCol), "left_semi")
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
