package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language identification, and document
  * fingerprinting. All pure `Column` expressions built from codegen'd
  * built-ins — no UDFs — so they stay inside whole-stage codegen and scale
  * linearly with no shuffle.
  */
object TextAnalysis {

  /** Whitespace tokenizer. */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word segmentation: word pieces of letters, digits, or
    * single punctuation, approximating a byte-pair tokenizer's pre-split.
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Fraction of tokens found in `stopwords` (0.0 when the doc is empty). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val sw = array(stopwords.map(lit): _*)
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        size(filter(toks, t => array_contains(sw, t))).cast("double") /
          size(toks).cast("double"))
  }

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          size(toks).cast("double"))
  }

  /** Punctuation-character ratio over total characters. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))
          .cast("double") / length(text).cast("double"))

  /** Composite quality score in [0,1]: rewards stopword presence (fluency
    * proxy), penalizes extreme token lengths and punctuation density.
    * Fixed IEEE op order so an external oracle can reproduce it exactly.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val sr = stopwordRatio(text, stopwords)
    val mtl = meanTokenLen(text)
    val pr = punctRatio(text)
    val lenOk = when(mtl >= 3.0 && mtl <= 10.0, lit(1.0)).otherwise(lit(0.0))
    sr * lit(0.4) + lenOk * lit(0.4) + (lit(1.0) - pr) * lit(0.2)
  }

  /** Language lexicons for the n-gram/stopword language-ID heuristic. */
  val langLexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "en", "que", "es"),
    "de" -> Seq("der", "die", "das", "und", "zu", "ist", "ein"))

  /** Count of tokens present in one language's lexicon. */
  def langScore(text: Column, lexicon: Seq[String]): Column = {
    val lex = array(lexicon.map(lit): _*)
    size(filter(tokens(text), t => array_contains(lex, t)))
  }

  /** Heuristic language ID: argmax of per-language lexicon hit counts with
    * deterministic precedence (en > es > de on ties; 'und' = undetermined
    * when no lexicon matches).
    */
  def langId(text: Column): Column = {
    val scores = langLexicons.map { case (lang, lex) => lang -> langScore(text, lex) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), els) =>
      when(s === best && best > 0, lit(lang)).otherwise(els)
    }
  }

  /** Rolling polynomial fingerprint over the document's characters:
    * fold(chars, acc = (acc * 31 + code) mod 1e9+7). Deterministic,
    * order-sensitive, reproducible in any engine with an ordered fold.
    */
  def fingerprint(text: Column): Column =
    graft.functions.TextExprs.charHash(text)

  // ------------------------------------------------------- fused variants
  //
  // One TextStatsExpr scan yields every raw count the family above
  // derives with repeated split()/regexp/lambda evaluation (up to 8 per
  // row). The ratio arithmetic below is IDENTICAL (same when/otherwise
  // guards, same IEEE op order), so fused outputs are bit-equal to the
  // composable ones — TextStatsSpec asserts it column by column.

  /** Raw single-pass stats struct; `lex_hits(i)` aligns with
    * [[langLexicons]] order. `stopwords` prepended as lexicon 0 when not
    * a language lexicon.
    */
  def stats(text: Column, extraLexicons: Seq[Seq[String]] = Nil): Column =
    graft.functions.TextExprs.textStats(text,
      langLexicons.map(_._2) ++ extraLexicons)

  def tokenCountOf(st: Column): Column = st.getField("n_tokens")

  def meanTokenLenOf(st: Column): Column =
    when(st.getField("n_tokens") === 0, lit(0.0))
      .otherwise(st.getField("sum_tok_len").cast("double") /
        st.getField("n_tokens").cast("double"))

  def punctRatioOf(st: Column): Column =
    when(st.getField("n_chars") === 0, lit(0.0))
      .otherwise(st.getField("n_punct").cast("double") /
        st.getField("n_chars").cast("double"))

  /** Stopword ratio from lexicon slot `lexIdx` (default: en, slot 0). */
  def stopwordRatioOf(st: Column, lexIdx: Int = 0): Column =
    when(st.getField("n_tokens") === 0, lit(0.0))
      .otherwise(st.getField("lex_hits").getItem(lexIdx).cast("double") /
        st.getField("n_tokens").cast("double"))

  def qualityScoreOf(st: Column, lexIdx: Int = 0): Column = {
    val sr = stopwordRatioOf(st, lexIdx)
    val mtl = meanTokenLenOf(st)
    val pr = punctRatioOf(st)
    val lenOk = when(mtl >= 3.0 && mtl <= 10.0, lit(1.0)).otherwise(lit(0.0))
    sr * lit(0.4) + lenOk * lit(0.4) + (lit(1.0) - pr) * lit(0.2)
  }

  def bpeTokenCountOf(st: Column): Column = st.getField("n_bpe")

  /** langId from the stats struct's lexicon slots (same precedence). */
  def langIdOf(st: Column): Column = {
    val scores = langLexicons.zipWithIndex.map { case ((lang, _), i) =>
      lang -> st.getField("lex_hits").getItem(i)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), els) =>
      when(s === best && best > 0, lit(lang)).otherwise(els)
    }
  }

  // -------------------------------------------------------- PII redaction

  /** PII patterns scrubbed by [[redactPii]], applied in order. Plain
    * character-class regexes (no lookaround) — portable across regex
    * engines and safe for Spark's codegen'd `regexp_replace`. Order
    * matters: emails first (their local part would otherwise be chewed up
    * by the phone pattern's digit runs), then phone-like digit groups,
    * then bare IPv4s.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "(\\+?[0-9]{1,3}[-. (]{1,2})?[0-9]{3}[-. )]{1,2}[0-9]{3}[-. ][0-9]{4}" ->
      "<PHONE>",
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b" -> "<IP>")

  /** Redact emails / phone numbers / IPv4 addresses — the privacy-scrub
    * pass of a training-data pipeline. Pure per-row `regexp_replace`
    * chain: codegen'd, shuffle-free, linear at any corpus size.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, tag)) =>
      regexp_replace(c, pat, tag)
    }

  /** Count of entities [[redactPii]] scrubs. Counts are taken on the
    * PROGRESSIVELY-REDACTED text, mirroring the replace chain — counting
    * every pattern on the original text would double-count when classes
    * overlap (a digit-heavy email local part also matches the phone
    * pattern, but redactPii replaces it once, as an email).
    */
  def piiMatchCount(text: Column): Column = {
    val (_, total) = piiPatterns
      .foldLeft((text, lit(0L): Column)) { case ((t, n), (pat, tag)) =>
        (regexp_replace(t, pat, tag),
          n + size(regexp_extract_all(t, lit(pat), lit(0))).cast("long"))
      }
    total
  }

  // ------------------------------------------------- Gopher quality rules

  /** Stop words of the Gopher quality rule set (Rae et al. 2021,
    * "Scaling Language Models", §A1.1.2).
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The published Gopher document-quality rules as one map-only pass:
    * word-count bounds, mean-word-length bounds, minimum share of words
    * containing an alphabetic character, and a minimum stop-word hit
    * count. Distinct from [[qualityScore]] (a continuous score): these
    * are the named, hard accept/reject gates a curation pipeline logs
    * per rule. Every flag is integer arithmetic (`sum_len` vs
    * `bound·n_words`, `100·n_alpha` vs `pct·n_words`) so the verdicts
    * replay bit-exactly on any engine; `mean_word_len` itself is the
    * single double division. No shuffle, no UDF — codegen'd
    * size/filter/aggregate over the token array.
    *
    * Returns (idCol, n_words, mean_word_len, n_alpha, n_stop, ok_words,
    * ok_mean_len, ok_alpha, ok_stopwords, keep).
    */
  /** The [[gopherRules]] keep verdict as ONE composable Column over the
    * text — identical integer arithmetic (`sum_len` vs `bound·n_words`,
    * `100·n_alpha` vs `pct·n_words`, stopword hits), so a curation
    * pipeline can apply the gates as another projection on an existing
    * scan instead of a second pass (TextPipelineSpec pins the verdict
    * equality against [[gopherRules]]).
    */
  def gopherKeepExpr(text: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Int = 3, maxMeanLen: Int = 10,
      minAlphaPct: Int = 80, minStopHits: Int = 2): Column =
    gopherKeepFromTokens(tokens(text), minWords, maxWords, minMeanLen,
      maxMeanLen, minAlphaPct, minStopHits)

  /** [[gopherKeepExpr]] over an already-computed token array — lets a
    * caller share ONE `tokens(text)` evaluation across the four verdict
    * terms (see [[heuristicKeep]]); the expr form re-splits per term.
    */
  private def gopherKeepFromTokens(toks: Column,
      minWords: Int, maxWords: Int,
      minMeanLen: Int, maxMeanLen: Int,
      minAlphaPct: Int, minStopHits: Int): Column = {
    val nWords = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, x) => acc + length(x))
    val nAlpha = size(filter(toks, x => x.rlike("[A-Za-z]"))).cast("long")
    val nStop = size(filter(toks, x => x.isin(gopherStopwords: _*)))
      .cast("long")
    nWords.between(minWords, maxWords) &&
      (sumLen >= lit(minMeanLen.toLong) * nWords &&
        sumLen <= lit(maxMeanLen.toLong) * nWords) &&
      (nAlpha * 100L >= nWords * minAlphaPct.toLong) &&
      (nStop >= minStopHits.toLong)
  }

  /** The full stage-1 curation verdict (token-count bounds, quality
    * floor, language allowlist, optional Gopher hard gates) as ONE
    * boolean scalar computed in a single byte pass —
    * [[graft.functions.HeuristicGateExpr]], which carries the why (the
    * FilterExec-has-no-CSE / pushdown-inlining trap) and the bit-parity
    * contract with the composable formulation TextStatsSpec pins.
    */
  def heuristicKeep(text: Column, minTokens: Int, maxTokens: Int,
      minQuality: Double, langs: Seq[String] = Nil,
      gopherGates: Boolean = false): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.HeuristicGateExpr(
      ColumnBridge.expression(text),
      langLexicons.map(_._2), langLexicons.map(_._1), gopherStopwords,
      minTokens, maxTokens, minQuality, langs, gopherGates))
  }

  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Int = 3, maxMeanLen: Int = 10,
      minAlphaPct: Int = 80, minStopHits: Int = 2,
      carryCols: Seq[String] = Nil): DataFrame =
    df.select(col(idCol) +: tokens(col(textCol)).as("__toks") +:
        carryCols.map(col): _*)
      .select(col(idCol) +:
        size(col("__toks")).cast("long").as("n_words") +:
        aggregate(col("__toks"), lit(0L), (acc, x) => acc + length(x))
          .as("sum_len") +:
        size(filter(col("__toks"), x => x.rlike("[A-Za-z]"))).cast("long")
          .as("n_alpha") +:
        size(filter(col("__toks"), x => x.isin(gopherStopwords: _*)))
          .cast("long").as("n_stop") +:
        carryCols.map(col): _*)
      .select(col(idCol) +: col("n_words") +:
        (col("sum_len").cast("double") / col("n_words").cast("double"))
          .as("mean_word_len") +:
        col("n_alpha") +: col("n_stop") +:
        col("n_words").between(minWords, maxWords).as("ok_words") +:
        (col("sum_len") >= lit(minMeanLen.toLong) * col("n_words") &&
          col("sum_len") <= lit(maxMeanLen.toLong) * col("n_words"))
          .as("ok_mean_len") +:
        (col("n_alpha") * 100L >= col("n_words") * minAlphaPct.toLong)
          .as("ok_alpha") +:
        (col("n_stop") >= minStopHits.toLong).as("ok_stopwords") +:
        carryCols.map(col): _*)
      .withColumn("keep", col("ok_words") && col("ok_mean_len") &&
        col("ok_alpha") && col("ok_stopwords"))

  // ----------------------------------------------------- context chunking

  /** Split each document into overlapping token-window chunks — the
    * context-window packing step before tokenization: chunk i covers
    * tokens [i·stride, i·stride + chunkTokens) with
    * stride = chunkTokens − overlap, and the chunk count is the smallest
    * that covers every token (the last chunk may be short). Pure
    * generate/slice built-ins: map-side explode, no shuffle, row count
    * grows by ~n/stride — the plan a 100 TB corpus wants (no per-doc
    * state, no window function).
    *
    * Returns (idCol, carryCols..., chunk_idx, chunk_text, n_tok).
    * `carryCols` ride through the explode — Spark preserves sibling
    * columns of a generator for free, so carrying annotations here is
    * map-only; re-joining them on id afterwards would shuffle the
    * chunk table (the largest relation in a curation pipeline).
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int,
      carryCols: Seq[String] = Nil): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0,
      s"need chunkTokens > overlap >= 0, got $chunkTokens/$overlap")
    val stride = chunkTokens - overlap
    val carries = carryCols.filterNot(c => c == idCol || c == textCol)
    // `div` (integer division) — `/` on longs is double division in Spark
    val nChunks = when(col("__n") <= chunkTokens, lit(1L))
      .otherwise(expr(
        s"(__n - $chunkTokens + ${stride - 1}) div $stride") + 1L)
    val slice0 = expr(s"slice(__toks, __idx * $stride + 1, $chunkTokens)")
    df.select(col(idCol) +: carries.map(col) :+
        tokens(col(textCol)).as("__toks"): _*)
      .withColumn("__n", size(col("__toks")).cast("long"))
      .select(col(idCol) +: carries.map(col) :+ col("__toks") :+
        explode(sequence(lit(0L), nChunks - 1L)).as("__idx"): _*)
      .select(col(idCol) +: carries.map(col) :+
        col("__idx").as("chunk_idx") :+
        array_join(slice0, " ").as("chunk_text") :+
        size(slice0).cast("long").as("n_tok"): _*)
  }

  // ------------------------------------------------------ mixture sampling

  /** Deterministic pseudo-random rank for mixture sampling: documents are
    * consumed in (hash, id) order so the sample is reproducible on any
    * engine and independent of physical row order. The id is reduced mod
    * 1000003 BEFORE the multiply so the product stays ≤ ~2.7e15 — a raw
    * `id * 2654435761` overflows Long for ids ≥ 3.5e9 (ANSI mode throws,
    * non-ANSI silently goes negative), and billion-doc corpora are the
    * point of these operators.
    */
  def sampleRank(id: Column): Column =
    ((id % lit(1000003L)) * lit(2654435761L)) % lit(1000003L)

  /** EXACT per-source token-budget sample — the "mix sources to a target
    * token share" pipeline step: within each source, take documents in
    * deterministic [[sampleRank]] order while the running token total
    * stays ≤ `budgetTokens`. Returns (id, source, n_tok).
    *
    * The running sum needs a per-source ordered window, so each source is
    * one partition — exact prefix-take is inherently sequential per
    * source. Fine when sources number in the hundreds; for corpora where
    * one source is 100 TB on its own, use [[tokenBudgetSampleApprox]],
    * which replaces the window with a two-pass rate estimate and scales
    * like a filter.
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, budgetTokens: Long): DataFrame = {
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(sampleRank(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(sourceCol),
        tokenCountOf(stats(col(textCol))).as("n_tok"))
      .withColumn("cum", sum(col("n_tok").cast("long")).over(w))
      .where(col("cum") <= budgetTokens)
      .drop("cum")
  }

  /** Mixture sampling — the data-mixing step of a training pipeline:
    * each source gets its OWN token budget (the target mixture, e.g.
    * 60% web / 30% books / 10% code expressed as absolute token
    * counts), and within each source documents are consumed in
    * deterministic [[sampleRank]] order until the budget is spent.
    * Sources absent from `budgets` are excluded (weight zero). Same
    * exact-prefix window shape as [[tokenBudgetSample]] — the budget
    * table is broadcast (mixtures name at most hundreds of sources), so
    * the only shuffle is the per-source window; for a single source too
    * hot for one partition, the rate-based
    * [[tokenBudgetSampleApproxCounted]] is the scale fallback.
    */
  def mixtureSample(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, budgets: Map[String, Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bdf = budgets.toSeq.toDF(sourceCol, "budget_tok")
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(sampleRank(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(sourceCol),
        tokenCountOf(stats(col(textCol))).as("n_tok"))
      .join(broadcast(bdf), Seq(sourceCol))
      .withColumn("cum", sum(col("n_tok").cast("long")).over(w))
      .where(col("cum") <= col("budget_tok"))
      .select(col(idCol), col(sourceCol), col("n_tok"))
  }

  /** APPROXIMATE token-budget sample — the 100 TB path: pass 1 totals
    * tokens per source (one partial-aggregated groupBy), pass 2 keeps
    * each doc with probability budget/total via a deterministic uniform
    * hash — no window, no per-source sequential scan; the realized
    * budget concentrates around the target (±O(1/√n) relative error).
    */
  def tokenBudgetSampleApprox(df: DataFrame, idCol: String,
      textCol: String, sourceCol: String, budgetTokens: Long): DataFrame =
    tokenBudgetSampleApproxCounted(
      df.select(col(idCol), col(sourceCol),
        tokenCountOf(stats(col(textCol))).as("n_tok")),
      idCol, "n_tok", sourceCol, budgetTokens)

  /** [[tokenBudgetSampleApprox]] over a PRECOMPUTED token-count column —
    * the form a curation pipeline uses after its fused stats pass has
    * already materialized counts, so the tokenizer scan (the dominant
    * per-row cost) is not re-run just to sample.
    */
  def tokenBudgetSampleApproxCounted(df: DataFrame, idCol: String,
      countCol: String, sourceCol: String, budgetTokens: Long): DataFrame = {
    val toks = df.select(col(idCol), col(sourceCol),
      col(countCol).as("n_tok"))
    val totals = toks.groupBy(col(sourceCol))
      .agg(sum(col("n_tok").cast("long")).as("total_tok"))
    val rate = least(lit(1.0),
      lit(budgetTokens).cast("double") / col("total_tok").cast("double"))
    toks.join(broadcast(totals), Seq(sourceCol))
      .where(sampleRank(col(idCol)).cast("double") / lit(1000003.0) < rate)
      .select(col(idCol), col(sourceCol), col("n_tok"))
  }

  /** Ingest-time BM25 scoring as a PURE PROJECTION — the streaming twin
    * of [[bm25TopK]], following the repo's literal-embedded static-index
    * pattern (streaming ANN assignment): the corpus snapshot (per-term
    * document frequencies, doc count N, token total T — a handful of
    * longs, collected once from a frozen batch build) is baked into the
    * expression, so scoring an arriving document touches only its own
    * text. No aggregation, no state, append-mode legal; per term the tf
    * comes from `filter(tokens, t = term)` over the row, and a zero tf
    * contributes zero through the same floored arithmetic, so scores are
    * bit-identical to the batch pipeline's (StreamingSpec pins parity).
    * Like any frozen-index probe, scores drift as the live corpus
    * diverges from the snapshot; rebuild-and-swap is the refresh path
    * (identical to the ANN indexes' build-once/probe-many contract).
    */
  def bm25ScoreExpr(text: Column, termDfs: Seq[(String, Long)], nd: Long,
      tt: Long, scale: Long = 100000L): Column = {
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val toks = tokens(text)
    val dl = size(toks).cast("long")
    termDfs.map { case (term, df) =>
      val idfBits = bitlen(nd) - bitlen(df)
      val tf = size(filter(toks, _ === lit(term))).cast("long")
      // call_function("div"): integral divide — a double `/` + floor
      // would lose bits past 2^53 and desync from the batch pipeline
      lit(idfBits) * call_function("div",
        lit(scale) * lit(220L) * tf * lit(tt),
        lit(100L) * tf * lit(tt) + lit(30L * tt) + lit(90L * nd) * dl)
    }.reduce(_ + _)
  }

  /** Per-source percentile calibration of the quality score, then a
    * global keep-the-top filter: raw [[qualityScore]] values are NOT
    * comparable across sources (a code dump's punctuation ratio is a
    * books corpus's outlier), so filtering on the raw score lets one
    * source crowd out the rest. percent_rank WITHIN each source makes
    * "top half of its own source" the unit of selection — the standard
    * per-domain calibration step in corpus curation. `(quality, id)`
    * ordering totals the window order, so ranks — (k−1)/(n−1), an exact
    * integer-over-integer double both engines compute identically — are
    * deterministic. One shuffle: the per-source window (PlanAudit ts19);
    * sources number in the hundreds at most, and a 100 TB single source
    * still partitions its SORT by range within the window partition.
    */
  def calibratedQualityFilter(df: DataFrame, idCol: String,
      textCol: String, sourceCol: String, minPct: Double): DataFrame = {
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(col("quality"), col(idCol))
    df.select(col(idCol), col(sourceCol),
        qualityScoreOf(stats(col(textCol))).as("quality"))
      .withColumn("q_pct", percent_rank().over(w))
      .where(col("q_pct") >= minPct)
  }

  /** The sketch twin of [[calibratedQualityFilter]] — same per-source
    * "keep the top (1−p) of its own source" semantics, but the cutoff
    * comes from a per-source KLL quantile sketch instead of a
    * percent_rank window, which changes the 100 TB plan shape entirely:
    * the window form SHUFFLES AND SORTS EVERY ROW by source; this form
    * shuffles only O(k log n) sketches to compute each source's cutoff
    * score, broadcasts the few-hundred-row cutoff table back, and keeps
    * rows map-side — zero row shuffle end to end. Scores are quantized
    * to 1e-6 (the [0,1] quality score as integer micro-units; monotone,
    * so selection order is preserved) because the sketch wants integer
    * keys, and each row carries its source's `q_err` rank-error
    * certificate: 0 while a source has ≤ k distinct quantized scores —
    * then the kept set is EXACTLY `score ≥ quantile_disc(p)` — and the
    * sketch's own worst-case bound past it (KllSpec pins both regimes).
    * Boundary note vs the window form: percent_rank ≥ p and
    * score ≥ disc-quantile(p) differ only at ties ON the cutoff score
    * (the window form's (quality, id) order splits equal-score docs;
    * a value threshold keeps or drops them together).
    */
  def calibratedQualityFilterApprox(df: DataFrame, idCol: String,
      textCol: String, sourceCol: String, minPct: Double,
      k: Int = 4096): DataFrame = {
    val scored = df.select(col(idCol), col(sourceCol),
      round(qualityScoreOf(stats(col(textCol))) * 1000000L).cast("long")
        .as("quality_u"))
    val cuts = scored.groupBy(col(sourceCol))
      .agg(graft.functions.Kll
        .kllQuantiles(col("quality_u"), k, Seq(minPct)).as("s"))
      .select(col(sourceCol), col("s.qs").getItem(0).as("q_cut"),
        col("s.err").as("q_err"))
    scored.join(broadcast(cuts), Seq(sourceCol))
      .where(col("quality_u") >= col("q_cut"))
  }

  /** BM25 top-k retrieval for a literal query term set, in EXACT integer
    * arithmetic — the query-driven corpus probe (targeted extraction,
    * decontamination triage, "find the docs about X") next to the
    * corpus-global scores ([[unigramSurprisal]], [[topTerms]]).
    *
    * Okapi BM25 with k1 = 1.2, b = 0.75, integerized so the score is
    * bit-stable under any aggregation order and has an exact SQL oracle:
    *  - idf → bit-length difference `bitlen(N) − bitlen(df)` (the ts14
    *    idiom: floor-log2 via `length(bin(x))`, identical in Spark and
    *    DuckDB), monotone in N/df like Robertson idf;
    *  - tf-norm → multiply through by 100·T (T = total corpus tokens):
    *    `(scale·220·tf·T) div (100·tf·T + 30·T + 90·dl·N)`, every factor
    *    a BIGINT, every division floored. `scale` bounds the quotient's
    *    resolution; the default keeps all products < 2⁶³ through ~10⁹
    *    corpus tokens — beyond that lower `scale` (or widen to decimal).
    *
    * Plan shape (r18): one [[graft.functions.TextExprs.textStats]] scan
    * per row — each query term its own singleton lexicon, so
    * `lex_hits(i)` IS tf_i and `n_tokens` IS dl — replaces the old
    * explode → (doc,term) shuffle → dl-rollup-join pipeline. The whole
    * probe is two map-only corpus passes (the 1-row corpus-stats rollup,
    * then scoring into TakeOrderedAndProject) with NO wide shuffle and
    * no join but the 1-row stats cross join (PlanAudit ts18). The
    * integer arithmetic is unchanged term by term — docs with zero
    * query-term hits contribute tfn = 0 exactly as their absent (doc,
    * term) rows did — so the oracle replays bit-identically. Returns
    * (doc_id, score).
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, scale: Long = 100000L): DataFrame = {
    val st = graft.functions.TextExprs.textStats(col(textCol),
      terms.map(Seq(_)))
    // dl >= 1 for every non-null text (split("\\s+",-1) never returns an
    // empty array); the guard drops null-text rows exactly as the old
    // explode did
    val perDoc = df.select((col(idCol).as("doc_id") +:
        st.getField("n_tokens").cast("long").as("dl") +:
        terms.indices.map(i =>
          st.getField("lex_hits").getItem(i).cast("long").as(s"tf$i"))): _*)
      .where(col("dl") >= 1L)
    val stats = perDoc.agg(count(lit(1)).as("nd"), (sum(col("dl")).as("tt") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0L, 1L).otherwise(0L)).as(s"df$i"))): _*)
    val score = terms.indices.map { i =>
      val idf = (length(bin(col("nd"))) - length(bin(col(s"df$i"))))
        .cast("long")
      val tfn = expr(s"($scale * 220 * tf$i * tt) div " +
        s"(100 * tf$i * tt + 30 * tt + 90 * dl * nd)")
      idf * tfn
    }.reduce(_ + _)
    perDoc
      .where(terms.indices.map(i => col(s"tf$i") > 0L).reduce(_ || _))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Deterministic weighted bottom-k sample — integer priority sampling
    * (Ohlsson's sequential Poisson sampling; Duffield–Lund–Thorup), with
    * the uniform draw replaced by the engine-reproducible [[sampleRank]]
    * hash: priority = (hash(id) · 2²⁰) div weight, keep the k smallest
    * priorities. Inclusion probability rises with weight — token count
    * here, the "prefer substantial documents" prior a fixed-size corpus
    * draw wants — while the whole draw stays a pure function of ids, so
    * re-runs, speculative task retries and the SQL oracle pick identical
    * rows. The 2²⁰ pre-scale keeps the floored quotient discriminating
    * (hash alone is < 2²⁰, so dividing by long-doc weights would
    * collapse to 0); the (priority, id) tie-break totals the order.
    *
    * Plan shape: one map-only scan into TakeOrderedAndProject — a k-row
    * heap per partition + k-row merge, never a full sort, never a
    * corpus shuffle (PlanAudit ts17).
    */
  def weightedSample(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    df.select(col(idCol),
        tokenCountOf(stats(col(textCol))).cast("long").as("n_tok"),
        sampleRank(col(idCol)).as("hash_r"))
      .withColumn("pri", expr("(hash_r * 1048576) div (n_tok + 1)"))
      .orderBy(col("pri"), col(idCol))
      .limit(k)
      .select(col(idCol), col("n_tok"), col("pri"))

  /** EXACT-quota stratified sample: the first `quota` documents of each
    * stratum in deterministic [[sampleRank]] order — per-source hold-out
    * slices with a guaranteed size (the rate-based sampler only hits the
    * quota in expectation). One shuffle on the stratum key; the window
    * orders within strata only, so no global sort. Strata are whole
    * partitions here — for a stratum too hot for one task, pre-filter
    * with [[sampleRank]] < bound to cap the windowed volume first.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      quota: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(sampleRank(col(idCol)), col(idCol))
    df.select(col(idCol), col(strataCol))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= quota)
  }

  /** Top-`k` characteristic terms per document, TF-IDF-style: rank by
    * term frequency descending, then document frequency ascending (rarer
    * corpus-wide beats commoner), then term. The ranking key is kept
    * all-integer deliberately — a float tf·ln(N/df) score ranks the same
    * way for fixed tf but is not bit-stable across engines, and an
    * oracle-gated operator must be.
    *
    * Plan shape: explode → (doc,term) count → term count (the df side is
    * a pure partial-agg rollup of the tf side) → shuffle join back on
    * term → one window on doc. Everything before the window is
    * map-side-combinable; vocabulary (the join key) shards freely, so no
    * single-point dimension at 100 TB.
    */
  def topTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    // tf feeds BOTH the corpus df-count and the per-doc rank join but is
    // deliberately NOT cached: the duplicated tokenize+aggregate is
    // map-side-combinable and cheap, and the r17 persist measured 1.19×
    // normalized slower at sf0.1 (cache write + IMR scan > the saved
    // pass). No spread either: a whitespace tokenize is too cheap to buy
    // its exchange.
    val tf = df
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rnk"))
  }

  /** Corpus-trained unigram surprisal — the model-free quality /
    * perplexity proxy of a quality-filtering pipeline: rare tokens carry
    * high surprise, boilerplate carries low. Per-token surprise is
    * `maxBits − floor(log2(corpus_freq))`, computed EXACTLY as an
    * integer from the bit length of the frequency (never a float log:
    * Σ log p is order-dependent under partial aggregation and one
    * engine-private libm ulp away from any oracle), so the per-doc sum
    * is bit-stable under any aggregation order; the mean is one final
    * division. Returns (doc_id, n_tokens, surprise, mean_surprise).
    *
    * Plan: explode → vocab count (map-side combinable) → shuffle join
    * back on token → per-doc sum. The vocabulary shards freely on the
    * join key — the Zipf head is small but deliberately NOT broadcast
    * (at 100 TB the tail is wide); both shuffles carry 8-byte keys.
    */
  /** Repeated-span scrubbing — the cleaning half of exact-substring
    * dedup (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better"): any word `n`-gram occurring in ≥ `minDf` distinct
    * documents is boilerplate, and every token covered by such a span is
    * cut; the document survives with its remaining tokens in order.
    * Complements the winnowing DETECTORS (dd11/dd13) — those find the
    * shared spans, this removes them. Returns
    * (doc_id, clean_text, n_kept, n_dropped), one row per input doc
    * (an all-boilerplate doc comes back with an empty clean_text —
    * dropping it is the caller's policy decision).
    *
    * Plan shape: one window pass per doc builds span grams with a
    * lead-chain (incremental, no sliding collect_list re-aggregation),
    * doc-frequency is a map-side-combinable groupBy on the gram, hot
    * spans join back by equi-join (gram keys shard freely — deliberately
    * NOT broadcast: at 100 TB the repeated-span set is as unbounded as
    * the near-dup rate), and coverage is one more same-key window — the
    * final groupBy reuses the window's doc partitioning, so the whole op
    * is three exchanges regardless of corpus size. Spans join on the raw
    * gram STRING: exact semantics, no hash-collision false scrubs; the
    * key is ~n words, and a corpus wanting 8-byte keys can pre-hash with
    * the dd2 shingle arithmetic at the usual collision odds.
    */
  def scrubRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDf: Int): DataFrame = {
    require(n >= 2, s"span length $n must be >= 2")
    // grams build MAP-ONLY from each doc's token array (array slices —
    // the bigramRows trick at span length n) instead of a corpus-wide
    // lead-chain window: the old shape shuffled the full token stream
    // once to window it and once more through the gram join, then
    // rebuilt docs via collect_list + array_sort. Here only (a) the
    // gram-frequency aggregate and (b) the HOT-gram start positions
    // shuffle — the token stream itself shuffles exactly once, as
    // doc-sized arrays into the final join — and the rebuild is array
    // arithmetic on the doc row. Output is bit-identical (same gram
    // strings, same coverage rule: token i is cut iff a hot gram starts
    // in [i-n+1, i]).
    // both cached: toks feeds the gram explode AND the final rebuild
    // join; occ feeds the frequency aggregate AND the hot-occurrence
    // semi-join — uncached, each would tokenize + re-concat the whole
    // corpus twice
    val toks = graft.ops.Dedup.trackExisting(graft.ops.Dedup.spread(df)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tk"))
      .where(size(col("tk")) > 0).persist())
    val occ = graft.ops.Dedup.trackExisting(toks.select(col("doc_id"),
        when(size(col("tk")) >= n,
          transform(sequence(lit(0), size(col("tk")) - n),
            i => concat_ws(" ", slice(col("tk"), i + 1, lit(n)))))
          .otherwise(expr("CAST(array() AS array<string>)")).as("gr"))
      .select(col("doc_id"), posexplode(col("gr")).as(Seq("pos", "gram")))
      .persist())
    val hot = occ.groupBy(col("gram"))
      .agg(count_distinct(col("doc_id")).as("df"))
      .where(col("df") >= minDf)
      .select(col("gram"))
    // hot spans join back by equi-join on the gram key (deliberately NOT
    // broadcast: at 100 TB the repeated-span set is as unbounded as the
    // near-dup rate), then collapse to per-doc start-position lists —
    // the only post-aggregate stream is hot OCCURRENCES, not all grams
    val starts = occ.join(hot, Seq("gram"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(collect_list(col("pos")).as("starts"))
    toks.join(starts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("tk"),
        array_distinct(flatten(transform(
          coalesce(col("starts"), expr("CAST(array() AS array<int>)")),
          s => sequence(s, s + n - 1)))).as("cov"))
      .select(col("doc_id"), col("tk"),
        array_except(sequence(lit(0), size(col("tk")) - 1), col("cov"))
          .as("keep"))
      .select(col("doc_id"),
        array_join(transform(col("keep"),
          p => element_at(col("tk"), p + 1)), " ").as("clean_text"),
        size(col("keep")).cast("long").as("n_kept"),
        (size(col("tk")) - size(col("keep"))).cast("long").as("n_dropped"))
  }

  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String,
      maxBits: Int = 40): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("w"))
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("freq"))
    toks.join(vocab, Seq("w"))
      .select(col("doc_id"),
        (lit(maxBits) - (length(bin(col("freq"))) - lit(1))).as("surp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("surp").cast("long")).as("surprise"))
      .withColumn("mean_surprise",
        col("surprise").cast("double") / col("n_tokens").cast("double"))
  }

  /** Bigram conditional surprisal — [[unigramSurprisal]]'s context-aware
    * refinement: per bigram (w1, w2), surprise ≈ log2 P(w2 | w1)⁻¹,
    * computed EXACTLY as `bitlen(freq(w1, ·)) − bitlen(freq(w1, w2))`
    * (integer bit lengths, never a float log — same bit-stability
    * argument as ts14: Σ log p is aggregation-order-dependent and
    * libm-private; bit lengths are not). Repetitive text (low
    * conditional surprise) scores near zero even when its unigrams are
    * rare — the failure mode a unigram proxy can't see. Docs with < 2
    * tokens have no bigrams and drop out. Returns
    * (doc_id, n_bigrams, surprise, mean_surprise).
    *
    * Plan: one per-doc window builds the bigram stream; bigram counts
    * are map-side combinable; the context count is a pure rollup of the
    * bigram table (no second pass over the corpus); both join keys are
    * vocabulary-sized and shard freely.
    */
  def bigramSurprisal(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val bi = bigramRows(df, idCol, textCol)
    val bf = bi.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("bfreq"))
    val cf = bf.groupBy(col("w1")).agg(sum(col("bfreq")).as("cfreq"))
    bi.join(bf, Seq("w1", "w2")).join(cf, Seq("w1"))
      .select(col("doc_id"),
        (length(bin(col("cfreq"))) - length(bin(col("bfreq")))).as("surp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("surp").cast("long")).as("surprise"))
      .withColumn("mean_surprise",
        col("surprise").cast("double") / col("n_bigrams").cast("double"))
  }

  /** Cross-corpus LM scoring — the CCNet/KenLM curation stage: a bigram
    * LM is FROZEN from a reference corpus (the Wikipedia side) and
    * scores a target corpus (the crawl side); low mean surprise ≈ "reads
    * like the reference". Same integer-bits surprisal as
    * [[bigramSurprisal]] (bitlen(cfreq) − bitlen(bfreq) — the exact,
    * transcendental-free −log₂ p proxy), extended with the two OOV
    * regimes a cross-corpus score needs, both integer-exact:
    *
    *   - unseen bigram under a seen prefix: bitlen(cfreq) + 1 — one bit
    *     worse than any OBSERVED continuation of that prefix can cost
    *     (observed max is bitlen(cfreq) − 1 at bfreq = 1);
    *   - unseen prefix entirely: a flat 32-bit penalty (the "this isn't
    *     the reference language" ceiling).
    *
    * Plan shape: the reference is scanned once into (w1,w2)→bfreq and
    * w1→cfreq tables; the target joins them LEFT on its bigrams — two
    * equi-joins, per-doc sum, no window over the reference at score
    * time. Returns (doc_id, n_bigrams, surprise, mean_surprise).
    */
  /** The (doc_id, w1, w2) bigram stream of a corpus, built MAP-ONLY by
    * zipping each doc's token array with its own tail — same multiset
    * as a per-doc lag window, without the corpus-wide token shuffle +
    * sort the window form pays (at 100 TB that shuffle dwarfs the LM
    * joins it feeds). Docs under 2 tokens emit nothing, exactly like
    * the window form's null-lag filter.
    */
  private def bigramRows(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("tk"), lit(1), size(col("tk")) - 1).as("w1"),
        slice(col("tk"), lit(2), size(col("tk")) - 1).as("w2"))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  def bigramSurprisalAgainst(target: DataFrame, reference: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def bigrams(df: DataFrame): DataFrame = bigramRows(df, idCol, textCol)
    val bf = bigrams(reference).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("bfreq"))
    val cf = bf.groupBy(col("w1")).agg(sum(col("bfreq")).as("cfreq"))
    bigrams(target)
      .join(bf, Seq("w1", "w2"), "left")
      .join(cf, Seq("w1"), "left")
      .select(col("doc_id"),
        when(col("cfreq").isNull, lit(32L))
          .when(col("bfreq").isNull,
            (length(bin(col("cfreq"))) + 1).cast("long"))
          .otherwise((length(bin(col("cfreq"))) -
            length(bin(col("bfreq")))).cast("long")).as("surp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("surp")).as("surprise"))
      .withColumn("mean_surprise",
        col("surprise").cast("double") / col("n_bigrams").cast("double"))
  }

  /** Concat-and-cut sequence packing — the GPT-pretraining layout: per
    * shard, documents are concatenated in deterministic [[sampleRank]]
    * order and the token stream is cut every `seqLen` tokens, docs
    * straddling cuts (zero padding waste; the trainer splits them).
    * Each doc maps to its (start_seq, start_off) coordinates plus the
    * number of sequences it spans — everything a loader needs to
    * materialize any sequence range.
    *
    * Shape: ONE per-shard ordered window (the running token offset);
    * all arithmetic integral (token offsets stay well under 2^63 —
    * whole-corpus totals at 100 TB are ~1e13). Sharding keys the
    * parallelism: sequences are numbered per shard, which is how
    * training shards are laid out anyway.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      shardCol: String, seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val w = Window.partitionBy(col(shardCol))
      .orderBy(sampleRank(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), col(shardCol),
        size(split(col(textCol), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col(idCol), col(shardCol), col("n_tokens"),
        expr(s"off DIV $seqLen").as("start_seq"),
        (col("off") % seqLen).as("start_off"),
        (expr(s"(off + n_tokens - 1) DIV $seqLen") -
          expr(s"off DIV $seqLen") + 1L).as("n_seqs"))
  }

  /** Deterministic per-epoch loader order over the packed sequence
    * space: every shard's sequences 0..n−1 receive a reproducible
    * pseudo-random position that CHANGES with `epoch` — the training-
    * loader contract (fresh order each epoch, same order on every
    * re-run/resume, no stored RNG state; resuming mid-epoch is "skip to
    * epoch_pos p", a pure coordinate filter). Order key = the
    * [[sampleRank]] affine mix of the sequence id shifted by an
    * epoch-dependent prime offset; (key, seq) totals the order. Epoch 0
    * is intentionally NOT the identity. One per-shard window — the same
    * partitioning discipline as packing itself.
    */
  def epochOrder(seqCounts: DataFrame, shardCol: String,
      epoch: Long): DataFrame = {
    val w = Window.partitionBy(col(shardCol))
      .orderBy(col("shuffle_key"), col("seq"))
    seqCounts
      .select(col(shardCol),
        explode(sequence(lit(0L), col("n_seqs") - 1)).as("seq"))
      .withColumn("shuffle_key",
        (col("seq") + lit(epoch) * lit(999983L)) % lit(1000003L) *
          lit(2654435761L) % lit(1000003L))
      .withColumn("epoch_pos",
        (row_number().over(w) - 1).cast("long"))
  }

  /** Per-shard packed-sequence totals from a [[packSequences]] layout —
    * the `n_seqs` input [[epochOrder]] wants (the last doc's
    * end coordinate; sequences are gap-free by construction).
    */
  def shardSeqCounts(packed: DataFrame, shardCol: String): DataFrame =
    packed.groupBy(col(shardCol))
      .agg(max(col("start_seq") + col("n_seqs")).as("n_seqs"))

  /** The loader-facing inverse of [[packSequences]]: one row per
    * (sequence, contributing doc) with the doc-local token slice
    * [take_from, take_from + take_n) that sequence consumes — exactly
    * what materializing sequence `s` of a shard requires, with no token
    * data touched (pure coordinate arithmetic + a 1→n_seqs explode; a
    * doc appears once per sequence it straddles).
    */
  def sequenceManifest(df: DataFrame, idCol: String, textCol: String,
      shardCol: String, seqLen: Long): DataFrame = {
    val packed = packSequences(df, idCol, textCol, shardCol, seqLen)
    packed
      .select(col(idCol), col(shardCol), col("n_tokens"),
        col("start_seq"), col("start_off"),
        explode(sequence(lit(0L), col("n_seqs") - 1L)).as("k"))
      .withColumn("take_from",
        when(col("k") === 0L, 0L)
          .otherwise(lit(seqLen) - col("start_off") +
            (col("k") - 1L) * seqLen))
      .select(col(shardCol), (col("start_seq") + col("k")).as("seq_id"),
        col(idCol), col("take_from"),
        least(col("n_tokens") - col("take_from"),
          when(col("k") === 0L, lit(seqLen) - col("start_off"))
            .otherwise(lit(seqLen))).as("take_n"))
  }

  /** Incremental packing — the per-append form of [[packSequences]]:
    * pack ONLY `batch`, continuing each shard's token stream from
    * `priorTotals` (shardCol, total_tokens). Appending a batch costs
    * the batch, never a corpus rescan; the sequence space is
    * APPEND-ORDERED (batch docs follow everything already packed, in
    * [[sampleRank]] order within the batch) — the ingest-time contract,
    * where earlier coordinates are immutable because training shards
    * already consumed them. A shard absent from `priorTotals` starts
    * at offset 0.
    */
  def packSequencesAppend(batch: DataFrame, idCol: String, textCol: String,
      shardCol: String, seqLen: Long, priorTotals: DataFrame): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val w = Window.partitionBy(col(shardCol))
      .orderBy(sampleRank(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    batch.select(col(idCol), col(shardCol),
        size(split(col(textCol), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("local_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .join(broadcast(priorTotals
          .select(col(shardCol), col("total_tokens").cast("long"))),
        Seq(shardCol), "left")
      .withColumn("off",
        col("local_off") + coalesce(col("total_tokens"), lit(0L)))
      .select(col(idCol), col(shardCol), col("n_tokens"),
        expr(s"off DIV $seqLen").as("start_seq"),
        (col("off") % seqLen).as("start_off"),
        (expr(s"(off + n_tokens - 1) DIV $seqLen") -
          expr(s"off DIV $seqLen") + 1L).as("n_seqs"))
  }

  /** Phrase-blocklist scan (the NSFW/boilerplate/banned-phrase curation
    * stage) via one Aho–Corasick automaton pass per document
    * ([[graft.functions.BlocklistHitsExpr]]): O(text + hits) regardless
    * of how many patterns the blocklist holds, where a regexp
    * alternation or per-pattern `contains` chain pays O(text·patterns)
    * — the difference between feasible and not at 100 TB × a
    * thousands-entry blocklist. Counts every (pattern, end-position)
    * occurrence, overlaps included. Map-only; returns per-doc total
    * hits and the number of distinct patterns that fired.
    */
  def blocklistStats(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val hits = graft.functions.TextExprs.blocklistHits(col(textCol),
      patterns)
    df.select(col(idCol).as("doc_id"), hits.as("hits"))
      .select(col("doc_id"),
        aggregate(col("hits"), lit(0L), (a, x) => a + x).as("n_hits"),
        size(filter(col("hits"), _ > 0L)).cast("long").as("n_patterns"))
  }

  /** Blocklist scrub — [[blocklistStats]]'s cleaning half: delete the
    * union of all matched spans (overlaps merge through the cover
    * mask) in the same single automaton pass, map-only. Returns
    * (doc_id, scrubbed, n_cut).
    */
  def blocklistScrub(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String], carryCols: Seq[String] = Nil): DataFrame =
    df.select(col(idCol).as("doc_id") +:
        graft.functions.TextExprs.blocklistScrub(col(textCol), patterns)
          .as("scrubbed") +:
        length(col(textCol)).cast("long").as("n0") +:
        carryCols.map(col): _*)
      .select(col("doc_id") +: col("scrubbed") +:
        (col("n0") - length(col("scrubbed"))).cast("long").as("n_cut") +:
        carryCols.map(col): _*)

  /** DSIR-style importance-weighted data selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * pick from the raw corpus the documents that look most like a small
    * TARGET domain, by importance weight log p_target(doc) −
    * log p_raw(doc) under cheap n-gram language models. Here both LMs
    * are the frozen bigram tables of [[bigramSurprisalAgainst]] and the
    * log-probabilities its integer bit-length surprisal (surprisal ≈
    * −log₂ p, so importance = raw_bits − tgt_bits) — every score a
    * BIGINT, bit-stable under any aggregation order.
    *
    * Plan shape: the corpus windows into bigrams once per scoring pass;
    * each pass is two equi-joins against its LM's frequency tables
    * (sharded freely — the Zipf tail is wide at 100 TB, deliberately
    * not broadcast) and one doc rollup; selection is a global
    * TakeOrdered of the `quota` best (importance DESC, id tie-break).
    * Nothing ever pairs documents — cost is linear in corpus tokens.
    */
  def dsirSelect(corpus: DataFrame, target: DataFrame, idCol: String,
      textCol: String, quota: Int): DataFrame = {
    require(quota > 0, s"dsirSelect needs quota >= 1, got $quota")
    // the bigram stream is DELIBERATELY re-derived per consumer (three
    // map-only passes), not cached: bigramRows is a tokenize + zip
    // explode straight off the parquet scan, and materializing the
    // EXPLODED stream (far wider than the source text) measured 1.5x
    // slower normalized than re-deriving it — the ts28 lesson again
    val bi = bigramRows(corpus, idCol, textCol)
    def lm(ref: DataFrame): (DataFrame, DataFrame) = {
      val bf = ref.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("bfreq"))
      (bf, bf.groupBy(col("w1")).agg(sum(col("bfreq")).as("cfreq")))
    }
    def scoreAgainst(bf: DataFrame, cf: DataFrame): DataFrame = bi
      .join(bf, Seq("w1", "w2"), "left")
      .join(cf, Seq("w1"), "left")
      .select(col("doc_id"),
        when(col("cfreq").isNull, lit(32L))
          .when(col("bfreq").isNull,
            (length(bin(col("cfreq"))) + 1).cast("long"))
          .otherwise((length(bin(col("cfreq"))) -
            length(bin(col("bfreq")))).cast("long")).as("surp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("surp")).as("surprise"))
    val (bfT, cfT) = lm(bigramRows(target, idCol, textCol))
    val (bfR, cfR) = lm(bi)
    val sTgt = scoreAgainst(bfT, cfT)
      .select(col("doc_id"), col("n_bigrams"),
        col("surprise").as("tgt_bits"))
    val sRaw = scoreAgainst(bfR, cfR)
      .select(col("doc_id"), col("surprise").as("raw_bits"))
    sTgt.join(sRaw, Seq("doc_id"))
      .select(col("doc_id"), col("n_bigrams"), col("raw_bits"),
        col("tgt_bits"), (col("raw_bits") - col("tgt_bits")).as("importance"))
      .orderBy(col("importance").desc, col("doc_id"))
      .limit(quota)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of two retrieval
    * shortlists — the standard hybrid-search combiner (BM25 ∪ dense
    * ANN): each document's fused score is Σ 1/(kRrf + rank), here in
    * exact integer arithmetic (`1000000 div (kRrf + rank)`; a list
    * that didn't retrieve the doc contributes 0), so fusion has an
    * exact SQL oracle and is bit-stable. Each side's rank comes from a
    * row_number over ITS OWN order — a single-partition sort, which is
    * fine because inputs are top-k shortlists (k rows by construction,
    * never the corpus).
    */
  def rrfFuse(a: DataFrame, aOrder: Seq[Column], b: DataFrame,
      bOrder: Seq[Column], idCol: String, k: Int,
      kRrf: Int = 60): DataFrame = {
    require(k > 0, s"rrfFuse needs k >= 1, got $k")
    val ra = a.select(col(idCol),
      row_number().over(Window.orderBy(aOrder: _*)).cast("long").as("rank_a"))
    val rb = b.select(col(idCol),
      row_number().over(Window.orderBy(bOrder: _*)).cast("long").as("rank_b"))
    ra.join(rb, Seq(idCol), "full_outer")
      .select(col(idCol), col("rank_a"), col("rank_b"),
        (coalesce(expr(s"1000000 DIV ($kRrf + rank_a)"), lit(0L)) +
          coalesce(expr(s"1000000 DIV ($kRrf + rank_b)"), lit(0L)))
          .as("rrf_score"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(k)
  }
}
