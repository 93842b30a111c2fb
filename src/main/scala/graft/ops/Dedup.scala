package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, at three cost
  * tiers:
  *
  *  - exact: hash-groupBy on content (or sha256 of content) — one shuffle
  *    on the hash key, scales to any corpus size;
  *  - n-gram Jaccard: shingle explode + self-join on shingle — exact
  *    near-dup pairs, quadratic only within shingle buckets;
  *  - MinHash + LSH: constant-size signatures, band-bucket join — the
  *    100 TB path: candidate generation cost is linear in corpus size,
  *    verification only within buckets;
  *  - SimHash: 64-bit signature, near-dups = small Hamming distance.
  *
  * All hashes derive from [[charHash]], a rolling polynomial over
  * characters, so results are engine-reproducible (unlike murmur3).
  */
object Dedup {

  val P: Long = 1000000007L

  /** Per-call transient caches (signature/shingle tables persisted so a
    * self-join doesn't recompute the text-hash pipeline on both sides).
    * They cannot be unpersisted inside the operator — the returned plan
    * still reads them — so each is registered here and released either by
    * [[releaseCaches]] (bulk, after the caller materializes results) or by
    * `spark.catalog.clearCache()` (persist is CacheManager-visible).
    * Index-builder persists (minhashIndex/simhashIndex) are deliberately
    * NOT tracked: they are build-once/probe-many caches whose lifetime is
    * the index object's.
    */
  private val transientCaches =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register an ALREADY-persisted frame in the transient registry —
    * for returned round-state caches (the final dupClusters/pageRank/
    * kCore round) that the operator cannot unpersist itself because the
    * returned plan still reads them. Registered frames release through
    * [[releaseCaches]] / [[withCaches]] exactly like [[tracked]] ones;
    * `spark.catalog.clearCache()` (the older convention) keeps working.
    */
  private[graft] def trackExisting(df: DataFrame): DataFrame = {
    transientCaches.removeIf(
      _.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    transientCaches.add(df)
    registerScoped(df)
    df
  }

  /** Scale-adaptive parallelism for CPU-heavy map work over small
    * inputs: a small corpus reads as 1-2 splits (a parquet row group is
    * the split floor), so a many-core session runs heavy per-row
    * expressions (shingling, MinHash signatures, media codecs, stats
    * structs) on one task while the rest of the machine idles. When the
    * incoming partition count is below the session's default
    * parallelism, round-robin the ROWS across it — what shuffles is the
    * raw pre-compute input (ids, dims, text), once, before the expensive
    * expressions; at scale the split count already exceeds
    * defaultParallelism and this is an exact no-op (no exchange in the
    * plan). Deterministic under retries: sortBeforeRepartition (default
    * on) pins the row→partition assignment.
    */
  private[graft] def spread[T](ds: org.apache.spark.sql.Dataset[T])
      : org.apache.spark.sql.Dataset[T] = {
    // a streaming plan has no batch RDD to inspect (ds.rdd trips the
    // batch-only checker) and its micro-batch parallelism is the
    // source's concern — pass it through untouched
    if (ds.isStreaming) ds
    // an input with upstream exchanges must NOT be probed with .rdd:
    // under AQE that finalizes and RUNS the shuffle stages eagerly in a
    // separate QueryExecution the real query never reuses (the same
    // eager-construction trap r17 removed from the chain variants). The
    // exchange already distributes the rows across the session's shuffle
    // partitions, so spread would be a no-op there anyway — pass through.
    else if (!scanRooted(ds.queryExecution.optimizedPlan)) ds
    else {
      // narrow scan-rooted lineage: .rdd runs no jobs (partition count
      // comes from the file index), so the probe is free
      val target = ds.sparkSession.sparkContext.defaultParallelism
      if (ds.rdd.getNumPartitions < target) ds.repartition(target) else ds
    }
  }

  /** True when every operator between the plan's leaves and its root is
    * narrow (projection/filter/generate-shaped) — i.e. computing `.rdd`
    * partition metadata cannot trigger shuffle-stage execution under AQE.
    */
  private def scanRooted(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    p match {
      case _: LeafNode => true
      case _: Project | _: Filter | _: SubqueryAlias | _: Generate |
          _: Sample | _: Union | _: TypedFilter | _: SerializeFromObject |
          _: DeserializeToObject | _: Expand =>
        p.children.forall(scanRooted)
      case _ => false
    }
  }

  private def tracked(df: DataFrame): DataFrame = {
    // purge entries already released elsewhere (spark.catalog.clearCache,
    // the repo-wide convention) so the registry itself stays bounded in
    // long-lived drivers that never call releaseCaches()
    transientCaches.removeIf(
      _.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    val p = df.persist()
    transientCaches.add(p)
    registerScoped(p)
    p
  }

  /** Unpersist every transient cache registered by pair-finding calls so
    * far. Safe to call between jobs; results already materialized by the
    * caller are unaffected (un-materialized plans just recompute).
    */
  def releaseCaches(): Unit = {
    var df = transientCaches.poll()
    while (df != null) { df.unpersist(); df = transientCaches.poll() }
  }

  // Per-THREAD scope stack for withCaches: each open block records only
  // the frames ITS OWN thread registered, so two services running
  // concurrent scoped compositions can interleave freely — the old
  // before/after registry diff released the OTHER block's frames
  // whenever the blocks finished out of registration order.
  private val scopeStack = new ThreadLocal[List[
      java.util.IdentityHashMap[DataFrame, java.lang.Boolean]]] {
    override def initialValue
        : List[java.util.IdentityHashMap[DataFrame, java.lang.Boolean]] = Nil
  }

  private def registerScoped(df: DataFrame): Unit =
    scopeStack.get() match {
      case top :: _ => top.put(df, java.lang.Boolean.TRUE); ()
      case Nil => ()
    }

  /** Run `body` and release every transient pair-finding cache THIS
    * THREAD registered inside the block — concurrent scopes on other
    * threads (another in-flight composition's) and caches registered
    * before the block are left alone, so a long-lived service can wrap
    * each dedup/curation call without stepping on concurrent work — and
    * without the unbounded storage-memory growth of never calling
    * [[releaseCaches]] at all. Nested blocks scope independently: the
    * inner block releases what it registered, the outer the rest.
    *
    * MATERIALIZE results inside the block (count/collect/write): a
    * lazily-returned DataFrame is still correct afterwards but
    * recomputes its pair pipeline uncached on first use. A composition
    * that spawns ITS OWN threads registering caches must release those
    * through [[releaseCaches]] — the scope is thread-local by design.
    */
  def withCaches[T](body: => T): T = {
    val scope =
      new java.util.IdentityHashMap[DataFrame, java.lang.Boolean]()
    scopeStack.set(scope :: scopeStack.get())
    try body
    finally {
      scopeStack.set(scopeStack.get().tail)
      val it = transientCaches.iterator()
      while (it.hasNext) {
        val df = it.next()
        if (scope.containsKey(df)) { df.unpersist(); it.remove() }
      }
    }
  }

  /** Ordered polynomial char hash — reproducible in any engine with an
    * ordered fold (single-pass expression; arithmetic identical to the
    * `aggregate(regexp_extract_all(...))` formulation the oracles replay).
    */
  def charHash(text: Column): Column =
    graft.functions.TextExprs.charHash(text)

  /** Exact dedup: canonical id (min) + multiplicity per distinct content
    * hash. Group on sha256 rather than the raw text so the shuffle key is
    * 32 bytes regardless of document size.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), sha2(col(textCol), 256).as("content_sha"))
      .groupBy("content_sha")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingles of a text column (empty when fewer than
    * n words). Single-pass expression (see TextExprs) with the same
    * semantics as split + window concat + array_distinct.
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.TextExprs.shingleStrings(text, n)

  /** Exact n-gram Jaccard near-dup pairs: docs sharing ≥ `threshold`
    * Jaccard similarity over word `n`-gram shingle sets. Returns
    * (id_a, id_b, jaccard) with id_a < id_b.
    *
    * Plan shape: explode shingles → self-equi-join on shingle (shuffle on
    * shingle hash) → pair-count aggregate → jaccard. No cross join; cost
    * is bounded by shingle-bucket sizes, and a distinct-shingle explode
    * keeps buckets duplicate-free.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    // persisted: read by the pair self-join (twice) and the count join;
    // spread first — the shingling pass is the CPU-heavy stage
    val sh = tracked(spread(df)
      .select(col(idCol).as("doc"), shingles(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0))
    val counts = sh.select(col("doc"), size(col("sh")).as("cnt"))
    // join on a 64-bit shingle hash: 8-byte shuffle keys instead of
    // ~20-byte strings (shingles are distinct per doc, so equal hashes in
    // a pair = equal shingles up to 2^-64 collisions)
    val ex = sh.select(col("doc"), explode(col("sh")).as("shingle"))
      .select(col("doc"), xxhash64(col("shingle")).as("shingle_h"))
    val pairs = ex.as("a").join(ex.as("b"),
        col("a.shingle_h") === col("b.shingle_h") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(counts.withColumnsRenamed(Map("doc" -> "id_a_c", "cnt" -> "cnt_a")),
        col("id_a") === col("id_a_c"))
      .join(counts.withColumnsRenamed(Map("doc" -> "id_b_c", "cnt" -> "cnt_b")),
        col("id_b") === col("id_b_c"))
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") /
          (col("cnt_a") + col("cnt_b") - col("common")).cast("double"))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Containment near-dup pairs: c(A→B) = |A∩B| / |A| over word n-gram
    * shingle sets — the ASYMMETRIC doc-in-doc signal Jaccard misses when
    * lengths differ: a short document fully embedded in a long one has
    * Jaccard ≈ |A|/|B| (arbitrarily small) but containment 1.0. Quote
    * farms, boilerplate wrappers, and page-plus-navigation scrapes in a
    * training corpus are exactly this shape. Returns (id_a, id_b,
    * common, cont_ab, cont_ba) with id_a < id_b, kept when EITHER
    * direction clears `threshold`.
    *
    * Plan shape is [[jaccardPairs]]'s: distinct-shingle explode →
    * 8-byte-hash equi-join → pair-count aggregate — no cross join, cost
    * bounded by shingle-bucket sizes; only the final projection differs
    * (per-side divisors instead of the union size).
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    // persisted: read by the pair self-join (twice) and the count join;
    // spread first — the shingling pass is the CPU-heavy stage
    val sh = tracked(spread(df)
      .select(col(idCol).as("doc"), shingles(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0))
    val counts = sh.select(col("doc"), size(col("sh")).as("cnt"))
    val ex = sh.select(col("doc"), explode(col("sh")).as("shingle"))
      .select(col("doc"), xxhash64(col("shingle")).as("shingle_h"))
    val pairs = ex.as("a").join(ex.as("b"),
        col("a.shingle_h") === col("b.shingle_h") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(counts.withColumnsRenamed(Map("doc" -> "id_a_c", "cnt" -> "cnt_a")),
        col("id_a") === col("id_a_c"))
      .join(counts.withColumnsRenamed(Map("doc" -> "id_b_c", "cnt" -> "cnt_b")),
        col("id_b") === col("id_b_c"))
      .select(col("id_a"), col("id_b"), col("common"),
        (col("common").cast("double") / col("cnt_a").cast("double"))
          .as("cont_ab"),
        (col("common").cast("double") / col("cnt_b").cast("double"))
          .as("cont_ba"))
      .where(greatest(col("cont_ab"), col("cont_ba")) >= threshold)
  }

  /** Frequency-capped Jaccard near-dup pairs — the 100 TB-scale variant:
    * shingles occurring in more than `maxDocFreq` documents are excluded
    * from CANDIDATE GENERATION (they are stop-shingles that would create
    * quadratic pair blowup), but verification computes the TRUE Jaccard
    * over the full shingle sets. Recall trade-off: a pair whose every
    * common shingle is hot is missed; any surfaced pair carries its exact
    * similarity. (The CCNet/Gopher-style dedup compromise.)
    */
  def jaccardPairsCapped(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxDocFreq: Int): DataFrame =
    cappedCommon(df, idCol, textCol, n, maxDocFreq,
      (ubc, ca, cb) => ubc / (ca + cb - ubc) >= threshold)
      .select(col("id_a"), col("id_b"),
        (col("common") / (col("cnt_a") + col("cnt_b") - col("common")))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)

  /** Frequency-capped containment pairs — [[containmentPairs]]' 100 TB
    * path, exactly as [[jaccardPairsCapped]] is [[jaccardPairs]]': the
    * same one-shuffle stop-shingle cap and candidate expansion, with the
    * conservative upper bound and the exact verification both taken on
    * the ASYMMETRIC containment (max of the two directions). `ubc ≥
    * common` makes the bound filter lossless in each divisor, so any
    * pair whose true containment clears `threshold` and shares ≥ 1 rare
    * shingle survives to exact verification.
    */
  def containmentPairsCapped(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxDocFreq: Int): DataFrame =
    cappedCommon(df, idCol, textCol, n, maxDocFreq,
      (ubc, ca, cb) => greatest(ubc / ca, ubc / cb) >= threshold)
      .select(col("id_a"), col("id_b"),
        col("common").cast("long").as("common"),
        (col("common") / col("cnt_a")).as("cont_ab"),
        (col("common") / col("cnt_b")).as("cont_ba"))
      .where(greatest(col("cont_ab"), col("cont_ba")) >= threshold)

  /** [[jaccardPairsCapped]] with graceful degradation under DENSE
    * duplication: over-cap shingles emit a canonical star (bucket-min doc
    * paired with every other occurrence) instead of being discarded, so a
    * template farm whose every shingle is "hot" — exactly the group the
    * plain cap zeroes out on — still surfaces its duplicates, each
    * verified with its TRUE Jaccard. Candidate work stays bounded:
    * O(cap²) per rare bucket, O(df) per hot bucket (linear in the
    * occurrences already shuffled). Recall trade vs exact: only
    * star-to-center pairs of a purely-hot group are emitted (leaves are
    * not paired with each other), which is precisely what canonical-keep
    * dedup consumes.
    */
  def jaccardPairsCappedStar(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxDocFreq: Int): DataFrame =
    cappedCommon(df, idCol, textCol, n, maxDocFreq,
      (ubc, ca, cb) => ubc / (ca + cb - ubc) >= threshold, sampleHot = true)
      .select(col("id_a"), col("id_b"),
        (col("common") / (col("cnt_a") + col("cnt_b") - col("common")))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)

  /** [[containmentPairsCapped]] with the same canonical-star graceful
    * degradation as [[jaccardPairsCappedStar]].
    */
  def containmentPairsCappedStar(df: DataFrame, idCol: String,
      textCol: String, n: Int, threshold: Double, maxDocFreq: Int)
      : DataFrame =
    cappedCommon(df, idCol, textCol, n, maxDocFreq,
      (ubc, ca, cb) => greatest(ubc / ca, ubc / cb) >= threshold,
      sampleHot = true)
      .select(col("id_a"), col("id_b"),
        col("common").cast("long").as("common"),
        (col("common") / col("cnt_a")).as("cont_ab"),
        (col("common") / col("cnt_b")).as("cont_ba"))
      .where(greatest(col("cont_ab"), col("cont_ba")) >= threshold)

  /** [[jaccardPairsCappedStar]] plus ADJACENCY CHAINING across hot
    * buckets: the star pairs every hot-bucket occurrence with the
    * bucket's ONE minimum doc, which recovers a group only when that
    * minimum happens to be a true near-duplicate — in a corpus where one
    * hot shingle spans MANY duplicate groups, every group except the
    * minimum's own fails verification and vanishes (the measured ×10
    * star doc-recall ceiling, ~0.52). Chaining adds each hot
    * occurrence's PREDECESSOR in doc-id order within its bucket as a
    * second candidate source: a duplicate group's members sit adjacent
    * in the sorted bucket whenever ids correlate with content (ingest
    * order, re-inflation), so every group gets in-group candidate edges
    * regardless of who the bucket minimum is. Still O(df) candidates per
    * bucket; the cost over the star is one lag window keyed on the
    * 8-byte shingle hash over hot occurrences only. Exact verification
    * downstream is unchanged — surfaced pairs always carry true
    * similarity; chaining only widens WHICH true pairs can surface.
    *
    * SKEW BOUND: predecessors come from [[adjacencyChainEdges]] — a
    * per-shingle range-bucketed lag (a shingle whose df exceeds
    * [[chainRowsPerTask]] splits into up to [[chainBuckets]] contiguous
    * doc-id ranges, each sorted on its own task, boundaries stitched
    * from the tiny per-range min/max summary; ordinary hot shingles
    * keep one bucket, so the machinery is free until a bucket would
    * actually straggle) that reproduces the per-shingle-window edge set
    * exactly. A mega-shingle occurring in a large fraction of a 100 TB
    * corpus costs O(df/64 · log(df/64)) on its largest task instead of
    * a single-task O(df · log df) straggler. The star source
    * (bucket-minimum pairing) is skew-free either way.
    *
    * (r17: the former EAGER NOTE no longer applies — the chain's range
    * buckets now use PER-SHINGLE bounds that ride the bounded-collect
    * aggregate (ds(0)/mx), so constructing this plan runs no Spark job
    * and the cache-materialization planner trap cannot arise here.)
    *
    * `rowsPerTask` overrides the [[chainRowsPerTask]] skew bound —
    * a test seam (DedupSpec drives the bucketed path on fixture-sized
    * corpora with it); production call sites take the default.
    */
  def jaccardPairsCappedChain(df: DataFrame, idCol: String,
      textCol: String, n: Int, threshold: Double, maxDocFreq: Int,
      rowsPerTask: Long = chainRowsPerTask): DataFrame =
    cappedCommon(df, idCol, textCol, n, maxDocFreq,
      (ubc, ca, cb) => ubc / (ca + cb - ubc) >= threshold,
      sampleHot = true, chainHot = true, rowsPerTask = rowsPerTask)
      .select(col("id_a"), col("id_b"),
        (col("common") / (col("cnt_a") + col("cnt_b") - col("common")))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)

  /** [[containmentPairsCappedStar]] with [[jaccardPairsCappedChain]]'s
    * adjacency chaining.
    */
  def containmentPairsCappedChain(df: DataFrame, idCol: String,
      textCol: String, n: Int, threshold: Double, maxDocFreq: Int,
      rowsPerTask: Long = chainRowsPerTask): DataFrame =
    cappedCommon(df, idCol, textCol, n, maxDocFreq,
      (ubc, ca, cb) => greatest(ubc / ca, ubc / cb) >= threshold,
      sampleHot = true, chainHot = true, rowsPerTask = rowsPerTask)
      .select(col("id_a"), col("id_b"),
        col("common").cast("long").as("common"),
        (col("common") / col("cnt_a")).as("cont_ab"),
        (col("common") / col("cnt_b")).as("cont_ba"))
      .where(greatest(col("cont_ab"), col("cont_ba")) >= threshold)

  /** Shared body of the capped near-dup variants: stop-shingle-capped
    * candidate generation, a caller-chosen conservative bound filter on
    * (upper-bound common, |A|, |B|), then exact verification over the
    * full shingle sets. Returns one row per surviving pair:
    * (id_a, id_b, common: double, cnt_a, cnt_b).
    */
  private def cappedCommon(df: DataFrame, idCol: String, textCol: String,
      n: Int, maxDocFreq: Int,
      bound: (Column, Column, Column) => Column,
      sampleHot: Boolean = false, chainHot: Boolean = false,
      rowsPerTask: Long = chainRowsPerTask): DataFrame = {
    // hash shingles (8-byte elements): the candidate explode and the
    // verification arrays shuffle long[]s, not strings. NO spread here:
    // the first consumer is the bounded-collect aggregate, and fanning
    // the build to defaultParallelism partitions multiplies its map-side
    // partials per hot shingle (measured r17: dd2b shuffle 1.27M→1.47M
    // records, 1.32-1.38× at 8 cores) — the spread rule is
    // hashing-before-JOIN, never hashing-before-AGGREGATE
    val sh = tracked(df
      .select(col(idCol).as("doc"), shingleHashes(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("cnt", size(col("sh"))))
    val ex = sh.select(col("doc"), explode(col("sh")).as("shingle"))
    // ONE shuffle does doc-frequency capping AND bucket building: the
    // bounded-collect aggregate keeps an exact per-shingle count but at
    // most maxDocFreq member docs, so memory per key is capped even for
    // a mega-hot stop-shingle at 100 TB, and buckets for rare shingles
    // (df ≤ cap) come out complete and sorted. Persisted: read by the
    // hot-set extraction and the pair expansion.
    val freq = tracked(ex.groupBy("shingle")
      .agg(graft.functions.BoundedCollect
        .boundedCollect(col("doc"), maxDocFreq).as("bc")))
    val rare = freq.where(col("bc.df") <= maxDocFreq)
      .select(col("bc.ds").as("ds"))
    // per-doc hot-shingle count (bounds how much the capped pair-count
    // can undercount): the hot stop-shingle set is tiny by construction,
    // so this is a broadcast semi-join probe whose groupBy shuffles only
    // the hot OCCURRENCES — a sliver of the exploded table
    val hotSet = freq.where(col("bc.df") > maxDocFreq).select("shingle")
    val hotCnt = ex.join(broadcast(hotSet), Seq("shingle"), "left_semi")
      .groupBy("doc").agg(count(lit(1)).as("hot_cnt"))
    val stats = sh.select(col("doc"), col("cnt"))
      .join(hotCnt, Seq("doc"), "left")
      .select(col("doc"), col("cnt"),
        coalesce(col("hot_cnt"), lit(0L)).as("hot_cnt"))
    // shared-rare-shingle count per pair: in-bucket ordered expansion
    // (O(cap²) per bucket at any corpus size), then a count aggregate
    // shuffling bare (id, id, n) rows — no arrays
    val rareCk = rare.where(size(col("ds")) >= 2)
      .select(explode(orderedPairs(col("ds"))).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("ck"))
    // graceful degradation for dense duplication (template farms): a
    // shingle whose doc-frequency exceeds the cap contributes a CANONICAL
    // STAR instead of nothing — every occurrence pairs its doc with the
    // bucket's exact minimum doc-id (bounded_collect is min-k, so
    // ds(0) IS the group min, deterministically). Per bucket that is
    // O(df) candidate rows — LINEAR, the cheap side of the O(cap²)
    // budget — and the shuffle is bounded by the hot occurrence count
    // already paid for hot_cnt. Star candidates carry ck = 0 (they share
    // no RARE shingles by construction unless the rare path also found
    // them, in which case max() keeps the informative count); the
    // conservative ubc bound and the exact verification downstream are
    // unchanged, so surfaced pairs still carry true similarity.
    val ck =
      if (!sampleHot) rareCk
      else {
        val hotMin = freq.where(col("bc.df") > maxDocFreq)
          .select(col("shingle"), element_at(col("bc.ds"), 1).as("min_doc"))
        val star = ex.join(hotMin, Seq("shingle"))
          .where(col("doc") > col("min_doc"))
          .select(col("min_doc").as("id_a"), col("doc").as("id_b"),
            lit(0L).as("ck"))
        // adjacency chain over hot buckets (see jaccardPairsCappedChain):
        // each hot occurrence pairs with its predecessor in doc-id order
        // within the bucket — O(df) rows per bucket. The predecessor
        // derivation is RANGE-BUCKETED per shingle (adjacencyChainEdges):
        // a shingle whose bucket is big enough to straggle a single-task
        // sort (df > chainRowsPerTask) splits across up to chainBuckets
        // ranges, every other shingle keeps the plain one-window shape —
        // the edge set is exactly the per-shingle window's either way
        val chain =
          if (!chainHot) rareCk.limit(0)
          else {
            // per-shingle nb (inside the broadcast, evaluated lazily as
            // part of the main query): 1 for every ordinary hot shingle
            // — the plain-window derivation — and up to chainBuckets for
            // a mega one, so the skew split engages exactly where a
            // single-task sort would straggle. The range-bucket BOUNDS
            // are PER-SHINGLE and ride the freq aggregate for free
            // (bc.ds(0) is the bucket's exact minimum, bc.mx its exact
            // maximum), so the chain needs NO eager whole-input min/max
            // job at plan-construction time — the r16 form paid one
            // extra raw-input scan for global bounds (reading the RAW
            // input to dodge the cache-materialization planner trap);
            // tighter per-shingle spans also balance the buckets better
            val hotNb = freq.where(col("bc.df") > maxDocFreq)
              .select(col("shingle"),
                expr(s"least(greatest(bc.df div ${rowsPerTask}L, " +
                  s"1L), ${chainBuckets}L)").as("nb"),
                element_at(col("bc.ds"), 1).as("lo"),
                col("bc.mx").as("hi"))
            adjacencyChainEdgesCols(
              ex.join(broadcast(hotNb), Seq("shingle")))
              .select(col("id_a"), col("id_b"), lit(0L).as("ck"))
          }
        rareCk.unionByName(star).unionByName(chain)
          .groupBy("id_a", "id_b").agg(max("ck").as("ck"))
      }
    // upper-bound pre-filter: true common ≤ ck + min(hot_a, hot_b), so
    // the caller's conservative bound prunes candidates that cannot
    // reach its threshold — typically ~all of them — before any array
    // work
    val survivors = ck
      .join(stats.select(col("doc").as("id_a"), col("cnt").as("cnt_a"),
        col("hot_cnt").as("hot_a")), Seq("id_a"))
      .join(stats.select(col("doc").as("id_b"), col("cnt").as("cnt_b"),
        col("hot_cnt").as("hot_b")), Seq("id_b"))
      .withColumn("ubc",
        (col("ck") + least(col("hot_a"), col("hot_b"))).cast("double"))
      .where(bound(col("ubc"), col("cnt_a"), col("cnt_b")))
      .select("id_a", "id_b")
    // exact verification of the few survivors over the full shingle sets:
    // |union| = cnt_a + cnt_b − |∩| (arrays are distinct), so one
    // array_intersect per survivor and a bit-identical division in the
    // caller's final projection
    survivors
      .join(sh.select(col("doc").as("id_a"), col("sh").as("sh_a"),
        col("cnt").as("cnt_a")), Seq("id_a"))
      .join(sh.select(col("doc").as("id_b"), col("sh").as("sh_b"),
        col("cnt").as("cnt_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          .as("common"),
        col("cnt_a"), col("cnt_b"))
  }

  /** Occurrence count above which a hot shingle's chain derivation splits
    * into range buckets (one extra bucket per this many rows, capped at
    * [[chainBuckets]]). Shingles under the bound keep nb = 1 — the plain
    * per-shingle window derivation, with the boundary machinery reduced
    * to an empty branch — so the skew split costs nothing until a bucket
    * is actually big enough to straggle a task. Tests drive the bucketed
    * path through the chain variants' `rowsPerTask` parameter instead of
    * mutating shared state.
    */
  private[graft] val chainRowsPerTask = 1L << 20

  /** Bucket-count cap for one shingle's chain derivation: the largest
    * per-task sort for a uniformly-spread mega-shingle is df/64 while
    * the boundary-stitch summary stays ≤ 64 rows per shingle.
    */
  private val chainBuckets = 64

  /** Doc-id-order adjacency edges per shingle WITHOUT a per-shingle
    * single-task sort: each shingle's occurrences are split into `nb`
    * contiguous doc-id ranges (`nb` is a per-row column — 1 for ordinary
    * hot shingles, up to [[chainBuckets]] for mega ones, so the split is
    * paid ONLY where a single-task sort would straggle), the lag window
    * runs per (shingle, range) — each task sorts only that range's slice
    * — and consecutive ranges are stitched through the per-(shingle,
    * range) min/max summary (≤ nb rows per shingle, a trivial second
    * window). Because the ranges partition the doc-id axis contiguously,
    * concatenating the per-range sorted runs IS the bucket's global sorted
    * order, so within-range lag edges plus (prev range max → next range
    * min) stitch edges reproduce EXACTLY the edge set of a single
    * `Window.partitionBy(shingle).orderBy(doc)` lag (DedupSpec pins the
    * equality). Input: one row per (shingle, doc, nb) occurrence,
    * (shingle, doc) unique, nb constant within a shingle. Output:
    * (id_a, id_b) with id_a < id_b.
    */
  private[graft] def adjacencyChainEdges(occ: DataFrame, docLo: Long,
      docHi: Long): DataFrame = {
    // an inverted or overflowing span would compute a garbage bucket
    // width and silently scatter an nb = 1 shingle into spurious buckets
    // with no stitch (the nb > 1 filter) — dropped chain edges. Repo ids
    // are non-negative BIGINTs so this cannot fire today; fail loud if a
    // future caller feeds negative ids whose span exceeds Long range
    require(docHi >= docLo && docHi - docLo >= 0L,
      s"doc id span [$docLo, $docHi] inverted or overflows Long")
    adjacencyChainEdgesCols(
      occ.withColumn("lo", lit(docLo)).withColumn("hi", lit(docHi)))
  }

  /** [[adjacencyChainEdges]] with PER-ROW range bounds: `occ` carries
    * (shingle, doc, nb, lo, hi) where [lo, hi] spans every doc of the
    * row's shingle (constant within a shingle). The production path
    * feeds per-shingle exact bounds straight out of the bounded-collect
    * aggregate (ds(0)/mx), removing the eager global min/max job the
    * constant-bounds form needs.
    */
  private[graft] def adjacencyChainEdgesCols(occ: DataFrame): DataFrame = {
    // integer `div`, not floor(a/b): double division drops bits past 2^53
    // and ids at the top of the long range would land in the wrong bucket
    val ranged = occ.withColumn("bkt",
      expr("(doc - lo) div (((hi - lo) div nb) + 1L)"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shingle"), col("bkt")).orderBy(col("doc"))
    val within = ranged
      .withColumn("prev", lag(col("doc"), 1).over(wIn))
      .where(col("prev").isNotNull)
      .select(col("prev").as("id_a"), col("doc").as("id_b"))
    // boundary stitching only exists for split shingles (nb > 1) — an
    // unsplit shingle has exactly one range, so the summary aggregation
    // runs over the (typically empty) mega-shingle sliver, not the whole
    // occurrence table
    val summary = ranged.where(col("nb") > 1L)
      .groupBy(col("shingle"), col("bkt"))
      .agg(min(col("doc")).as("mn"), max(col("doc")).as("mx"))
    val wStitch = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shingle")).orderBy(col("bkt"))
    val stitch = summary
      .withColumn("pmx", lag(col("mx"), 1).over(wStitch))
      .where(col("pmx").isNotNull)
      .select(col("pmx").as("id_a"), col("mn").as("id_b"))
    within.unionByName(stitch)
  }

  /** All ordered (a,b) element pairs of a sorted array — the in-bucket
    * candidate expansion for capped dedup (buckets are ≤ maxDocFreq long,
    * so the lambda cost is bounded per bucket).
    */
  private def orderedPairs(ds: Column): Column =
    flatten(transform(ds, (x, i) =>
      transform(slice(ds, i + lit(2), size(ds)), y =>
        struct(x.as("a"), y.as("b")))))

  /** Per-word polynomial char hashes (chars hashed once per word, not once
    * per shingle — 3× less char work than shingle-string hashing).
    */
  def wordHashes(text: Column): Column =
    transform(split(text, " "), w =>
      aggregate(regexp_extract_all(w, lit("."), lit(0)), lit(0L),
        (acc, c) => (acc * 31L + ascii(c)) % P))

  /** Distinct n-word shingle hashes: per-word polynomial char hash, then
    * fold(h = 0; h = (h*31 + wordHash) mod P) over each n-window —
    * identical arithmetic is reproducible in the oracle. Empty array when
    * the doc has fewer than n words. Single-pass expression.
    */
  def shingleHashes(text: Column, n: Int): Column =
    graft.functions.TextExprs.shingleHashes(text, n)

  /** MinHash slots over precomputed shingle hashes: slot i = min of
    * (a_i * h + b_i) mod P. Deterministic seeds.
    */
  def signatureOf(sh: Column, numHashes: Int): Column =
    graft.functions.TextExprs.minhashSig(sh, numHashes)

  /** MinHash signature of a text column (convenience composition). */
  def minhashSignature(text: Column, n: Int, numHashes: Int): Column =
    signatureOf(shingleHashes(text, n), numHashes)

  /** MinHash+LSH candidate pairs verified by exact Jaccard.
    *
    * Bands of `rowsPerBand` signature slots hash to buckets; docs sharing
    * any band bucket are candidates; candidates are verified with the
    * exact shingle Jaccard and filtered at `threshold`. At scale: the
    * band explode is linear, the bucket self-join shuffles on
    * (band, bucket-hash) and only collides true candidates.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, rowsPerBand: Int,
      threshold: Double): DataFrame = {
    // shingle hashes + signature materialized ONCE and persisted — the
    // banded self-join would otherwise recompute the whole text-hash
    // pipeline on both sides
    val (base, banded, sets) =
      indexTables(df, idCol, textCol, n, numHashes, rowsPerBand)
    tracked(base)
    selfPairs(banded, sets, threshold)
  }

  /** [[minhashLshPairs]] with a ONE-PERMUTATION signature
    * (TextExprs.ophSig: one universal rehash per shingle routed into
    * `numHashes` bins, empty bins densified by rotation) — the hashing
    * pass drops from O(shingles × numHashes) to O(shingles), the cost
    * that dominates signature building on long documents at corpus
    * scale. Banding, candidate join and the exact-Jaccard verify are
    * [[selfPairs]] verbatim, so every emitted pair is TRUE at
    * `threshold` regardless of signature flavor — only candidate
    * recall can differ from the classic signature (OPH bin minima are
    * a slightly higher-variance Jaccard estimator at small
    * `numHashes`; Li, Owen & Zhang, NIPS 2012).
    */
  def ophLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, rowsPerBand: Int,
      threshold: Double): DataFrame = {
    val base = df
      .select(col(idCol).as("doc"), shingleHashes(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig",
        graft.functions.TextExprs.ophSig(col("sh"), numHashes))
    tracked(base)
    selfPairs(bandedOf(base, numHashes, rowsPerBand),
      base.select(col("doc"), col("sh"), col("sig")), threshold)
  }

  /** Banded self-join + exact-Jaccard verify over (banded, sets) index
    * tables — THE pair-finding implementation, shared by
    * [[minhashLshPairs]], [[indexPairs]] and incremental batch
    * self-pairing so the candidate and verify rules can never diverge.
    */
  private[ops] def selfPairs(banded: DataFrame, sets: DataFrame,
      threshold: Double): DataFrame = {
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .distinct()
    cand
      .join(sets.select(col("doc").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("doc").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Edit-distance-verified near-dup pairs: MinHash+LSH banding proposes
    * candidates (linear in corpus size — never an all-pairs comparison),
    * then `levenshtein`, which is quadratic per pair, runs ONLY on the
    * surviving candidate pairs. Pairs pass when the edit distance is at
    * most `maxRel` of the longer text. This is the standard two-stage
    * shape for character-level dedup at scale: the O(len²) verifier is
    * confined to the LSH collision set.
    */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, rowsPerBand: Int,
      maxRel: Double): DataFrame = {
    val base = tracked(spread(df)
      .select(col(idCol).as("doc"), col(textCol).as("txt"),
        shingleHashes(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", signatureOf(col("sh"), numHashes)))
    val banded = bandedOf(base, numHashes, rowsPerBand)
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .distinct()
    // Verification cost control, in rejection-cost order:
    //  1. length gap — edit distance ≥ |len_a − len_b|, so a pair whose
    //     gap already exceeds the budget is rejected in O(1);
    //  2. BANDED levenshtein with a per-row threshold k = ⌊maxRel·maxLen⌋
    //     (distances are integers, so dist ≤ maxRel·maxLen ⟺ dist ≤ k):
    //     O(k·len) instead of O(len²), returning −1 above the band.
    // Both prune evaluation only — the emitted (pair, distance) set is
    // identical to the unbanded form, which is what the oracle computes.
    cand
      .join(base.select(col("doc").as("id_a"), col("txt").as("txt_a")),
        Seq("id_a"))
      .join(base.select(col("doc").as("id_b"), col("txt").as("txt_b")),
        Seq("id_b"))
      .withColumn("max_len",
        greatest(length(col("txt_a")), length(col("txt_b"))).cast("long"))
      .where(abs(length(col("txt_a")) - length(col("txt_b")))
        <= lit(maxRel) * col("max_len"))
      .select(col("id_a"), col("id_b"),
        expr(s"levenshtein(txt_a, txt_b, CAST($maxRel * " +
          "greatest(length(txt_a), length(txt_b)) AS INT))")
          .cast("long").as("edit_dist"),
        col("max_len"))
      .where(col("edit_dist") >= 0L &&
        col("edit_dist") <= lit(maxRel) * col("max_len"))
  }

  /** Triangles of an ordered edge list (id_a < id_b): each (a,b,c) with
    * a<b<c and all three edges present, via two equi-joins — wedge
    * build (join on the shared middle vertex) then closure check (join
    * against the edge set). The a<b<c orientation means every triangle
    * is produced exactly once and the wedge join fans out only on
    * FORWARD degrees — the standard trick that keeps the join volume
    * near E^1.5 instead of E·maxDegree at scale. Used on near-dup pair
    * graphs to measure cluster cliquishness (a high triangle share
    * means whole boilerplate families, not chance collisions).
    */
  def trianglePairs(edges: DataFrame): DataFrame = {
    // the edge list is referenced THREE times (both wedge sides + the
    // closure probe); without a cache boundary the whole upstream
    // pair-finding pipeline (banded self-join + exact-Jaccard verify)
    // re-executes per reference — measured 3x the verify subtree in
    // g1's plan. Persist once; index-fed callers pay one cheap extra
    // cache of an already-committed edge table.
    val e = tracked(edges.select(col("id_a"), col("id_b")))
    val wedges = e.as("e1").join(e.as("e2"),
        col("e1.id_b") === col("e2.id_a"))
      .select(col("e1.id_a").as("a"), col("e1.id_b").as("b"),
        col("e2.id_b").as("c"))
    wedges.join(e.as("e3"),
        col("a") === col("e3.id_a") && col("c") === col("e3.id_b"))
      .select(col("a"), col("b"), col("c"))
  }

  /** PageRank over the undirected near-dup graph in EXACT integer fixed
    * point — rank mass carried as BIGINT scaled by `scale`, every
    * division floored — so the result is bit-stable under any
    * aggregation order and the `iters` rounds unroll into an exact SQL
    * oracle (g2_pagerank). On a dup graph, rank concentrates on the
    * template/boilerplate hubs that connect many near-copies — a
    * centrality signal for which docs to KEEP (canonical sources) vs
    * which are derived echoes, complementing [[dupClusters]]' flat
    * membership labels.
    *
    * Nodes are the pairs' endpoints (a singleton doc has no edges and
    * trivially holds the base rank — excluded). Per round, with damping
    * 0.85 as the integer pair (85, 100):
    * {{{ contrib(u→v) = r(u) div deg(u)
    *     r'(v) = base + (85 · Σ contrib) div 100
    *     base  = ((15 · scale) div 100) div n }}}
    * The floors leak a few units of mass per round (standard for
    * fixed-point PR); ranking fidelity is unaffected and DedupSpec pins
    * hand-computed values on a path graph.
    *
    * Scale shape: edges carry their source degree from one persisted
    * build (no per-round degree join); each round is one equi-join on u
    * (the same key the edge table is already shuffled on) + one groupBy
    * v — both key-partitioned, never all-pairs — and round state crosses
    * [[roundCache]] so plan size stays O(1) in `iters`. Returns
    * (`idCol`, rank_fp).
    */
  def pageRank(pairs: DataFrame, idCol: String, iters: Int = 3,
      scale: Long = 1000000000000L): DataFrame = {
    val (eDeg, nodes) = pageRankAdjacency(pairs)
    val n = nodes.count()
    require(n > 0, "pageRank over an empty graph")
    val base = 15L * scale / 100L / n
    // Rounds CHAIN inside one plan: each intermediate rank table is
    // referenced exactly once (by the next round's inflow join), so
    // lineage cannot fan out, and the whole recurrence runs as ONE
    // Spark job instead of a job + node-sized cache write per round —
    // the round arithmetic is bit-identical, only the materialization
    // points moved. Blocks of [[prChainBlock]] rounds bound plan depth
    // for large `iters`; a block boundary materializes through
    // roundCache exactly as the old per-round loop did every round.
    var ranks = nodes.select(col("id"), lit(scale / n).as("r"))
    var mat: DataFrame = null
    var sinceMat = 0
    for (i <- 1 to iters) {
      ranks = pageRankRound(eDeg, nodes, ranks, base)
      sinceMat += 1
      if (sinceMat == prChainBlock && i < iters) {
        val next = roundCache(ranks)
        next.count() // materialize before dropping the block we read from
        if (mat != null) mat.unpersist()
        mat = next
        ranks = next
        sinceMat = 0
      }
    }
    if (mat != null) trackExisting(mat) // last block backs the returned plan
    ranks.select(col("id").as(idCol), col("r").as("rank_fp"))
  }

  /** Rounds per chained PageRank plan segment: joins/aggregates nest this
    * many rounds deep before a roundCache boundary truncates the plan —
    * deep enough that the gate's iters=3 runs as one job, shallow enough
    * that a long recurrence can't blow up planning time.
    */
  private[graft] val prChainBlock = 4

  /** The prepared PageRank adjacency: (eDeg, nodes), both cached. The
    * adjacency's hash layout is pinned on u ONCE (explicit partition
    * count so AQE can't coalesce it, sorted within partitions so a
    * sort-merge iteration join reads it sort-free): the degree join
    * broadcasts at typical |V| sizes, which would leave eDeg in the
    * file layout and every iteration's rank join re-shuffling the FULL
    * edge table — the one-time layout shuffle replaces `iters`
    * edge-table shuffles, the catalog-bucketize trade applied to
    * iteration state (PlanAudit asserts the round-plan shape).
    * `pin = false` skips the layout repartition — audit-only, the
    * counterfactual PlanAudit measures the pinned layout against.
    */
  private[graft] def pageRankAdjacency(pairs: DataFrame,
      pin: Boolean = true): (DataFrame, DataFrame) = {
    // cache the pair projection BEFORE the symmetrizing union: both
    // union branches otherwise re-execute the whole upstream pair
    // pipeline (measured at ×100: the LSH pair generation alone is
    // 77.8M shuffle records — paid twice without this). Production
    // (pin = true) only: the audit-only counterfactual keeps the raw
    // double-eval file-layout shape, because the cache's accurate stats
    // flip its degree join to sort-merge and would hand the UNPINNED
    // variant a u-partitioned layout by accident — inverting exactly
    // the comparison the pagerank_round property measures
    val p =
      if (pin) tracked(pairs.select(col("id_a"), col("id_b"))) else pairs
    val edges = p.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionByName(p.select(col("id_b").as("u"), col("id_a").as("v")))
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val joined = edges.join(deg, Seq("u"))
    val shufN = pairs.sparkSession.sessionState.conf.numShufflePartitions
    val eDeg = tracked(
      if (pin) joined.repartition(shufN, col("u"))
        .sortWithinPartitions(col("u"))
      else joined)
    (eDeg, tracked(deg.select(col("u").as("id"))))
  }

  /** One PageRank round over the prepared (u-partitioned, cached)
    * adjacency — split out so PlanAudit can assert the iteration shape
    * on a plan object: the rank join reuses the edge table's OWN cached
    * hash layout (no edge-table exchange), so a round's exchanges are
    * rank-flow-sized only (the ranks-to-join shuffle and the inflow
    * aggregate), never edge-table-sized.
    */
  private[graft] def pageRankRound(eDeg: DataFrame, nodes: DataFrame,
      ranks: DataFrame, base: Long): DataFrame = {
    val inflow = eDeg.join(ranks, col("u") === col("id"))
      .select(col("v"), expr("r div deg").as("c"))
      .groupBy(col("v")).agg(sum(col("c")).as("s"))
    nodes.join(inflow, col("id") === col("v"), "left")
      .select(col("id"),
        (lit(base) + expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100"))
          .as("r"))
  }

  /** PageRank over the near-dup graph CONTRACTED to one super-node per
    * connected component — the production variant for dup graphs, where
    * the edge set is in-group-quadratic (a family of f clones is a
    * clique: f·(f−1)/2 edges) and raw [[pageRank]] moves O(E) records
    * per round through joins that mostly shuffle rank mass AROUND INSIDE
    * each family. Contraction runs the rank recurrence per FAMILY: one
    * map-combined min-neighbor pass roots every clique, the residual
    * cross-label graph (empty for clique families) stitches at LABEL
    * scale via [[dupClusters]], node-sized aggregations derive each
    * family's size k and regular degree d = (2·E_intra) div k, and the
    * `iters` rounds become map-only column updates over the family
    * table plus a groupBy over CROSS-family edges only — the edge table
    * is scanned but never shuffled on the default path, vs raw PR's
    * O(E) shuffle per round.
    *
    * Exactness: on a DEGREE-REGULAR component with no cross edges (a
    * planted clone clique — every dup-graph family the inflation
    * fixtures generate) every member holds the identical rank each
    * round, so the member recurrence
    * {{{ u' = base + (85 · d·(u div d)) div 100 }}}
    * reproduces raw [[pageRank]] BIT-EXACTLY, per node and per family
    * (DedupSpec pins it on mixed-size cliques). On irregular components
    * the regular-degree d and the uniform spread of cross-family inflow
    * (F div k per member) are approximations — family MASS stays the
    * signal; raw pageRank remains the exact oracle-gated form (g2).
    * Returns (`idCol`, rank_fp) like [[pageRank]].
    *
    * `labels` overrides the contraction key with caller-supplied
    * (id, c) family labels — e.g. a community detector's output, or
    * planted group ids — which is where cross-family edges actually
    * flow; under the default CC labels cross edges are empty by
    * definition of connectedness and every round is map-only.
    */
  def pageRankContracted(pairs: DataFrame, idCol: String, iters: Int = 3,
      scale: Long = 1000000000000L,
      labels: Option[DataFrame] = None): DataFrame = {
    // cache the pair projection before the symmetrizing union (the
    // pageRankAdjacency lesson: both branches re-run the pair pipeline
    // otherwise), then the edge table itself
    val p = tracked(pairs.select(col("id_a"), col("id_b")))
    val edges = p.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionByName(p.select(col("id_b").as("u"), col("id_a").as("v")))
      .persist()
    // degree AND min-neighbor in ONE map-combined aggregation — the only
    // edge-table pass the default path makes, and its shuffle is
    // node-sized partials, never edges
    val nodeAgg = tracked(edges.groupBy(col("u"))
      .agg(count(lit(1)).as("deg"), min(col("v")).as("mn")))
    val degT = nodeAgg.select(col("u"), col("deg"))
    val n = nodeAgg.count()
    require(n > 0, "pageRankContracted over an empty graph")
    val base = 15L * scale / 100L / n
    // component labels. The default path NEVER shuffles the edge table:
    // one map-combined min-neighbor pass roots every clique instantly
    // (L0(v) = min(v, min nbr)), the residual LABEL graph (distinct
    // (L0(u), L0(v)) cross-label edges — empty for clique families,
    // tiny for anything near-clique) is stitched to convergence with
    // [[dupClusters]] at label scale, and L0 rides back through a
    // broadcast map. Labels are |V|-sized (the dup-graph participants,
    // not the corpus) — broadcastable far past the bench scales; beyond
    // ~4M nodes the label joins degrade to shuffle joins of NODE-sized
    // tables, still never edge-sized.
    val bcast: DataFrame => DataFrame =
      if (n <= 4000000L) d => broadcast(d) else d => d
    val comp = tracked(labels.getOrElse {
      val l0 = nodeAgg
        .select(col("u").as("id"), least(col("u"), col("mn")).as("l"))
      val le = edges
        .join(bcast(l0.select(col("id").as("u"), col("l").as("lu"))),
          Seq("u"))
        .join(bcast(l0.select(col("id").as("v"), col("l").as("lv"))),
          Seq("v"))
        .where(col("lu") =!= col("lv"))
        .select(least(col("lu"), col("lv")).as("id_a"),
          greatest(col("lu"), col("lv")).as("id_b"))
        .distinct().persist()
      val out =
        if (le.limit(1).count() == 0)
          l0.select(col("id"), col("l").as("c"))
        else {
          val roots = dupClusters(
            le.select(col("id_a").as("id"))
              .unionByName(le.select(col("id_b").as("id"))).distinct(),
            "id", le)
            .select(col("id").as("l"), col("cluster_id").as("root"))
          l0.join(bcast(roots), Seq("l"), "left")
            .select(col("id"), coalesce(col("root"), col("l")).as("c"))
        }
      le.unpersist()
      out
    })
    // caller-supplied labels that miss a graph node would silently drop
    // it from every inner join below (wrong family sizes, incomplete rank
    // table) — fail fast instead; the default CC path covers every node
    // with an edge by construction, so only the Some path pays the probe
    labels.foreach { _ =>
      val uncovered = nodeAgg.select(col("u").as("id"))
        .join(comp, Seq("id"), "left_anti").limit(1).collect()
      require(uncovered.isEmpty,
        s"pageRankContracted: node ${uncovered.headOption.map(_.get(0)).orNull} " +
          "has an edge but no label — caller labels must cover every node " +
          "with an edge")
    }
    val sizes = comp.groupBy(col("c")).agg(count(lit(1)).as("k"))
    // intra/cross split: under the default CC labels cross edges are
    // empty BY DEFINITION of connectedness, so e2 = Σ member degrees —
    // node-sized aggregation, no edge-table join. Caller labels can cut
    // through components, so only that path pays the edge relabel join.
    val (intra, cross) = labels match {
      case None =>
        (degT.join(bcast(comp.withColumnRenamed("id", "u")), Seq("u"))
          .groupBy(col("c")).agg(sum(col("deg")).as("e2")),
          edges.sparkSession.emptyDataFrame)
      case Some(_) =>
        val eLab = edges
          .join(comp.withColumnRenamed("id", "u")
            .withColumnRenamed("c", "ca"), Seq("u"))
          .join(comp.withColumnRenamed("id", "v")
            .withColumnRenamed("c", "cb"), Seq("v"))
        (eLab.where(col("ca") === col("cb"))
          .groupBy(col("ca").as("c")).agg(count(lit(1)).as("e2")),
          eLab.where(col("ca") =!= col("cb"))
            .groupBy(col("ca"), col("cb")).agg(count(lit(1)).as("w"))
            .persist())
    }
    val hasCross = labels.nonEmpty && cross.limit(1).count() > 0
    // Rounds CHAIN inside one plan exactly like raw [[pageRank]]'s: the
    // !hasCross recurrence is a map-only column update (Catalyst
    // collapses the chained projections into one), the cross variant
    // nests one label-scale join/aggregate per round; [[prChainBlock]]
    // bounds plan depth for large `iters` with the same roundCache
    // block boundaries. Round arithmetic is bit-identical — only the
    // per-round materialization points moved.
    val fam0 = tracked(sizes.join(intra, Seq("c"), "left")
      .select(col("c"), col("k"),
        greatest(expr("coalesce(e2, CAST(0 AS BIGINT)) div k"), lit(1L))
          .as("d"),
        lit(scale / n).as("u")))
    var fam = fam0
    var mat: DataFrame = null
    var sinceMat = 0
    // the cross recurrence references fam TWICE per round (flow + join),
    // so chaining would double the plan per round — materialize every
    // round there, exactly the old loop; the map-only default path
    // references fam once per round and chains safely
    val block = if (hasCross) 1 else prChainBlock
    for (i <- 1 to iters) {
      val stepped =
        if (!hasCross)
          fam.select(col("c"), col("k"), col("d"),
            (lit(base) + expr("(85 * (d * (u div d))) div 100")).as("u"))
        else {
          // per-member cross inflow: each directed cross edge carries the
          // source family's member contribution, spread uniformly over
          // the destination family (F div k) — the documented
          // approximation; the intra term is the regular-degree identity
          val flow = cross
            .join(fam.select(col("c").as("ca"), col("u").as("su"),
              col("d").as("sd")), Seq("ca"))
            .select(col("cb").as("c"),
              (col("w") * expr("su div sd")).as("f"))
            .groupBy(col("c")).agg(sum(col("f")).as("fin"))
          fam.join(flow, Seq("c"), "left")
            .select(col("c"), col("k"), col("d"),
              (lit(base) + expr("(85 * (d * (u div d) + " +
                "coalesce(fin, CAST(0 AS BIGINT)) div k)) div 100"))
                .as("u"))
        }
      fam = stepped
      sinceMat += 1
      if (sinceMat == block && i < iters) {
        val next = roundCache(fam)
        next.count() // materialize before dropping the block we read from
        if (mat != null) mat.unpersist()
        mat = next
        fam = next
        sinceMat = 0
      }
    }
    // hasCross: the loop's `i < iters` guard never materialized the FINAL
    // round, yet cross/edges unpersist below — every action on the
    // returned plan would re-run the cross-edge relabel join and flow
    // aggregate from scratch. Materialize the last round first (the
    // map-only default path chains safely and recomputes from the tracked
    // fam0/comp caches, so it keeps the cheap unmaterialized form).
    if (hasCross && sinceMat > 0) {
      val last = roundCache(fam)
      last.count()
      if (mat != null) mat.unpersist()
      mat = last
      fam = last
    }
    val out = comp.join(fam.select(col("c"), col("u")), Seq("c"))
      .select(col("id").as(idCol), col("u").as("rank_fp"))
    cross.unpersist()
    edges.unpersist()
    if (mat != null) trackExisting(mat) // last block backs the returned plan
    out
  }

  /** Banded MinHash index of a STATIC corpus for incremental near-dup
    * checks — the Jaccard-verified analogue of [[simhashIndex]]: `banded`
    * holds one (doc, band, bucket) row per band per corpus doc, `sets`
    * the shingle-hash arrays the probe verifies against. Probing a new
    * batch costs one band equi-join + per-candidate array intersection;
    * the corpus is never re-scanned (build once, [[MinhashIndex.save]] /
    * [[loadMinhashIndex]] across sessions).
    */
  final case class MinhashIndex(n: Int, numHashes: Int, rowsPerBand: Int,
      banded: DataFrame, sets: DataFrame,
      caches: Seq[DataFrame] = Nil) {

    def save(cat: graft.catalog.VersionedCatalog, name: String): Unit = {
      val spark = banded.sparkSession
      import spark.implicits._
      val params = Seq((n, numHashes, rowsPerBand))
        .toDF("n", "num_hashes", "rows_per_band")
      cat.commit(Map(s"$name.banded" -> banded, s"$name.sets" -> sets,
        s"$name.params" -> params))
      ()
    }

    /** Unpersist every frame this index holds a cache for. Call when the
      * index object is discarded (e.g. after a catalog commit that
      * materialized its tables); unpersist on a never-persisted frame is
      * a no-op, so release is always safe.
      */
    def release(): Unit = {
      (caches :+ banded :+ sets).foreach(_.unpersist())
    }
  }

  def minhashIndex(corpus: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, rowsPerBand: Int): MinhashIndex = {
    val (base, banded, sets) =
      indexTables(corpus, idCol, textCol, n, numHashes, rowsPerBand)
    base.persist() // build-once cache, lifetime = the index object's
    MinhashIndex(n, numHashes, rowsPerBand, banded, sets, caches = Seq(base))
  }

  def loadMinhashIndex(spark: org.apache.spark.sql.SparkSession,
      cat: graft.catalog.VersionedCatalog, name: String): MinhashIndex = {
    val p = cat.read(spark, s"$name.params").head()
    MinhashIndex(p.getAs[Int]("n"), p.getAs[Int]("num_hashes"),
      p.getAs[Int]("rows_per_band"),
      cat.read(spark, s"$name.banded"), cat.read(spark, s"$name.sets"))
  }

  /** (doc, band, bucket) rows of a signature table (shared by the
    * self-join pair path and the index probe).
    */
  private def bandedOf(base: DataFrame, numHashes: Int,
      rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    base.select(col("doc"),
      explode(array((0 until numBands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("_",
            slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc"), col("bb.band"), col("bb.bucket"))
  }

  /** Probe new documents against a [[MinhashIndex]]: candidates from the
    * (band, bucket) equi-join, verified with exact Jaccard over the full
    * shingle sets at `threshold`. Returns (probe_id, corpus_id, jaccard).
    *
    * Stream-safe: the whole pipeline is select + explode + inner
    * equi-joins against static index tables — no state store, no
    * watermark needed — so `probe` may be a streaming DataFrame (the
    * probe-side cache is skipped there; a micro-batch recomputes its own
    * signatures, which is the right trade at batch size).
    */
  def minhashProbe(probe: DataFrame, index: MinhashIndex, idCol: String,
      textCol: String, threshold: Double): DataFrame = {
    val raw = probe
      .select(col(idCol).as("p_doc"),
        shingleHashes(col(textCol), index.n).as("p_sh"))
      .where(size(col("p_sh")) > 0)
      .withColumn("p_sig", signatureOf(col("p_sh"), index.numHashes))
    val base = if (probe.isStreaming) raw else tracked(raw)
    probeMatches(base, index, threshold)
  }

  /** Candidate generation + exact-Jaccard verify of prepared probe rows
    * (p_doc, p_sh, p_sig) against an index, emitting each (probe, corpus)
    * pair EXACTLY ONCE via the first-matching-band filter: a candidate
    * row for band b survives iff no band b' < b also matched, decided
    * from the two signatures on the row itself. The whole pipeline is
    * select + explode + ONE inner equi-join against static tables — no
    * distinct, no self-join on the probe side — which is what makes the
    * probe STREAM-SAFE with zero state (the previous distinct-based form
    * was a stateful streaming dedup whose state grew with every ingested
    * document).
    */
  private[ops] def probeMatches(base: DataFrame, index: MinhashIndex,
      threshold: Double, broadcastProbe: Boolean = false): DataFrame = {
    val r = index.rowsPerBand
    val numBands = index.numHashes / r
    def explodedBands(df: DataFrame, keep: Seq[String]): DataFrame = df
      .select(keep.map(col) :+
        explode(array((0 until numBands).map { b =>
          struct(lit(b).as("band"),
            concat_ws("_",
              slice(col("p_sig"), b * r + 1, r)).as("bucket"))
        }: _*)).as("bb"): _*)
      .select(keep.map(col) :+ col("bb.band") :+ col("bb.bucket"): _*)
    // the "_"-join of longs is injective, so bucket equality == slice
    // equality and the earlier-band comparison here is consistent
    val firstMatch = (0 until numBands).map { bp =>
      lit(bp) >= col("band") ||
        slice(col("p_sig"), bp * r + 1, r) =!=
          slice(col("sig"), bp * r + 1, r)
    }.reduce(_ && _)
    val jacc =
      (size(array_intersect(col("p_sh"), col("sh"))).cast("double") /
        size(array_union(col("p_sh"), col("sh"))).cast("double"))
        .as("jaccard")
    if (broadcastProbe) {
      // micro-batch probe of a corpus-scale index: the corpus tables
      // must be SCANNED, never shuffled — a planner-chosen sort-merge
      // here moves banded+sets (O(corpus)) for an O(batch) probe
      // (measured at ×100: 2.37M shuffle records per 25k-doc fold,
      // exactly banded+sets, regardless of when the plan is compiled —
      // the corpus⋈corpus `banded ⋈ sets` prejoin shuffles by
      // construction). Only two things are ever broadcast, both
      // provably small: the LITE probe (p_doc, band, bucket — no
      // signatures, no shingle arrays; O(batch·bands)) into the banded
      // scan, and the DISTINCT candidate doc ids (O(batch-incident
      // docs), bounded by batch × bucket-degree, corpus-independent)
      // into the sets scan. The candidate PAIRS themselves stay
      // distributed — at ×100 the inflated corpus has avg degree ~100,
      // so a 25k-doc fold's bucket hits are millions of rows: a
      // candidate-side broadcast OOMs exactly where it matters.
      // Every shuffle left is batch-incident (bucket hits, candidate
      // sets rows, the final p_sh attach) — fold cost scales with the
      // batch and its duplicate degree, never the corpus.
      // Caller contract: `base` is micro-batch-sized.
      val pbLite = broadcast(explodedBands(base, Seq("p_doc")))
      // one (p_doc, doc) row per probe/corpus pair: the multi-band
      // dedup is a plain distinct here — the first-matching-band
      // device below exists only for the stateless STREAMING path
      val cand = tracked(
        index.banded.join(pbLite, Seq("band", "bucket"))
          .select(col("p_doc"), col("doc")).distinct())
      val candIds = cand.select(col("doc")).distinct()
      val candSets = index.sets.join(broadcast(candIds), Seq("doc"))
        .select(col("doc"), col("sh"))
      cand.join(candSets, Seq("doc"))
        .join(base.select(col("p_doc"), col("p_sh")), Seq("p_doc"))
        .select(col("p_doc").as("probe_id"), col("doc").as("corpus_id"),
          jacc)
        .where(col("jaccard") >= threshold)
    } else {
      // stream-safe shape: probe stays on the left through two inner
      // equi-joins against static tables (left-deep — the corpus tables
      // are never pre-joined with each other), p_sh rides the probe rows
      // so no probe self-join is ever needed
      val pb = explodedBands(base, Seq("p_doc", "p_sh", "p_sig"))
      pb.join(index.banded, Seq("band", "bucket"))
        .join(index.sets, Seq("doc"))
        .where(firstMatch)
        .select(col("p_doc").as("probe_id"), col("doc").as("corpus_id"),
          jacc)
        .where(col("jaccard") >= threshold)
    }
  }

  /** Near-dup pairs straight from a built [[MinhashIndex]] — the banded
    * self-join + exact-Jaccard verify of [[minhashLshPairs]], but reading
    * the index's persisted tables instead of re-hashing the corpus.
    */
  def indexPairs(index: MinhashIndex, threshold: Double): DataFrame =
    selfPairs(index.banded, index.sets, threshold)

  /** A materialized near-dup PAIR GRAPH: the MinHash tables for
    * incremental candidate generation PLUS the verified edge table
    * (id_a < id_b, jaccard), persisted together in the versioned
    * catalog. The graph family (pageRank, kCore, dupClusters,
    * leakageFreeSplit, trianglePairs) otherwise regenerates the LSH
    * pair pipeline INLINE per query — at corpus scale a fixed
    * multi-hundred-second / tens-of-millions-of-shuffle-records floor
    * paid by every consumer (BENCH_SCALE ×100: 77.8M records for the
    * pair pass alone). Build the edges once, read them many times —
    * the same build-once/probe-many composition as [[MinhashIndex]] and
    * [[DupClusterIndex]], applied to the edge set itself.
    */
  /** The rows an [[PairGraphIndex.addDocs]] fold ADDED on top of the
    * loaded snapshot — exactly the per-table delta an append commit
    * writes. Successive in-memory folds merge their deltas, so the
    * delta always equals "everything since [[origin]]".
    */
  final case class PairGraphDelta(banded: DataFrame, sets: DataFrame,
      edges: DataFrame)

  /** Where a [[PairGraphIndex]] was loaded from: catalog root, index
    * name, and the PINNED commit the load read at. An append-commit
    * save targets exactly this snapshot (`expected = commit`), so a
    * concurrent writer's interleaved commit fails the save loudly
    * instead of silently appending onto a base the delta wasn't
    * computed against.
    */
  final case class PairGraphOrigin(root: String, name: String, commit: Long)

  final case class PairGraphIndex(minhash: MinhashIndex, threshold: Double,
      edges: DataFrame, caches: Seq[DataFrame] = Nil,
      delta: Option[PairGraphDelta] = None,
      origin: Option[PairGraphOrigin] = None) {

    /** Unpersist every cached frame this index holds (its own plus the
      * minhash tables'). Call once the index is discarded.
      */
    def release(): Unit = {
      (caches :+ edges).foreach(_.unpersist())
      minhash.release()
    }

    /** Atomic commit of minhash tables + edge table + params.
      * `lastBatchId` records the most recent streaming micro-batch
      * folded in (see [[maintainPairGraph]]); −1 for batch builds.
      *
      * COMMIT COST IS O(WHAT CHANGED), not O(corpus): when this index
      * is an [[addDocs]] fold of a SNAPSHOT LOADED FROM `cat` under the
      * same `name` (delta + origin both present), only the fold's new
      * rows are written — banded/sets/edges go in as APPEND deltas
      * labeled with the batch id, and only `params` (5 columns, 1 row)
      * is rewritten. The append targets the pinned origin commit
      * (`expected`), so a concurrent writer fails the save with
      * [[graft.catalog.ConcurrentCommitException]] instead of the delta
      * landing on a base it wasn't computed against. A fresh build, a
      * save into a DIFFERENT catalog/name, or `appendDelta = false`
      * falls back to the full rewrite (the only correct form there —
      * an append without its base would publish a partial index).
      * Either way the commit is one atomic pointer move.
      */
    def save(cat: graft.catalog.VersionedCatalog, name: String,
        lastBatchId: Long = -1L, appendDelta: Boolean = true): Unit = {
      val spark = edges.sparkSession
      import spark.implicits._
      import graft.catalog.TableDelta
      val params = Seq((minhash.n, minhash.numHashes, minhash.rowsPerBand,
        threshold, lastBatchId))
        .toDF("n", "num_hashes", "rows_per_band", "threshold",
          "last_batch_id")
      val appendable = delta.filter(_ => appendDelta).filter(_ =>
        origin.exists(o => o.root == cat.root && o.name == name))
      appendable match {
        case Some(d) =>
          // batch-labeled append dirs: the label records WHICH fold a
          // dir came from (ops can dropLabels a bad batch in O(metadata));
          // physical paths stay unique regardless (commit id + nonce)
          val label = s"b$lastBatchId"
          cat.commitAll(Map(
            s"$name.banded" -> TableDelta(appends = Seq((d.banded, label))),
            s"$name.sets" -> TableDelta(appends = Seq((d.sets, label))),
            s"$name.edges" -> TableDelta(appends = Seq((d.edges, label))),
            s"$name.params" -> TableDelta(rewrite = Some(params))),
            expected = origin.map(_.commit))
        case None =>
          cat.commit(Map(
            s"$name.banded" -> minhash.banded,
            s"$name.sets" -> minhash.sets,
            s"$name.edges" -> edges,
            s"$name.params" -> params))
      }
      ()
    }

    /** Undirected pair view (id_a, id_b) — the drop-in replacement for
      * an inline `minhashLshPairs(corpus, …)` call in every graph
      * consumer.
      */
    def pairs: DataFrame = edges.select(col("id_a"), col("id_b"))

    /** [[Dedup.pageRank]] over the persisted edges — no pair pipeline. */
    def pageRank(idCol: String = "doc_id", iters: Int = 3): DataFrame =
      Dedup.pageRank(pairs, idCol, iters)

    /** [[Dedup.pageRankContracted]] over the persisted edges. */
    def pageRankContracted(idCol: String = "doc_id",
        iters: Int = 3): DataFrame =
      Dedup.pageRankContracted(pairs, idCol, iters)

    /** [[Dedup.kCore]] over the persisted edges — same bounded-round
      * knobs as the inline form so the unrolled oracle's semantic
      * (exactly-maxRounds simultaneous peel) is reachable from the
      * index too.
      */
    def kCore(k: Int, maxRounds: Int = 50,
        requireConverged: Boolean = true): DataFrame =
      Dedup.kCore(pairs, k, maxRounds, requireConverged)

    /** [[Dedup.trianglePairs]] over the persisted edges. */
    def triangles: DataFrame = Dedup.trianglePairs(pairs)

    /** [[Dedup.dupClusters]] over the persisted edges. */
    def dupClusters(ids: DataFrame, idCol: String): DataFrame =
      Dedup.dupClusters(ids, idCol, pairs)

    /** [[Dedup.leakageFreeSplit]] over the persisted edges. */
    def leakageFreeSplit(ids: DataFrame, idCol: String,
        trainPct: Int = 80, valPct: Int = 10): DataFrame =
      Dedup.leakageFreeSplit(ids, idCol, pairs, trainPct, valPct)

    /** Fold a batch of NEW documents into the graph — the edge set
      * equals a full rebuild over old ∪ new EXACTLY, at the cost of the
      * batch: a rebuild's edges partition into old↔old (unchanged —
      * the old banded/sets tables are untouched), old↔new (the index
      * probe: identical banding and exact-Jaccard verify, each pair
      * emitted once), and new↔new (the batch self-join through the
      * same [[selfPairs]]). DedupSpec pins rebuild equality.
      */
    def addDocs(newDocs: DataFrame, idCol: String,
        textCol: String): PairGraphIndex = {
      // an id in both old and new would silently duplicate edges and
      // misorient least/greatest canonicalization; fail fast (docs too
      // short to shingle never enter `sets` OR the edge table, so they
      // cannot clash)
      val clash = newDocs.select(col(idCol).as("doc"))
        .join(minhash.sets.select(col("doc")), Seq("doc"), "left_semi")
        .limit(1).collect()
      require(clash.isEmpty,
        s"addDocs: doc id ${clash.headOption.map(_.get(0)).orNull} already " +
          "in the index — re-ingesting an existing id is not a merge")
      val (newBase, nb, ns) = indexTables(newDocs, idCol, textCol,
        minhash.n, minhash.numHashes, minhash.rowsPerBand)
      newBase.persist()
      val crossEdges = probeMatches(
        ns.select(col("doc").as("p_doc"), col("sh").as("p_sh"),
          col("sig").as("p_sig")),
        minhash, threshold, broadcastProbe = true)
        .select(least(col("probe_id"), col("corpus_id")).as("id_a"),
          greatest(col("probe_id"), col("corpus_id")).as("id_b"),
          col("jaccard"))
      val newEdges = selfPairs(nb, ns, threshold)
      // truncate the returned plans (PlanBridge + persist, untracked):
      // repeated folding would otherwise nest one union layer per batch
      import org.apache.spark.sql.graftbridge.PlanBridge
      def indexPlan(df: DataFrame): DataFrame =
        PlanBridge.truncated(df).persist()
      val addedEdges = crossEdges.unionByName(newEdges)
      // the fold's delta: this batch's new rows, merged with any delta
      // already pending from earlier in-memory folds — so save()'s
      // append commit always carries "everything since origin", however
      // many addDocs calls ran between load and save.
      //
      // The delta plans are truncated HERE so repeated folding can't
      // nest a union layer per batch. The probe join's shape does NOT
      // depend on when these plans compile: probeMatches runs with
      // broadcastProbe = true, which pins the batch-broadcast plan by
      // hint — planner size estimates (which flip with newBase's
      // materialization state, the round-13 cache-trap) never get a
      // vote on whether the corpus index shuffles.
      val mergedDelta = delta match {
        case Some(prev) => PairGraphDelta(
          indexPlan(prev.banded.unionByName(nb)),
          indexPlan(prev.sets.unionByName(ns)),
          indexPlan(prev.edges.unionByName(addedEdges)))
        case None => PairGraphDelta(indexPlan(nb), indexPlan(ns),
          indexPlan(addedEdges))
      }
      // delta frames are persisted (indexPlan) — register them so
      // release() frees them with everything else
      val deltaCaches = Seq(mergedDelta.banded, mergedDelta.sets,
        mergedDelta.edges)
      PairGraphIndex(
        MinhashIndex(minhash.n, minhash.numHashes, minhash.rowsPerBand,
          indexPlan(minhash.banded.unionByName(nb)),
          indexPlan(minhash.sets.unionByName(ns)),
          caches = Seq(newBase)),
        threshold,
        indexPlan(edges.unionByName(crossEdges).unionByName(newEdges)),
        caches = deltaCaches,
        delta = Some(mergedDelta),
        origin = origin)
    }
  }

  /** Build the pair-graph index: minhash tables once, verified edges
    * from those tables, both materialized together on [[PairGraphIndex.save]].
    * `corpus` ids must be unique.
    */
  def pairGraphIndex(corpus: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, rowsPerBand: Int,
      threshold: Double): PairGraphIndex = {
    val mh = minhashIndex(corpus, idCol, textCol, n, numHashes, rowsPerBand)
    PairGraphIndex(mh, threshold, indexPairs(mh, threshold))
  }

  /** Load a committed pair-graph index. SNAPSHOT-CONSISTENT: all four
    * tables are read at ONE pinned commit — a concurrent maintenance
    * commit landing between per-table reads would otherwise hand the
    * caller batch k+1's edge table against batch k's params/minhash
    * tables (observed shape: a mid-stream reader racing
    * [[maintainPairGraph]]).
    */
  def loadPairGraphIndex(spark: org.apache.spark.sql.SparkSession,
      cat: graft.catalog.VersionedCatalog, name: String): PairGraphIndex = {
    val c = cat.currentCommit
    def rd(t: String) = cat.readAt(spark, s"$name.$t", c)
    val p = rd("params").head()
    PairGraphIndex(
      MinhashIndex(p.getAs[Int]("n"), p.getAs[Int]("num_hashes"),
        p.getAs[Int]("rows_per_band"), rd("banded"), rd("sets")),
      p.getAs[Double]("threshold"),
      rd("edges"),
      // remember where (and AT WHICH COMMIT) this snapshot came from:
      // an addDocs fold saved back to the same catalog/name commits its
      // delta as an append against exactly this commit
      origin = Some(PairGraphOrigin(cat.root, name, c)))
  }

  /** Continuous pair-graph maintenance over a DOCUMENT STREAM — the
    * edge-table twin of [[maintainDupClusters]]: each micro-batch folds
    * into the persisted graph (first batch builds it, later ones go
    * through [[PairGraphIndex.addDocs]]) and commits atomically with the
    * batch id recorded alongside, so a replayed batch (at-least-once
    * foreachBatch, crash after commit before checkpoint) is a no-op and
    * maintenance is EXACTLY-ONCE end to end. Consumers read the latest
    * committed edge snapshot mid-stream.
    */
  def maintainPairGraph(docs: DataFrame, idCol: String, textCol: String,
      cat: graft.catalog.VersionedCatalog, name: String, n: Int,
      numHashes: Int, rowsPerBand: Int, threshold: Double,
      maxDeltaDirs: Int = 16)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        applyPairGraphBatch(batch.toDF(), batchId, idCol, textCol, cat,
          name, n, numHashes, rowsPerBand, threshold,
          maxDeltaDirs = maxDeltaDirs)
        ()
    }

  /** One pair-graph maintenance step (the foreachBatch body, exposed for
    * direct testing and batch-driven backfills): true when applied,
    * false when skipped (already-applied id or empty batch).
    *
    * Folds commit as APPEND deltas (O(batch) write, not O(corpus) — see
    * [[PairGraphIndex.save]]); `appendCommits = false` keeps the legacy
    * full-rewrite commits. Under append commits delta dirs accumulate
    * one per fold, so once any of the three data tables exceeds
    * `maxDeltaDirs` dirs it is compacted back to one — bounding file
    * counts (and so footer reads + planning time) under continuous
    * maintenance. Compaction never disturbs readers: open snapshots
    * pinned at an older commit keep reading the old dirs (they stay on
    * disk until [[graft.catalog.VersionedCatalog.vacuum]]).
    */
  def applyPairGraphBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, cat: graft.catalog.VersionedCatalog, name: String,
      n: Int, numHashes: Int, rowsPerBand: Int, threshold: Double,
      appendCommits: Boolean = true, maxDeltaDirs: Int = 16): Boolean = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return false
    def commitAndRelease(idx: PairGraphIndex): Boolean = {
      idx.save(cat, name, batchId, appendDelta = appendCommits)
      idx.release()
      releaseCaches()
      Seq("banded", "sets", "edges").foreach { t =>
        cat.compactIfNeeded(spark, s"$name.$t", maxDirs = maxDeltaDirs)
      }
      true
    }
    if (!cat.exists(s"$name.params")) {
      commitAndRelease(pairGraphIndex(batch, idCol, textCol, n, numHashes,
        rowsPerBand, threshold))
    } else {
      val p = cat.read(spark, s"$name.params").head()
      if (batchId <= p.getAs[Long]("last_batch_id")) false // replay
      else commitAndRelease(
        loadPairGraphIndex(spark, cat, name).addDocs(batch, idCol, textCol))
    }
  }

  /** A materialized duplicate-cluster index: the MinHash tables for
    * candidate generation PLUS the (doc_id, cluster_id) connected-
    * components labeling, persisted together. This is the production
    * shape for keep-best/dedup at scale: consumers read the cluster
    * TABLE (the dd10 gate recomputes the pipeline to stay oracle-
    * checkable), and new document batches join existing clusters through
    * [[addDocs]] without ever re-running CC over the corpus.
    */
  final case class DupClusterIndex(minhash: MinhashIndex,
      threshold: Double, clusters: DataFrame,
      caches: Seq[DataFrame] = Nil) {

    /** Unpersist every cached frame this index holds (its own plus the
      * minhash tables'). Call once the index is discarded — e.g. per
      * micro-batch in [[applyDupClusterBatch]], where the catalog commit
      * has already materialized the tables and the next batch re-loads
      * from the catalog; without it the streaming maintenance loop
      * accumulates one set of MEMORY_AND_DISK blocks per batch, unbounded.
      */
    def release(): Unit = {
      (caches :+ clusters).foreach(_.unpersist())
      minhash.release()
    }

    /** Atomic commit of the minhash tables + cluster table + params.
      * `lastBatchId` records the most recent streaming micro-batch folded
      * in (see [[maintainDupClusters]]); −1 for batch-built indexes.
      */
    def save(cat: graft.catalog.VersionedCatalog, name: String,
        lastBatchId: Long = -1L): Unit = {
      val spark = clusters.sparkSession
      import spark.implicits._
      val params = Seq((minhash.n, minhash.numHashes, minhash.rowsPerBand,
        threshold, lastBatchId))
        .toDF("n", "num_hashes", "rows_per_band", "threshold",
          "last_batch_id")
      cat.commit(Map(
        s"$name.banded" -> minhash.banded,
        s"$name.sets" -> minhash.sets,
        s"$name.clusters" -> clusters,
        s"$name.params" -> params))
      ()
    }

    /** One keeper per cluster by quality (dd10's shape) — reads the
      * PERSISTED cluster table; no LSH, no CC, one max_by shuffle.
      */
    def keepBest(quality: DataFrame, idCol: String,
        qualityCol: String): DataFrame =
      clusters
        .join(quality.select(col(idCol).as("doc_id"),
          col(qualityCol).as("q")), Seq("doc_id"))
        .groupBy(col("cluster_id"))
        .agg(
          // (max quality, then SMALLEST id) via min_by over (-q, id):
          // only the numeric quality is negated, so ids of any orderable
          // type (long, string, ...) tie-break correctly
          min_by(col("doc_id"),
            struct((-col("q")).as("nq"), col("doc_id"))).as("keep_id"),
          count(lit(1)).as("n_docs"))

    /** Which existing cluster(s) does each incoming document hit?
      * Stateless (probe + equi-join against the two static tables), so
      * `docs` may be a STREAMING DataFrame: continuous cluster
      * assignment for an ingest pipeline, no state store, index side
      * static. Returns (probe_id, cluster_id, corpus_id, jaccard) — one
      * row per verified match; consumers pick min(cluster_id) per doc
      * for a hash-min-consistent label, or route on any match.
      */
    def clusterMatches(docs: DataFrame, idCol: String,
        textCol: String): DataFrame =
      minhashProbe(docs, minhash, idCol, textCol, threshold)
        .join(clusters.withColumnRenamed("doc_id", "corpus_id"),
          Seq("corpus_id"))
        .select(col("probe_id"), col("cluster_id"), col("corpus_id"),
          col("jaccard"))

    /** Fold a batch of NEW documents into the clustering — EXACTLY the
      * labels a full re-run over old ∪ new would produce, at the cost of
      * the batch, not the corpus:
      *
      *  1. probe new docs against the minhash index (corpus read = the
      *     bucket slices the probe touches) and LSH-pair the batch
      *     against itself;
      *  2. run CC on the SMALL label graph whose nodes are new doc ids
      *     plus the touched cluster ids — a cluster id is the min doc id
      *     of its cluster, so the hash-min label of a merged component
      *     (min over member cluster-ids and new ids) IS the min doc id
      *     of the merged doc set, i.e. identical to a full rebuild. New
      *     docs can merge two old clusters and the relabeling follows;
      *  3. untouched clusters keep their rows verbatim; the minhash
      *     tables extend by the new docs' bands/sets.
      */
    def addDocs(newDocs: DataFrame, idCol: String,
        textCol: String): DupClusterIndex = {
      // id collisions would silently corrupt the labeling (a doc in both
      // movedOld and newRows); fail fast instead
      val clash = newDocs.select(col(idCol).as("doc_id"))
        .join(clusters, Seq("doc_id"), "left_semi").limit(1).collect()
      require(clash.isEmpty,
        s"addDocs: doc id ${clash.headOption.map(_.get(0)).orNull} already " +
          "in the index — re-ingesting an existing id is not a merge")
      // hash the batch ONCE: the same (banded, sets) tables serve the
      // corpus probe, the batch self-pairs, and the index extension.
      // Persisted outside the transient registry (plain persist): these
      // frames become part of the RETURNED index, so their lifetime is
      // the index object's — releaseCaches() must not pull them out from
      // under it. They are tracked on the index's `caches` instead and
      // freed by DupClusterIndex.release() when the index is discarded.
      val (newBase, nb, ns) = indexTables(newDocs, idCol, textCol,
        minhash.n, minhash.numHashes, minhash.rowsPerBand)
      newBase.persist()
      val hits = probeMatches(
        ns.select(col("doc").as("p_doc"), col("sh").as("p_sh"),
          col("sig").as("p_sig")),
        minhash, threshold, broadcastProbe = true)
      val newPairs = selfPairs(nb, ns, threshold)
      val clusterEdges = hits
        .join(clusters.withColumnRenamed("doc_id", "corpus_id"),
          Seq("corpus_id"))
        .select(col("probe_id").as("id_a"), col("cluster_id").as("id_b"))
        .distinct()
      val edges = clusterEdges
        .unionByName(newPairs.select(col("id_a"), col("id_b")))
      val nodes = newDocs.select(col(idCol).as("node"))
        .unionByName(clusterEdges.select(col("id_b").as("node")))
        .distinct()
      val (relabeled, relabeledCache) = dupClustersWithCache(nodes, "node", edges)
      // touched old clusters move to their merged label …
      val touched = relabeled
        .select(col("node").as("old_cluster"),
          col("cluster_id").as("new_cluster"))
        .join(clusters.select(col("cluster_id").as("old_cluster")).distinct(),
          Seq("old_cluster"))
      val movedOld = clusters
        .join(touched, col("cluster_id") === col("old_cluster"), "left")
        .select(col("doc_id"),
          coalesce(col("new_cluster"), col("cluster_id")).as("cluster_id"))
      // … and new docs take their component's label
      val newRows = relabeled
        .join(newDocs.select(col(idCol).as("node")), Seq("node"))
        .select(col("node").as("doc_id"), col("cluster_id"))
      // truncate the returned plans (PlanBridge + persist, untracked):
      // repeated addDocs folding would otherwise nest one join/union
      // layer per batch until plan compilation — not data — is the
      // bottleneck, the same hazard dupClusters' roundCache guards
      import org.apache.spark.sql.graftbridge.PlanBridge
      def indexPlan(df: DataFrame): DataFrame =
        PlanBridge.truncated(df).persist()
      DupClusterIndex(
        MinhashIndex(minhash.n, minhash.numHashes, minhash.rowsPerBand,
          indexPlan(minhash.banded.unionByName(nb)),
          indexPlan(minhash.sets.unionByName(ns)),
          caches = Seq(newBase)),
        threshold,
        indexPlan(movedOld.unionByName(newRows)),
        caches = relabeledCache.toSeq)
    }
  }

  /** Build the cluster index: minhash tables once, pairs from those
    * tables, CC labels materialized. `corpus` ids must be unique.
    */
  def dupClusterIndex(corpus: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, rowsPerBand: Int,
      threshold: Double): DupClusterIndex = {
    val mh = minhashIndex(corpus, idCol, textCol, n, numHashes, rowsPerBand)
    val (labels, labelsCache) = dupClustersWithCache(
      corpus.select(col(idCol)), idCol,
      indexPairs(mh, threshold).select("id_a", "id_b"))
    DupClusterIndex(mh, threshold,
      labels.withColumnRenamed(idCol, "doc_id"),
      caches = labelsCache.toSeq)
  }

  def loadDupClusterIndex(spark: org.apache.spark.sql.SparkSession,
      cat: graft.catalog.VersionedCatalog, name: String): DupClusterIndex = {
    val p = cat.read(spark, s"$name.params").head()
    DupClusterIndex(
      MinhashIndex(p.getAs[Int]("n"), p.getAs[Int]("num_hashes"),
        p.getAs[Int]("rows_per_band"),
        cat.read(spark, s"$name.banded"), cat.read(spark, s"$name.sets")),
      p.getAs[Double]("threshold"),
      cat.read(spark, s"$name.clusters"))
  }

  /** Continuous dup-cluster index maintenance over a DOCUMENT STREAM:
    * each micro-batch folds into the persisted index (first batch builds
    * it, later ones go through [[DupClusterIndex.addDocs]]) and commits
    * atomically to the catalog with the batch id recorded alongside.
    * foreachBatch is at-least-once; the recorded id turns a replayed
    * batch (crash after commit, before checkpoint) into a no-op — so
    * index maintenance is EXACTLY-ONCE end to end, and the labels equal
    * a batch rebuild over everything ingested. State lives in the
    * catalog, not the state store: restart-safe, queryable mid-stream
    * (keepBest / clusterMatches read the latest committed snapshot), and
    * bounded by corpus size, not stream history.
    *
    * Returns the configured DataStreamWriter; the caller picks trigger/
    * checkpoint and calls start().
    */
  def maintainDupClusters(docs: DataFrame, idCol: String, textCol: String,
      cat: graft.catalog.VersionedCatalog, name: String, n: Int,
      numHashes: Int, rowsPerBand: Int, threshold: Double)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        applyDupClusterBatch(batch.toDF(), batchId, idCol, textCol, cat,
          name, n, numHashes, rowsPerBand, threshold)
        ()
    }

  /** One maintenance step (the foreachBatch body, exposed for direct
    * testing and for batch-driven backfills): returns true when the
    * batch was applied, false when skipped (already-applied id or empty
    * batch).
    */
  def applyDupClusterBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, cat: graft.catalog.VersionedCatalog, name: String,
      n: Int, numHashes: Int, rowsPerBand: Int,
      threshold: Double): Boolean = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return false
    // per-batch index objects are discarded after the catalog commit —
    // release their caches (and the pair-finding transients) or the
    // long-running maintenance loop accumulates one MEMORY_AND_DISK
    // block set per micro-batch, unbounded
    def commitAndRelease(idx: DupClusterIndex): Boolean = {
      idx.save(cat, name, batchId)
      idx.release()
      releaseCaches()
      true
    }
    if (!cat.exists(s"$name.params")) {
      commitAndRelease(dupClusterIndex(batch, idCol, textCol, n, numHashes,
        rowsPerBand, threshold))
    } else {
      val p = cat.read(spark, s"$name.params").head()
      if (batchId <= p.getAs[Long]("last_batch_id")) false // replay
      else commitAndRelease(
        loadDupClusterIndex(spark, cat, name).addDocs(batch, idCol, textCol))
    }
  }

  /** (banded, sets) index tables for a document set — the building block
    * shared by [[minhashIndex]] and incremental [[DupClusterIndex.addDocs]].
    */
  /** (base, banded, sets) for a document set — banded and sets both
    * derive from the ONE `base` frame, so callers persist base alone and
    * the text-hash pipeline (shingling + minhash signatures, the
    * dominant cost) runs once, not once per derived table.
    */
  private[ops] def indexTables(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int,
      rowsPerBand: Int): (DataFrame, DataFrame, DataFrame) = {
    // spread first: shingling + the numHashes-way signature fold is the
    // CPU-heavy stage of every LSH consumer
    val base = spread(df)
      .select(col(idCol).as("doc"), shingleHashes(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", signatureOf(col("sh"), numHashes))
    (base, bandedOf(base, numHashes, rowsPerBand),
      base.select(col("doc"), col("sh"), col("sig")))
  }

  /** 63-bit SimHash over word tokens: bit j of the signature is the sign
    * of the sum over tokens of (+1 if bit j of tokenHash else -1).
    * Single-pass expression (TextExprs.simhash) with arithmetic identical
    * to the portable per-bit-vote formulation the oracle replays.
    */
  def simhash(text: Column): Column =
    graft.functions.TextExprs.simhash(text)

  /** Hamming distance between two simhash signatures. */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs at Hamming distance ≤ `maxDist` via pigeonhole
    * banding: the signature splits into `maxDist + 1` disjoint bit-bands,
    * and a pair differing in ≤ maxDist bits must agree EXACTLY on at least
    * one band — so candidate generation is an equi-join on (band, bits)
    * (shuffle-partitioned, no cross product) instead of an O(N²)
    * nested-loop self-join. Verification is one xor+popcount per
    * candidate. Returns (id_a, id_b, dist), id_a < id_b, each pair once.
    */
  /** Near-dup CLUSTERS from a pair list: connected components with the
    * min doc id as the canonical (cluster) id — the step that turns pair
    * output (dd2/dd3/dd6) into "keep one doc per duplicate group".
    *
    * Hash-min label propagation: every doc starts labeled with itself;
    * each round a doc takes the min label among itself and its
    * neighbors, until a fixpoint. Rounds = component diameter, and dup
    * groups are near-cliques (diameter ≤ ~2), so 3-4 shuffle rounds at
    * any corpus size; each round is one equi-join + one min-aggregate,
    * both on the doc-id key. Labels persist per round with bounded
    * lineage. (For adversarially chain-shaped graphs the large-star/
    * small-star variant halves round count; dup graphs don't need it.)
    *
    * `ids` = one row per doc (singletons get their own cluster);
    * `pairs` = (id_a, id_b) undirected edges, whose endpoints MUST be
    * drawn from `ids` — the r17 contraction builds its label seed from
    * the pair graph alone, so an out-of-universe endpoint would bridge
    * components and can surface as a cluster_id that exists in no `ids`
    * row (the old identity-seeded loop left such endpoints inert). Every
    * internal caller satisfies this by construction; external callers
    * with a wider pair set must semi-join both endpoints to `ids` first.
    * Returns (idCol, cluster_id), deterministic.
    *
    * Each round's labels go through [[roundCache]]: persist alone keeps
    * the full logical plan, which after k rounds nests k joins and blows
    * up plan compilation/stringification long before data is the problem.
    * The final round's cache stays alive (the returned DataFrame reads
    * it); callers drop it with clearCache, the repo-wide convention for
    * persisted query internals.
    */
  def dupClusters(ids: DataFrame, idCol: String, pairs: DataFrame,
      maxIters: Int = 50): DataFrame = {
    val (labels, cache) = dupClustersWithCache(ids, idCol, pairs, maxIters)
    // the final round's cache backs the returned plan — register it so
    // releaseCaches()/withCaches scopes it (callers that drop the result
    // without materializing just recompute)
    cache.foreach(trackExisting)
    labels
  }

  /** Leakage-free train/val/test split (dd20): every document inherits
    * its near-dup CLUSTER's split, so no near-duplicate pair ever
    * straddles train and eval — the train/test contamination that
    * decontamination (ts7) detects after the fact, prevented at split
    * time instead. The cluster's split comes from a Knuth multiplicative
    * mix of its canonical id, PRE-REDUCED mod the prime 1000003 before
    * the multiply (the [[TextAnalysis.sampleRank]] discipline): without
    * the reduction, ids above ~3.47e9 — any snowflake-style 64-bit id —
    * overflow the Long multiply, Spark wraps negative (everything lands
    * in 'train') while DuckDB raises, and the two engines diverge.
    * Plain integer *,% both engines evaluate identically on the reduced
    * domain, so the assignment is reproducible anywhere and stable under
    * re-splitting — growing the corpus never moves an untouched cluster
    * between splits (new pairs can merge clusters, which must re-route;
    * nothing else does). Percent thresholds keep the knob integral:
    * (trainPct, valPct, rest=test). Adds one map-only projection over
    * [[dupClusters]].
    */
  def leakageFreeSplit(ids: DataFrame, idCol: String, pairs: DataFrame,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100)
    dupClusters(ids, idCol, pairs).select(
      col(idCol), col("cluster_id"),
      splitOf(col("cluster_id"), trainPct, valPct).as("split"))
  }

  /** The split assignment expression of [[leakageFreeSplit]] on an
    * arbitrary key column — exposed so an already-deduplicated corpus
    * (every doc its own cluster) can split map-only without running the
    * connected-components machinery against a known-empty pair set.
    */
  def splitOf(key: org.apache.spark.sql.Column, trainPct: Int,
      valPct: Int): org.apache.spark.sql.Column = {
    val bucket = key % lit(1000003L) * lit(2654435761L) %
      lit(1000003L) % lit(100L)
    when(bucket < trainPct, lit("train"))
      .when(bucket < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** [[dupClusters]] plus a handle on the final round's persisted cache
    * (the returned labels read it, so it cannot be unpersisted inside the
    * loop). Callers that discard the labels after materializing them
    * elsewhere — [[DupClusterIndex.addDocs]], [[dupClusterIndex]] — use
    * the handle for deterministic release instead of leaking one block
    * set per invocation.
    */
  private[graft] def dupClustersWithCache(ids: DataFrame, idCol: String,
      pairs: DataFrame, maxIters: Int = 50): (DataFrame, Seq[DataFrame]) = {
    // cache the pair projection before the symmetrizing union — both
    // branches would re-run the whole pair pipeline otherwise (the
    // pageRankAdjacency lesson)
    val p = tracked(pairs.select(col("id_a"), col("id_b")))
    val edges = p.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionByName(p.select(col("id_b").as("u"), col("id_a").as("v")))
      .persist()
    // CONTRACTION pass (the pageRankContracted label derivation, applied
    // to the CC loop itself): l0 = min(self, min neighbor) — exactly the
    // old loop's first round over the identity seed — roots every clique
    // in ONE map-combined aggregation; the remaining hash-min rounds run
    // on the residual LABEL graph (distinct cross-label edges — EMPTY
    // for clique families, tiny for anything near-clique) instead of
    // re-scanning the full edge table every round. Components and their
    // min ids are preserved by the quotient, so the fixpoint labels are
    // bit-identical; on the adversarial path graph the label graph
    // halves, so non-convergence inside maxIters still throws exactly
    // like the uncontracted loop (DedupSpec pins that on a 200-chain).
    val l0 = roundCache(edges.groupBy(col("u")).agg(min(col("v")).as("mn"))
      .select(col("u").as("id"), least(col("u"), col("mn")).as("l")))
    val le = roundCache(edges
      .join(l0.select(col("id").as("u"), col("l").as("lu")), Seq("u"))
      .join(l0.select(col("id").as("v"), col("l").as("lv")), Seq("v"))
      .where(col("lu") =!= col("lv"))
      .select(col("lu").as("u"), col("lv").as("v")).distinct())
    val leCnt = le.count() // materializes edges, l0 and le in one job
    edges.unpersist()
    // hash-min to fixpoint over the contracted graph (label-scale state;
    // the loop never touches the full edge table again)
    var rootsCache: Option[DataFrame] = None
    var roots: DataFrame = null
    if (leCnt > 0) {
      var cached = roundCache(le.select(col("u").as("id")).distinct()
        .select(col("id"), col("id").as("label")))
      var labels = cached
      var changed = 1L
      var iters = 0
      while (changed > 0 && iters < maxIters) {
        val nbrMin = le.join(labels, col("v") === col("id"))
          .groupBy(col("u")).agg(min("label").as("nbr"))
        val step = roundCache(labels
          .join(nbrMin, col("id") === col("u"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nbr"), col("label")))
              .as("label"),
            (col("nbr") < col("label")).as("chg")))
        changed = step.where(col("chg")).count() // materializes the cache
        cached.unpersist()
        cached = step
        labels = step.select("id", "label")
        iters += 1
      }
      if (changed > 0) {
        // nothing is returned, so nothing holds the caches
        cached.unpersist(); le.unpersist(); l0.unpersist()
        throw new IllegalStateException(
          s"dupClusters did not converge in $maxIters rounds " +
            "(component diameter exceeds the cap; raise maxIters)")
      }
      rootsCache = Some(cached)
      roots = labels.select(col("id").as("l"), col("label").as("root"))
    }
    le.unpersist()
    // map back through the contraction, then onto the caller's universe
    // (ids outside the pair graph stay their own singleton cluster —
    // the identity-seed loop's exact behavior for them)
    val full =
      if (roots == null) l0.select(col("id"), col("l").as("label"))
      else l0.join(roots, Seq("l"), "left")
        .select(col("id"), coalesce(col("root"), col("l")).as("label"))
    val out = ids.select(col(idCol).as("id"))
      .join(full, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("label"), col("id")).as("cluster_id"))
    (out, l0 +: rootsCache.toSeq)
  }

  /** Round-state cache for the iterative loops: truncate the logical plan
    * to a single leaf (PlanBridge), then persist — plan size stays O(1)
    * per round AND release stays deterministic (persist is CacheManager-
    * visible; localCheckpoint blocks are not, so clearCache couldn't free
    * them and superseded rounds would linger until driver GC).
    */
  private def roundCache(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftbridge.PlanBridge.truncated(df).persist()

  /** Verbatim-overlap pairs via winnowing fingerprints (MOSS) — the
    * substring-duplication detector that complements shingle Jaccard:
    * two docs sharing any run of ≥ k + w − 1 identical CHARACTERS share
    * at least one fingerprint regardless of how different the rest of
    * the docs are (a 90%-rewritten page with one long quoted block, a
    * boilerplate license header, a copied paragraph), which word-set
    * Jaccard at document granularity cannot see.
    *
    * Shape mirrors [[jaccardPairsCapped]]: one bounded-collect shuffle
    * builds per-fingerprint doc buckets with an exact doc-frequency
    * count but ≤ `maxDocFreq` members (hot boilerplate fingerprints are
    * skew-capped), in-bucket ordered pair expansion, then a pair-count
    * aggregate over bare (id, id) rows. Returns (id_a, id_b, n_shared)
    * with n_shared ≥ `minShared`, id_a < id_b.
    */
  /** Content-defined chunk dedup — the STORAGE-level dedup primitive
    * (the rsync/LBFS boundary rule): each doc splits at content-defined
    * boundaries (rolling k-gram hash ≡ 0 mod `modulus`, the codegen
    * O(len) [[graft.functions.CdcChunksExpr]]), so an edit re-chunks
    * only its own neighborhood and shared runs across docs — or doc
    * VERSIONS — land in byte-identical chunks, which then dedup exactly
    * by sha256. Fixed-size blocks lose alignment forever after one
    * insertion; content-defined ones re-synchronize at the next
    * boundary. Returns the corpus chunk ledger: one row per distinct
    * chunk with multiplicity, doc spread, length and canonical owner —
    * stored bytes = Σ chunk_len, raw bytes = Σ chunk_len · n_copies.
    *
    * Plan: map-only chunking (1→N explode), then ONE shuffle keyed by
    * the 32-byte chunk hash — [[exactDedup]]'s shape at sub-document
    * grain.
    */
  def cdcDedup(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, modulus: Int = 64): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(graft.functions.TextExprs.cdcChunks(col(textCol), k,
          modulus)).as("chunk"))
      .select(col("doc_id"), sha2(col("chunk"), 256).as("chunk_sha"),
        length(col("chunk")).cast("long").as("chunk_len"))
      .groupBy(col("chunk_sha"), col("chunk_len"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("canonical_id"))

  /** k-core of the near-dup pair graph: iteratively peel every node
    * whose degree in the SURVIVING subgraph falls below `k` until
    * fixpoint — what remains is the maximal subgraph where every doc
    * has ≥ k near-duplicates among the other survivors. On a curation
    * corpus that is the template-farm detector: organic near-dup pairs
    * peel away in a round or two, machine-generated families (every
    * page a variant of every other) survive any k up to their size.
    * Returns (id, degree) over the survivors.
    *
    * DELTA PEEL over a STATIC edge table: degrees are computed ONCE from
    * the full edge set, then maintained incrementally — the edge table
    * is cached once and NEVER rewritten (the r16 delta form still
    * materialized a shrinking edge copy every round: two full edge-set
    * cache writes + three jobs per round; the r15 full-reaggregation
    * form re-shuffled all E edges per round — 200M shuffle records at
    * ×100 for a 27.1M-edge graph). An edge decrements exactly one
    * maintained degree, in the round its FIRST endpoint peels: the loss
    * aggregate joins the static edges against the just-peeled set on
    * either endpoint and emits the opposite endpoint, so the per-round
    * SHUFFLE is the matched endpoints only — ≤ 2·E records across ALL
    * rounds combined, linear in the cascade, never O(E·rounds). Emitted
    * endpoints that are already dead (peeled earlier, or peeling this
    * same round) fall out of the deg ≥ k join target — exactly the old
    * form's "an edge with both endpoints peeled decrements nobody left
    * alive" rule; an edge with a LONG-dead endpoint cannot emit against
    * a live one because the edge already decremented it the round that
    * endpoint died (by induction the static-edges-matched-on-peel set
    * and the old surviving-edge set remove the same decrements in the
    * same round). The fixpoint probe rides the same job that
    * materializes the round's degree cache (count of sub-k rows), so a
    * round is ONE Spark job and one node-sized cache write. The
    * SEMANTICS are unchanged from the full-reaggregation form (g3/g3b
    * gates): round r simultaneously removes every node whose degree in
    * the surviving subgraph is below k, and a node whose maintained
    * degree hits 0 drops out exactly as it vanished from the old
    * per-round degree aggregate (a degree reaches 0 only when all the
    * node's edges lost their other endpoint).
    */
  def kCore(pairs: DataFrame, k: Int, maxRounds: Int = 50,
      requireConverged: Boolean = true): DataFrame = {
    require(k >= 1, s"kCore needs k >= 1, got $k")
    // canonicalize orientation first: a producer emitting BOTH (a,b)
    // and (b,a) would otherwise double-count every degree
    val edges = roundCache(pairs
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .where(col("id_a") =!= col("id_b")).distinct())
    // the ONE full-graph degree aggregation; deg holds every node with
    // >= 1 surviving edge, exactly the old per-round aggregate's domain
    var deg = roundCache(edges
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("deg")))
    // materializes edges + deg and probes the first round's peel in the
    // same job; later rounds fold the probe into their cache-fill count
    var nBelow = deg.where(col("deg") < k).count()
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      if (nBelow == 0L) done = true // fixpoint: nothing below k
      else {
        val np = deg.where(col("deg") < k)
        // loss per surviving node: the STATIC edge table matched against
        // the just-peeled set on either endpoint, projected to the OTHER
        // endpoint — ONE scan of the cached edges (each edge exploded
        // into its two directions in the map stage, then a semi-join on
        // the peeled src). Contributions aimed at dead or
        // same-round-peeling nodes fall out of the deg >= k join below;
        // a live endpoint is hit exactly once per lost edge, in the
        // round the edge's first endpoint peels
        val dir = edges.select(explode(array(
            struct(col("id_a").as("src"), col("id_b").as("dst")),
            struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
        val loss = dir
          .join(np.select(col("id").as("src")), Seq("src"), "left_semi")
          .groupBy(col("dst")).agg(count(lit(1)).as("lost"))
          .withColumnRenamed("dst", "id")
        val nextDeg = roundCache(deg.where(col("deg") >= k)
          .join(loss, Seq("id"), "left")
          .select(col("id"),
            (col("deg") - coalesce(col("lost"), lit(0L))).as("deg"))
          .where(col("deg") >= 1L))
        // ONE job fills the new round's cache AND carries the next
        // fixpoint probe (sub-k survivor count) back to the driver
        nBelow = nextDeg.where(col("deg") < k).count()
        deg.unpersist()
        deg = nextDeg
      }
      round += 1
    }
    // the documented contract is a FIXPOINT (every survivor holds >= k
    // in-subgraph neighbors); a truncated peel silently breaks it —
    // refuse unless the caller explicitly asked for the bounded-round
    // semantic (requireConverged = false: exactly-maxRounds
    // simultaneous peel, the form a fixed-unroll oracle replays)
    if (requireConverged && !done) {
      edges.unpersist(); deg.unpersist() // nothing is returned
      throw new IllegalStateException(
        s"kCore did not converge in $maxRounds rounds (deep peel " +
          "cascade — raise maxRounds, or pass requireConverged = false " +
          "for the bounded-round semantic)")
    }
    edges.unpersist() // the output reads the maintained degrees only
    trackExisting(deg) // final round backs the returned plan
    deg.select(col("id"), col("deg").as("degree"))
  }

  /** Merge CDC ledgers: counts and doc spreads are ADDITIVE provided no
    * document is chunked into more than one input (each doc chunks in
    * exactly one batch and doc ids are fresh across batches — the same
    * append contract as packSequencesAppend), canonical = min. The
    * associativity is what makes the persisted ledger append-only.
    */
  def mergeCdcLedgers(parts: DataFrame): DataFrame =
    parts.groupBy(col("chunk_sha"), col("chunk_len"))
      .agg(sum(col("n_copies")).as("n_copies"),
        sum(col("n_docs")).as("n_docs"),
        min(col("canonical_id")).as("canonical_id"))

  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minShared: Long, maxDocFreq: Int): DataFrame = {
    val fp = spread(df).select(col(idCol).as("doc"),
        graft.functions.TextExprs.winnowFingerprints(col(textCol), k, w)
          .as("fps"))
      .where(size(col("fps")) > 0)
    val ex = fp.select(col("doc"), explode(col("fps")).as("f"))
    val freq = ex.groupBy("f")
      .agg(graft.functions.BoundedCollect
        .boundedCollect(col("doc"), maxDocFreq).as("bc"))
    val rare = freq
      .where(col("bc.df") >= 2 && col("bc.df") <= maxDocFreq)
      .select(col("bc.ds").as("ds"))
    rare.select(explode(orderedPairs(col("ds"))).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Span-level verbatim-overlap report: for each near-dup pair, WHERE
    * the shared material sits in both documents — (id_a, id_b, n_shared,
    * lo_a, hi_a, lo_b, hi_b) with lo/hi the gram-index bounds of the
    * matched winnowing selections ([[graft.functions.TextExprs
    * .winnowPositions]]). Character offsets ≈ gram index (a k-gram at
    * index i starts at code point i), so a caller can excise the
    * duplicated run instead of dropping the whole doc. Same freq-capped
    * equi-join shape as [[winnowPairs]].
    */
  def winnowSpanPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minShared: Long, maxDocFreq: Int): DataFrame = {
    val e = tracked(spread(df).select(col(idCol).as("doc"),
        explode(graft.functions.TextExprs
          .winnowPositions(col(textCol), k, w)).as("s"))
      .select(col("doc"), col("s.fp").as("f"), col("s.pos").as("pos")))
    // cap on DOC frequency (distinct docs per fingerprint), matching
    // winnowPairs — a fingerprint repeated at many positions WITHIN one
    // doc must not trip the hot-boilerplate cap
    val keep = e.select(col("doc"), col("f")).distinct()
      .groupBy("f").agg(count(lit(1)).as("n"))
      .where(col("n") >= 2 && col("n") <= maxDocFreq)
      .select("f")
    val kept = e.join(keep, Seq("f"), "left_semi")
    // n_shared = DISTINCT shared fingerprints (comparable to
    // winnowPairs' threshold), not the |posA|x|posB| cross-product the
    // position join produces for internally-repeated fingerprints
    kept.as("a").join(kept.as("b"),
        col("a.f") === col("b.f") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count_distinct(col("a.f")).as("n_shared"),
        min(col("a.pos")).as("lo_a"), max(col("a.pos")).as("hi_a"),
        min(col("b.pos")).as("lo_b"), max(col("b.pos")).as("hi_b"))
      .where(col("n_shared") >= minShared)
  }

  /** Connected components via alternating large-star / small-star — the
    * variant of [[dupClusters]] for ADVERSARIALLY-SHAPED graphs. Hash-min
    * label propagation needs O(diameter) rounds, so a chain of 10k docs
    * (each near-dup of the next — common in crawl snapshots where a page
    * drifts slightly per capture) needs 10k shuffle rounds. Large-star/
    * small-star contracts every node toward its component minimum each
    * round and converges in O(log² n) rounds on ANY shape (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14 — public
    * algorithm, re-derived here on DataFrames).
    *
    * Both phases are one aggregate + one join on the node key:
    *  - large-star: every u computes m = min(Γ(u) ∪ {u}); each LARGER
    *    neighbor v > u re-attaches to m;
    *  - small-star: edges oriented high→low; every u re-attaches its
    *    smaller neighbors (and itself) to m = min of them.
    * Edges stay oriented (larger, smaller), so termination = the edge
    * set is a fixpoint (checked with a count + hash-sum checksum — one
    * cheap aggregate instead of a two-sided anti-join). At the fixpoint
    * every component is a star centered on its min id.
    *
    * Same contract as [[dupClusters]]: `ids` one row per doc, `pairs`
    * undirected (id_a, id_b) edges, returns (idCol, cluster_id).
    */
  def dupClustersStar(ids: DataFrame, idCol: String, pairs: DataFrame,
      maxIters: Int = 50): DataFrame = {
    import org.apache.spark.sql.Row
    // Each round's edge set goes through roundCache (plan truncation +
    // CacheManager-visible persist): a persisted-only DataFrame keeps its
    // full logical plan, so after k rounds the plan tree nests k rounds
    // of join+agg+distinct and AQE's plan stringification alone goes OOM
    // (observed on a 200-node chain). At cluster scale prefer
    // `spark.sparkContext.setCheckpointDir` + `.checkpoint()` for
    // executor-loss tolerance — same structure, reliable storage
    // (documented trade-off).
    //
    // canonicalize to (u > v), drop self-loops and duplicates
    var edges = roundCache(pairs
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct())

    // set fingerprint: count + order-insensitive xor of two independent
    // row hashes (xor, not sum — overflow-free under ANSI; rows are
    // distinct so nothing self-cancels)
    def checksum(e: DataFrame): (Long, Long, Long) = {
      val r: Row = e.agg(count(lit(1)),
        bit_xor(xxhash64(col("u"), col("v"))),
        bit_xor(xxhash64(col("v"), lit(0x9e3779b9L), col("u")))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }

    /** large-star: m(u) = min over Γ(u) ∪ {u} on the UNDIRECTED view;
      * larger neighbors attach to m. Output stays (larger, smaller). */
    def largeStar(e: DataFrame): DataFrame = {
      val bi = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = bi.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      bi.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }

    /** small-star on high→low edges: u's smaller neighbors plus u attach
      * to m(u) = min(Γ⁻(u)). Output stays (larger, smaller). */
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("u").agg(min(col("v")).as("m"))
      val reattached = e.join(mins, "u")
        .where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      val selfEdge = mins.select(col("u"), col("m").as("v"))
      reattached.union(selfEdge)
        .where(col("u") =!= col("v"))
        .distinct()
    }

    var sig = checksum(edges)
    var converged = edges.isEmpty
    var iters = 0
    while (!converged && iters < maxIters) {
      val next = roundCache(smallStar(largeStar(edges)))
      val nextSig = checksum(next) // materializes the cache
      edges.unpersist()
      edges = next
      converged = nextSig == sig
      sig = nextSig
      iters += 1
    }
    if (!converged && iters >= maxIters) {
      edges.unpersist() // nothing is returned, so nothing holds the cache
      throw new IllegalStateException(
        s"dupClustersStar did not converge in $maxIters rounds")
    }
    // star fixpoint: every non-root has exactly one edge to its root
    val labels = ids.select(col(idCol).as("id"))
      .join(edges, col("id") === col("u"), "left")
      .select(col("id").as(idCol),
        coalesce(col("v"), col("id")).as("cluster_id"))
    trackExisting(edges) // final round backs the returned plan
    labels
  }

  /** Decontamination: count, per training doc, the distinct word
    * `n`-gram shingles it shares with a benchmark corpus — the
    * "eval-set leakage" filter of an LLM data pipeline. Only docs with
    * at least one hit come back (join semantics); everything else is
    * clean by construction.
    *
    * Scale shape: the benchmark shingle set is tiny next to the corpus
    * (eval sets are thousands of docs, training corpora billions), so it
    * broadcasts; the corpus side streams through a broadcast hash join
    * with NO shuffle, and only matching (doc, shingle) rows reach the
    * per-doc count aggregate.
    */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val benchSh = bench
      .select(explode(shingleHashes(col(textCol), n)).as("shingle"))
      .distinct()
    val trainSh = train.select(col(idCol),
      explode(shingleHashes(col(textCol), n)).as("shingle"))
    // per-doc shingles are distinct (shingleHashes contract), so a plain
    // count equals count-distinct-matching-shingles
    trainSh.join(broadcast(benchSh), Seq("shingle"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
  }

  /** [[decontaminate]] with a Bloom semi-join reduction — the
    * large-benchmark regime. When the benchmark's distinct-shingle set
    * is too large to broadcast as rows, the exact join becomes a
    * shuffle join over the ENTIRE exploded corpus (one row per corpus
    * shingle — the dominant cost at 100 TB). This form first collapses
    * the benchmark side to `numBits/8` bytes of Bloom words
    * (driver-held, merge-order-invariant OR build), prefilters corpus
    * shingles with a codegen [[graft.functions.BloomMightContain]]
    * probe, and only the surviving candidates — true hits plus the
    * filter's few false positives — reach the exact join that removes
    * the FPs. No false negatives ⇒ the result EQUALS [[decontaminate]]
    * row for row; the oracle is shared.
    *
    * `broadcastBench = false` pins the shuffle-join (large-benchmark)
    * shape this variant exists for; `true` keeps the broadcast join and
    * uses the Bloom probe as a cheap pre-join row cut.
    */
  def decontaminateBloom(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, numBits: Int = 1 << 20, numHashes: Int = 5,
      broadcastBench: Boolean = false): DataFrame = {
    val benchSh = tracked(bench
      .select(explode(shingleHashes(col(textCol), n)).as("shingle"))
      .distinct())
    val words = benchSh
      .agg(graft.functions.Bloom.bloomAgg(col("shingle"), numBits, numHashes))
      .head().getSeq[Long](0).toArray
    val trainSh = train
      .select(col(idCol), explode(shingleHashes(col(textCol), n)).as("shingle"))
      .where(graft.functions.Bloom.mightContain(col("shingle"), words,
        numHashes))
    val joined =
      if (broadcastBench) trainSh.join(broadcast(benchSh), Seq("shingle"))
      else trainSh.hint("merge").join(benchSh, Seq("shingle"))
    joined.groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
  }

  /** Per-document contamination SCORE — [[decontaminate]] reports only
    * the hit counts of contaminated docs; pipelines that threshold (or
    * audit) need the denominator too. Emits (`idCol`, n_sh, n_hit) for
    * every doc with at least one shingle: total distinct n-gram shingles
    * and how many also occur in the benchmark. The fraction n_hit/n_sh
    * is left to the caller — integer counts are bit-stable under any
    * aggregation order, a float ratio is not its own oracle.
    *
    * Scale shape: identical to [[decontaminate]] — the benchmark side
    * collapses to distinct shingles and broadcasts (benchmarks are
    * ~1e5 docs vs a 100 TB corpus), the corpus side is one explode +
    * broadcast LEFT join + one shuffle on `idCol`.
    */
  def contaminationScore(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val benchSh = bench
      .select(explode(shingleHashes(col(textCol), n)).as("shingle"))
      .distinct()
      .withColumn("hit", lit(1L))
    val trainSh = train.select(col(idCol),
      explode(shingleHashes(col(textCol), n)).as("shingle"))
    trainSh.join(broadcast(benchSh), Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_sh"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
  }

  /** Cross-corpus dedup — drop from `incoming` every document that is a
    * MinHash near-duplicate (banded candidates, exact-Jaccard verify at
    * `threshold`) of a document in the indexed snapshot: the "don't
    * re-ingest what the last crawl already contributed" step. Documents
    * too short to shingle can match nothing and always survive. Returns
    * the surviving `incoming` rows unchanged.
    *
    * Scale shape: [[minhashProbe]]'s — the batch hashes once, candidates
    * come from a banded equi-join against the PERSISTED index (the
    * snapshot corpus is never re-scanned), and the final keep is one
    * left-anti join on `idCol`.
    */
  def crossDedup(incoming: DataFrame, index: MinhashIndex, idCol: String,
      textCol: String, threshold: Double): DataFrame =
    incoming.join(
      minhashProbe(incoming, index, idCol, textCol, threshold)
        .select(col("probe_id").as(idCol)),
      Seq(idCol), "left_anti")

  /** Entropy-balanced disjoint bit masks over a signature column: one
    * 64-column aggregate counts set bits per position; positions
    * round-robin into `numBands` masks by descending balance
    * (min(ones, n−ones)), ties on position — deterministic, and each
    * mask carries an equal share of the corpus' actual entropy. Runs
    * EAGERLY (the masks must be plan literals to stay codegen'd).
    */
  def balancedBandMasks(sig: DataFrame, shCol: String,
      numBands: Int): Array[Long] = {
    val bitCnt = sig.agg(
      count(lit(1)).as("n"),
      (0 until 64).map(j => sum(shiftrightunsigned(col(shCol), j)
        .bitwiseAND(lit(1L))).as(s"b$j")): _*).head()
    val n = bitCnt.getLong(0)
    val balance = (0 until 64).map { j =>
      val ones = if (n == 0) 0L else bitCnt.getLong(j + 1)
      j -> math.min(ones, n - ones)
    }
    val masks = new Array[Long](numBands)
    balance.sortBy { case (j, bal) => (-bal, j) }.zipWithIndex.foreach {
      case ((j, _), rank) => masks(rank % numBands) |= 1L << j
    }
    masks
  }

  /** Banded simhash index of a STATIC corpus, probe-able by
    * [[nearDupProbe]] from a batch OR STREAMING query: `banded` holds one
    * (doc, sh, band, bits) row per band per doc, `masks` the band
    * assignment the probe side must replay. Masks are balanced on the
    * CORPUS' bit entropy — the probe stream adopts them, which is the
    * right dependency direction (the index is built once from the large
    * historical corpus; the stream is whatever arrives next).
    */
  final case class SimhashIndex(masks: Seq[Long], banded: DataFrame) {

    /** Persist the bucket table and the band masks in one atomic catalog
      * commit (`<name>.banded` / `<name>.masks`) — the build-once /
      * probe-many split of [[Similarity.IvfIndex]] for near-dup checks:
      * index the historical corpus once, then every new batch (or
      * stream) probes parquet buckets without re-scanning the corpus.
      */
    def save(cat: graft.catalog.VersionedCatalog, name: String): Unit = {
      val spark = banded.sparkSession
      import spark.implicits._
      val masksDf = masks.zipWithIndex
        .map { case (m, b) => (b, m) }.toDF("band", "mask")
      cat.commit(Map(s"$name.banded" -> banded, s"$name.masks" -> masksDf))
      ()
    }
  }

  /** Load a persisted simhash index (masks in band order + bucket scan). */
  def loadSimhashIndex(spark: org.apache.spark.sql.SparkSession,
      cat: graft.catalog.VersionedCatalog, name: String): SimhashIndex = {
    val masks = cat.read(spark, s"$name.masks")
      .orderBy("band").select("mask")
      .collect().map(_.getLong(0)).toSeq
    SimhashIndex(masks, cat.read(spark, s"$name.banded"))
  }

  def simhashIndex(corpus: DataFrame, idCol: String,
      textCol: String, maxDist: Int): SimhashIndex = {
    val numBands = maxDist + 1
    val sig = corpus.select(col(idCol).as("doc"), simhash(col(textCol)).as("sh"))
      .persist()
    val masks = balancedBandMasks(sig, "sh", numBands)
    val banded = sig.select(col("doc"), col("sh"),
      posexplode(array(masks.toSeq.map(m =>
        col("sh").bitwiseAND(lit(m))): _*)).as(Seq("band", "bits")))
    SimhashIndex(masks.toSeq, banded)
  }

  /** Probe an incoming document set (batch or structured-streaming) for
    * near-dups of an indexed static corpus: each probe doc explodes into
    * `maxDist + 1` (band, bits) keys under the INDEX's masks and
    * equi-joins the index bucket table; Hamming is verified per candidate
    * and the first-matching-band filter keeps each (probe, corpus) pair
    * exactly once WITHOUT a distinct — the whole pipeline is stateless
    * (select + explode + inner equi-join + filter), so on a stream it
    * needs no watermark and no state store, and the index side behaves
    * like any static join input. Returns (probe_id, corpus_id, dist).
    */
  def nearDupProbe(probe: DataFrame, index: SimhashIndex, idCol: String,
      textCol: String, maxDist: Int): DataFrame = {
    val numBands = maxDist + 1
    require(index.masks.length == numBands,
      s"index built for ${index.masks.length - 1} max distance, got $maxDist")
    val masks = index.masks
    val pb = probe
      .select(col(idCol).as("p_doc"), simhash(col(textCol)).as("p_sh"))
      .select(col("p_doc"), col("p_sh"),
        posexplode(array(masks.map(m =>
          col("p_sh").bitwiseAND(lit(m))): _*)).as(Seq("band", "bits")))
    val xorc = col("p_sh").bitwiseXOR(col("sh"))
    val firstMatch = (numBands - 1 to 0 by -1)
      .foldLeft(lit(-1): Column) { (acc, i) =>
        when(xorc.bitwiseAND(lit(masks(i))) === 0L, lit(i)).otherwise(acc)
      }
    pb.join(index.banded, Seq("band", "bits"))
      .where(col("band") === firstMatch)
      .select(col("p_doc").as("probe_id"), col("doc").as("corpus_id"),
        hammingDist(col("p_sh"), col("sh")).as("dist"))
      .where(col("dist") <= maxDist)
  }

  def simhashBandedPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int): DataFrame = {
    val numBands = maxDist + 1
    // persisted: read by the band-balance stats aggregate and both sides
    // of the banded self-join
    val sig = tracked(
      spread(df).select(col(idCol).as("doc"), simhash(col(textCol)).as("sh")))
    // Entropy-balanced band assignment. Pigeonhole only needs the 64 bit
    // POSITIONS partitioned into maxDist+1 disjoint groups — any partition
    // is complete — but contiguous bands degenerate on real corpora:
    // SimHash bits whose token votes are dominated by the shared
    // vocabulary are corpus-constant, and a band of constant bits puts
    // EVERY document in one bucket (observed: 3 of 7 bands with a single
    // 5000-doc bucket ⇒ ~45M candidates, O(N²) through the back door).
    // One 64-column aggregate over the persisted signatures counts set
    // bits per position; positions round-robin into bands by descending
    // balance, so each band carries an equal share of the corpus' actual
    // entropy. Deterministic (ties break on position), and at 100 TB the
    // stats pass is a single agg over an 8-byte column. NOTE: the stats
    // job runs EAGERLY at query-construction time (the masks must be
    // plan literals to stay codegen'd in the join filter) — the same
    // build-at-construction pattern as IVF training; plan-only callers
    // pay one signature scan.
    val masks = balancedBandMasks(sig, "sh", numBands)
    // band key = sh & mask (equal masked values ⟺ equal bits at the
    // band's positions — no compaction needed)
    val banded = sig.select(col("doc"), col("sh"),
      posexplode(array(masks.map(m =>
        col("sh").bitwiseAND(lit(m))): _*)).as(Seq("band", "bits")))
    // a pair matching on k bands comes out of the join k times; keep only
    // the row from the FIRST matching band (lowest band with no xor bit)
    // — a codegen'd per-row filter instead of a distinct() shuffle of the
    // duplicated candidates
    val xorc = col("a.sh").bitwiseXOR(col("b.sh"))
    val firstMatch = (numBands - 1 to 0 by -1)
      .foldLeft(lit(-1): Column) { (acc, i) =>
        when(xorc.bitwiseAND(lit(masks(i))) === 0L, lit(i)).otherwise(acc)
      }
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.doc") < col("b.doc"))
      .where(col("a.band") === firstMatch)
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        hammingDist(col("a.sh"), col("b.sh")).as("dist"))
      .where(col("dist") <= maxDist)
  }

  /** Fixed contiguous band masks: 64 bit positions split into `numBands`
    * runs (first `64 % numBands` bands one bit wider). Plan literals —
    * no stats pass — and fully replayable in the oracle's SQL.
    */
  private[graft] def contiguousBandMasks(numBands: Int): Seq[Long] = {
    val base = 64 / numBands
    val extra = 64 % numBands
    val sizes = Seq.tabulate(numBands)(i => base + (if (i < extra) 1 else 0))
    val starts = sizes.scanLeft(0)(_ + _)
    Seq.tabulate(numBands) { i =>
      (starts(i) until starts(i) + sizes(i))
        .foldLeft(0L)((m, b) => m | (1L << b))
    }
  }

  /** Frequency-capped SimHash near-dup pairs — the 100 TB twin of
    * [[simhashBandedPairs]], built like [[jaccardPairsCapped]]: a
    * (band, bits) bucket larger than `maxBucket` generates NOTHING (its
    * members still pair through their other, more selective bands), so
    * the in-bucket pair expansion is O(maxBucket²) per bucket at ANY
    * corpus size — the mega-bucket pair explosion the uncapped form
    * suffers on templated corpora (measured: 244M pairs at sf0.1×10,
    * BENCH_SCALE.json) cannot happen.
    *
    * The cap also unlocks a structural simplification: the uncapped
    * variant NEEDS entropy-balanced bands (a stats pass at plan-build
    * time) because one corpus-constant band puts every doc in a single
    * bucket; here that bucket is simply hot and skipped, so FIXED
    * contiguous bands work — no eager stats job, streaming-friendly,
    * and the whole pipeline (masks included) replays in the oracle.
    * Recall contract: a true pair is lost only if EVERY band it agrees
    * on is hot.
    *
    * Shape: one bounded-collect shuffle on (band, bits) — buckets cap at
    * `maxBucket` doc ids regardless of skew — in-bucket ordered
    * expansion, one bare-pair distinct shuffle, then hash-join
    * verification of the bounded survivor set against the signatures.
    */
  def simhashBandedPairsCapped(df: DataFrame, idCol: String,
      textCol: String, maxDist: Int, maxBucket: Int): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val numBands = maxDist + 1
    val masks = contiguousBandMasks(numBands)
    // NO spread (unlike the uncapped variant): the banded explode feeds
    // straight into the bounded-collect aggregate, and spreading the
    // signature build fragments that aggregate's map-side partials per
    // (band,bits) key (measured r17: dd6b 1.52× normalized while dd6 —
    // whose signatures feed a JOIN — improved 1.69×)
    val sig = tracked(
      df.select(col(idCol).as("doc"), simhash(col(textCol)).as("sh")))
    val banded = sig.select(col("doc"),
      posexplode(array(masks.map(m =>
        col("sh").bitwiseAND(lit(m))): _*)).as(Seq("band", "bits")))
    val cand = banded.groupBy(col("band"), col("bits"))
      .agg(graft.functions.BoundedCollect
        .boundedCollect(col("doc"), maxBucket).as("bc"))
      .where(col("bc.df").between(2, maxBucket))
      .select(explode(orderedPairs(col("bc.ds"))).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()
    cand
      .join(sig.select(col("doc").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sig.select(col("doc").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDist(col("sh_a"), col("sh_b")).as("dist"))
      .where(col("dist") <= maxDist)
  }

  // -------------------------------------------------- passage-level dedup

  /** Non-overlapping `w`-word passages of each document, with position:
    * (doc, pos, passage, passage_h). The corpus-level unit of the
    * C4/RefinedWeb-style "remove text duplicated across the corpus" pass —
    * coarser than a shingle (which detects similarity), finer than a
    * document (which misses partial duplication like shared boilerplate).
    * Map-side explode, no shuffle; the last passage may be short.
    * `passage_h` is the [[charHash]] polynomial (engine-reproducible, an
    * 8-byte group key at scale; the ~n²/2P collision odds merge both
    * sides of any comparison identically since every engine replays the
    * same fold).
    */
  private def passageExplode(df: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    require(w > 0, s"need w > 0, got $w")
    val toks = split(col(textCol), "\\s+")
    val nPass = expr(s"(size(__toks) + ${w - 1}) div $w")
    df.select(col(idCol).as("doc"), toks.as("__toks"))
      .where(size(col("__toks")) > 0)
      .select(col("doc"),
        posexplode(transform(sequence(lit(0), nPass - 1),
          i => array_join(slice(col("__toks"), i * w + 1, lit(w)), " ")))
          .as(Seq("pos", "passage")))
      .select(col("doc"), col("pos"), col("passage"),
        charHash(col("passage")).as("passage_h"))
  }

  /** Corpus-wide duplicated-passage inventory: every `w`-word passage
    * occurring ≥ 2 times, with its occurrence count, distinct-document
    * count, and canonical (minimum) document id. ONE shuffle, keyed on
    * the 8-byte passage hash — the profiling half of passage dedup (what
    * boilerplate dominates the corpus; candidate scrub list sizing).
    * Returns (passage_h, passage, n_occ, n_docs, canonical_id).
    */
  def passageStats(df: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame =
    passageExplode(df, idCol, textCol, w)
      .groupBy(col("passage_h"))
      .agg(min(col("passage")).as("passage"),
        count(lit(1)).as("n_occ"),
        countDistinct(col("doc")).as("n_docs"),
        min(col("doc")).as("canonical_id"))
      .where(col("n_occ") >= 2)

  /** Passage-level corpus scrub: drop from EVERY document the passages
    * whose corpus-wide occurrence count exceeds `maxOcc`, and reassemble
    * the survivors in order — the C4 "discard any three-sentence span
    * seen more than once" rule re-expressed over word windows. Hot
    * passages are detected with one groupBy on the 8-byte hash; the
    * verdict joins back onto the exploded frame (the hot side is the
    * small one — duplicated boilerplate is a sliver of a real corpus, so
    * AQE broadcasts it); per-document reassembly is one final groupBy.
    * Three shuffles total, none keyed on raw text. A document whose
    * every passage is hot survives with empty text (the caller decides
    * whether to drop empties — that's a filter, not this operator's
    * call). Returns (idCol, n_kept, n_scrubbed, text_clean).
    */
  def passageScrub(df: DataFrame, idCol: String, textCol: String,
      w: Int, maxOcc: Long): DataFrame = {
    val ex = tracked(passageExplode(df, idCol, textCol, w))
    val hot = ex.groupBy(col("passage_h"))
      .agg(count(lit(1)).as("n_occ"))
      .where(col("n_occ") > maxOcc)
      .select(col("passage_h"), lit(true).as("__hot"))
    ex.join(hot, Seq("passage_h"), "left")
      .groupBy(col("doc").as(idCol))
      .agg(
        count(when(col("__hot").isNull, 1)).as("n_kept"),
        count(when(col("__hot").isNotNull, 1)).as("n_scrubbed"),
        array_join(transform(
          array_sort(collect_list(when(col("__hot").isNull,
            struct(col("pos"), col("passage"))))),
          x => x.getField("passage")), " ").as("text_clean"))
  }
}

/** Persisted CDC chunk ledger — [[Dedup.cdcDedup]]'s build-once/
  * append-many form, on the mergeable-summary-table discipline: the
  * stored table holds PRE-AGGREGATED per-batch ledgers as append-only
  * catalog deltas (counts are associative — see
  * [[Dedup.mergeCdcLedgers]]), [[CdcLedger.load]] folds them on read,
  * and [[compact]] re-materializes when the delta count grows. New
  * corpus batches never re-chunk old documents; the corpus-sized text
  * is never rewritten.
  */
final case class CdcLedger(k: Int, modulus: Int, ledger: DataFrame) {

  def save(cat: graft.catalog.VersionedCatalog, name: String,
      lastBatchId: Long = -1L): Unit = {
    val spark = ledger.sparkSession
    import spark.implicits._
    cat.commit(Map(
      s"$name.ledger" -> ledger,
      s"$name.params" -> Seq((k, modulus, lastBatchId))
        .toDF("k", "modulus", "last_batch_id")))
    ()
  }

  /** In-memory incremental: chunk ONLY the batch (fresh doc ids — the
    * append contract) and fold it in; equals a full rebuild exactly.
    */
  def addDocs(batch: DataFrame, idCol: String,
      textCol: String): CdcLedger =
    copy(ledger = Dedup.mergeCdcLedgers(ledger.unionByName(
      Dedup.cdcDedup(batch, idCol, textCol, k, modulus))))

  /** Persisted incremental: append the batch's aggregated ledger as a
    * catalog delta (and, when `batchId` is given, advance the recorded
    * batch id in the SAME atomic commit — the exactly-once marker the
    * streaming maintenance loop replays against); the merged view folds
    * on read.
    */
  def appendDocs(cat: graft.catalog.VersionedCatalog, name: String,
      batch: DataFrame, idCol: String, textCol: String,
      batchId: Long = -1L): CdcLedger = {
    val spark = batch.sparkSession
    import spark.implicits._
    // a manual append (no batchId) must PRESERVE the stored replay
    // marker: rewriting it to -1 would let an already-applied streaming
    // micro-batch pass applyBatch's `batchId <= last_batch_id` guard and
    // double-count its chunks. Monotone max keeps both writers safe.
    // Only the EXPECTED absent-table case may default to -1; a params
    // table that exists but cannot be read must fail the append —
    // silently resetting the marker would re-open the double-apply
    // window this guard exists to close.
    val stored =
      if (cat.exists(s"$name.params"))
        cat.read(spark, s"$name.params").head().getAs[Long]("last_batch_id")
      else -1L
    cat.commitAll(Map(
      s"$name.ledger" -> graft.catalog.TableDelta(
        appends = Seq((Dedup.cdcDedup(batch, idCol, textCol, k, modulus),
          ""))),
      s"$name.params" -> graft.catalog.TableDelta(rewrite = Some(
        Seq((k, modulus, math.max(stored, batchId)))
          .toDF("k", "modulus", "last_batch_id")))))
    CdcLedger.load(spark, cat, name)
  }

  /** Fold the accumulated deltas back into one materialized ledger. */
  def compact(cat: graft.catalog.VersionedCatalog,
      name: String): CdcLedger = {
    cat.commit(Map(s"$name.ledger" -> ledger))
    CdcLedger.load(ledger.sparkSession, cat, name)
  }
}

object CdcLedger {

  def build(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, modulus: Int = 64): CdcLedger =
    CdcLedger(k, modulus, Dedup.cdcDedup(df, idCol, textCol, k, modulus))

  def load(spark: org.apache.spark.sql.SparkSession,
      cat: graft.catalog.VersionedCatalog, name: String): CdcLedger = {
    val p = cat.read(spark, s"$name.params").head()
    CdcLedger(p.getAs[Int]("k"), p.getAs[Int]("modulus"),
      Dedup.mergeCdcLedgers(cat.read(spark, s"$name.ledger")))
  }

  /** Exactly-once streaming maintenance — the CDC twin of
    * [[Dedup.maintainDupClusters]]: each micro-batch chunks ONLY its own
    * documents and lands as one atomic (ledger delta + batch-id marker)
    * commit; a redelivered batch id is a no-op, so crash/replay cannot
    * double-count a chunk.
    */
  def maintain(docs: DataFrame, idCol: String, textCol: String,
      cat: graft.catalog.VersionedCatalog, name: String, k: Int = 16,
      modulus: Int = 64)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        applyBatch(batch.toDF(), batchId, idCol, textCol, cat, name, k,
          modulus)
        ()
    }

  /** One maintenance step (the foreachBatch body, exposed for direct
    * testing): true when applied, false when skipped (replayed id or
    * empty batch).
    */
  def applyBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, cat: graft.catalog.VersionedCatalog, name: String,
      k: Int, modulus: Int): Boolean = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return false
    if (!cat.exists(s"$name.params")) {
      build(batch, idCol, textCol, k, modulus).save(cat, name, batchId)
      true
    } else {
      val p = cat.read(spark, s"$name.params").head()
      if (batchId <= p.getAs[Long]("last_batch_id")) false // replay
      else {
        load(spark, cat, name)
          .appendDocs(cat, name, batch, idCol, textCol, batchId)
        true
      }
    }
  }
}
