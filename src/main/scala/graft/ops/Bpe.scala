package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge

/** Distributed BPE merge learning (Sennrich, Haddow & Birch, "Neural
  * machine translation of rare words with subword units", ACL 2016 —
  * the byte-pair-encoding vocabulary trainer behind GPT-2-family
  * tokenizers), expressed as pure DataFrame rounds: the corpus becomes
  * one exploded symbol table (doc, word, position, symbol), and each
  * round is (1) one distributed pair-count aggregate + a 1-row argmax —
  * the most frequent ADJACENT symbol pair, ties broken lexicographically
  * — and (2) a map-of-windows application pass that merges every
  * greedy-left occurrence of that pair. Only the k-row merge table ever
  * reaches the driver.
  *
  * Greedy-left run semantics (the corner every shortcut gets wrong):
  * for a self-pair merge like (o,o) over "oooo", occurrences overlap and
  * BPE consumes left to right — merge at 1, skip 2, merge at 3. That is
  * run parity, so application is windowed set logic, no per-row fold:
  * match positions island into runs (gaps-and-islands, the st3 shape),
  * a match STARTS a merge iff its offset from its island head is even,
  * and the following row is consumed. For a ≠ b matches can't overlap
  * and every island is a singleton — the same expression handles both.
  *
  * Every step is exact integer/string arithmetic over binary-collated
  * strings, so the whole TRAINING TRAJECTORY — which pair wins each
  * round included — replays bit-for-bit in the SQL oracle (ts25), the
  * qualityModel discipline applied to tokenizer training. Plan depth
  * stays O(1) per round via [[PlanBridge]] truncation (the Dedup
  * iterative-loop convention).
  *
  * Scale note: training runs on the WEIGHTED VOCABULARY (one symbol row
  * per distinct word, carrying its corpus frequency — pair counts are
  * identical to instance counts since adjacency is within words), so
  * the corpus is scanned ONCE to build the frequency table and the k
  * rounds re-window only dictionary-sized data; [[segment]] then
  * applies the frozen merges to instances anywhere.
  */
object Bpe {

  private val wWord = Window.partitionBy("doc_id", "wpos").orderBy("i")
  private val wVocab = Window.partitionBy("w").orderBy("i")

  /** The exploded char-symbol table (doc_id, wpos, i, sym), 1-based
    * positions, empty words dropped — the per-INSTANCE view
    * ([[segment]] uses it; training uses the weighted vocabulary form).
    */
  def symbols(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("wp", "w")))
      .where(length(col("w")) > 0)
      .select(col("doc_id"), (col("wp") + 1).cast("long").as("wpos"),
        posexplode(expr("regexp_extract_all(w, '.', 0)")).as(Seq("j", "sym")))
      .select(col("doc_id"), col("wpos"),
        (col("j") + 1).cast("long").as("i"), col("sym"))

  /** The weighted vocabulary symbol table (w, freq, i, sym): one symbol
    * row per DISTINCT word, carrying the word's corpus frequency — the
    * form Sennrich's reference trainer uses. Pair counts weighted by
    * freq are IDENTICAL to instance-level counts (adjacency is within
    * words), while table size drops from total corpus characters to
    * vocabulary characters — the difference between re-windowing 100 TB
    * of text per round and re-windowing a dictionary.
    */
  def vocabSymbols(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"),
        posexplode(expr("regexp_extract_all(w, '.', 0)")).as(Seq("j", "sym")))
      .select(col("w"), col("freq"),
        (col("j") + 1).cast("long").as("i"), col("sym"))

  /** Most frequent adjacent pair over the weighted vocabulary (summed
    * instance count desc, then (a, b) lexicographic), or None when no
    * adjacency remains.
    */
  def topPair(state: DataFrame): Option[(String, String, Long)] =
    state
      .select(col("freq"), col("sym"),
        lead(col("sym"), 1).over(wVocab).as("nxt"))
      .where(col("nxt").isNotNull)
      .groupBy(col("sym"), col("nxt")).agg(sum(col("freq")).as("c"))
      .orderBy(col("c").desc, col("sym"), col("nxt")).limit(1)
      .collect().headOption
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

  /** One greedy-left application of merge (a, b) over a symbol table.
    * `keys` names the word-identity columns: ("w") for the vocabulary
    * form, ("doc_id", "wpos") for the instance form.
    */
  def applyMerge(state: DataFrame, a: String, b: String,
      keys: Seq[String] = Seq("w")): DataFrame =
    applyMerges(state, Seq((a, b)), keys)

  /** One pass applying a BATCH of pairwise symbol-DISJOINT merges — the
    * superstep primitive of [[trainBatched]]. Disjointness makes the
    * single-merge machinery carry over verbatim: a position matches at
    * most one pair (its symbol belongs to one pair only), matches of
    * DIFFERENT pairs are never adjacent (adjacent matches share the
    * middle symbol, so they'd be the same pair), hence every
    * greedy-left island is single-pair and the even-offset run-parity
    * rule applies unchanged. A 1-element batch IS [[applyMerge]],
    * expression for expression.
    */
  def applyMerges(state: DataFrame, pairs: Seq[(String, String)],
      keys: Seq[String] = Seq("w")): DataFrame = {
    require(pairs.nonEmpty, "empty merge batch")
    // disjointness is ACROSS pairs — a self-pair (a,a) alone is legal
    val sets = pairs.map { case (a, b) => Set(a, b) }
    require(sets.indices.forall(i => (i + 1 until sets.size).forall(j =>
      (sets(i) & sets(j)).isEmpty)),
      s"merge batch must be pairwise symbol-disjoint, got $pairs")
    val word = Window.partitionBy(keys.map(col): _*).orderBy("i")
    val matched = state
      .withColumn("nxt", lead(col("sym"), 1).over(word))
      .withColumn("mat",
        pairs.map { case (a, b) =>
          col("sym") === a && coalesce(col("nxt") === b, lit(false))
        }.reduce(_ || _))
    // islands of consecutive match positions; merge starts at even
    // offsets from the island head (greedy-left run parity)
    val isl = matched.withColumn("isl",
      when(col("mat"), col("i") - row_number().over(
        Window.partitionBy((keys.map(col) :+ col("mat")): _*).orderBy("i"))))
    val started = isl.withColumn("strt",
      col("mat") && (col("i") - min(col("i")).over(
        Window.partitionBy((keys.map(col) :+ col("isl")): _*))) % 2 === 0)
    val carry = state.columns.filterNot(c => c == "i" || c == "sym")
    started
      .withColumn("consumed",
        coalesce(lag(col("strt"), 1).over(word), lit(false)))
      .where(!col("consumed"))
      .select(carry.map(col) ++ Seq(
        row_number().over(word).cast("long").as("i"),
        when(col("strt"), concat(col("sym"), col("nxt")))
          .otherwise(col("sym")).as("sym")): _*)
  }

  /** The first `fetch` pair-count candidates in the SEQUENTIAL pick
    * order (summed instance count desc, then (a, b) lexicographic), plus
    * whether the candidate list was fetched COMPLETELY (fetch+1 rows
    * requested; ≤ fetch returned ⇒ nothing was cut off).
    */
  def topPairs(state: DataFrame,
      fetch: Int): (Seq[(String, String, Long)], Boolean) = {
    val rows = state
      .select(col("freq"), col("sym"),
        lead(col("sym"), 1).over(wVocab).as("nxt"))
      .where(col("nxt").isNotNull)
      .groupBy(col("sym"), col("nxt")).agg(sum(col("freq")).as("c"))
      .orderBy(col("c").desc, col("sym"), col("nxt")).limit(fetch + 1)
      .collect()
    (rows.take(fetch).toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))),
      rows.length <= fetch)
  }

  /** Select the longest candidate PREFIX that sequential BPE would
    * provably pick in exactly this order — the batching rule of
    * [[trainBatched]], pure driver-side logic over the fetched
    * candidate list.
    *
    * Rule: walk candidates in the sequential pick order, accepting while
    * each is symbol-disjoint from everything accepted; STOP at the
    * first interacting candidate (never skip past it), then truncate
    * the accepted prefix to counts STRICTLY above the stop count (or
    * above the last fetched count when the list was cut off). Why this
    * equals sequential, by induction over the batch: (1) disjoint pairs'
    * counts are invariant under each other's application (an occurrence
    * of (c,d) is untouched by merging (a,b) with {a,b}∩{c,d}=∅ — the
    * merged symbol replaces "a b" and c,d are neither); (2) every pair
    * a batch member's application AFFECTS (count decrease) or CREATES
    * shares a symbol with it, so it sits at or beyond the stop position,
    * and a created pair's count is bounded by an affected pair's old
    * count (each "x ab" context was an "x a" adjacency) — both are ≤ the
    * stop count, STRICTLY below every surviving batch member; hence
    * after applying members 1..i−1, member i is still the unique
    * (count, lexicographic) argmax, which is what sequential picks. A
    * truncation to nothing degrades to the top-1 candidate — plain
    * sequential, always correct.
    */
  def selectBatch(cands: Seq[(String, String, Long)],
      complete: Boolean): Seq[(String, String, Long)] = {
    if (cands.isEmpty) return Nil
    val used = scala.collection.mutable.Set[String]()
    val acc = Seq.newBuilder[(String, String, Long)]
    var accN = 0
    var stopCount = if (complete) Long.MinValue else cands.last._3
    var stopped = false
    val it = cands.iterator
    while (it.hasNext && !stopped) {
      val c @ (a, b, n) = it.next()
      if (used.contains(a) || used.contains(b)) {
        stopped = true
        stopCount = n
      } else {
        acc += c; accN += 1
        used += a; used += b
      }
    }
    val batch = acc.result().takeWhile(_._3 > stopCount)
    if (batch.nonEmpty) batch else cands.take(1)
  }

  /** Learn `nMerges` merges; returns (rank, left, right, pair_count) —
    * the merge table a tokenizer ships. Stops early when no adjacent
    * pairs remain.
    */
  def train(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    var state =
      PlanBridge.truncated(vocabSymbols(docs, idCol, textCol)).persist()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var prev: Option[DataFrame] = None
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      // this round's argmax is also what materializes this round's
      // cached state — only THEN is the parent's cache safe to drop
      // (truncated leaves recompute through plain RDD lineage, but
      // recomputing k chained rounds would defeat the cache)
      val tp = topPair(state)
      prev.foreach(_.unpersist()); prev = None
      tp match {
        case Some((a, b, c)) =>
          merges += ((rank, a, b, c))
          val next = PlanBridge.truncated(applyMerge(state, a, b)).persist()
          prev = Some(state)
          state = next
          rank += 1
        case None => done = true
      }
    }
    state.unpersist()
    prev.foreach(_.unpersist())
    import spark.implicits._
    // lhs/rhs, not left/right: both engines parse them unquoted
    merges.result().toDF("rank", "lhs", "rhs", "pair_count")
      .select(col("rank").cast("int"), col("lhs"), col("rhs"),
        col("pair_count"))
  }

  /** [[train]] in SUPERSTEPS: each round fetches one candidate list,
    * [[selectBatch]] proves a disjoint prefix equal to the sequential
    * pick sequence, and [[applyMerges]] lands the whole prefix in one
    * windowed pass. The merge table is EXACTLY [[train]]'s, rank for
    * rank and count for count (BpeSpec pins the equality on the fixture
    * corpus); `fetch` bounds the candidate list a superstep collects
    * (driver cost, ~fetch rows). Returns (merge table, supersteps
    * executed; always ≤ nMerges — never worse than [[train]]).
    *
    * Honesty note on the batch width: provably-sequential batches are
    * limited by top-of-list interaction, and on CHAR-level natural text
    * the early top pairs chain-share letters ((t,h) blocks (h,e)), so
    * early batches are ~1 (measured: 57 supersteps for the first 64
    * fixture merges) and only widen once symbols grow. The production
    * answer to the job-per-merge wall is [[trainLocal]] — exact
    * sequential training over the bounded weighted vocabulary in ONE
    * job, the reference-trainer shape; trainBatched remains the
    * fallback when the vocabulary itself exceeds any driver budget.
    */
  def trainBatchedStats(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int, fetch: Int = 256): (DataFrame, Int) = {
    val spark = docs.sparkSession
    var state =
      PlanBridge.truncated(vocabSymbols(docs, idCol, textCol)).persist()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var prev: Option[DataFrame] = None
    var rank = 1
    var supersteps = 0
    var done = false
    while (rank <= nMerges && !done) {
      val (cands, complete) = topPairs(state, fetch)
      supersteps += 1
      prev.foreach(_.unpersist()); prev = None
      if (cands.isEmpty) done = true
      else {
        val batch = selectBatch(cands, complete).take(nMerges - rank + 1)
        batch.foreach { case (a, b, c) =>
          merges += ((rank, a, b, c)); rank += 1
        }
        val next = PlanBridge.truncated(
          applyMerges(state, batch.map { case (a, b, _) => (a, b) }))
          .persist()
        prev = Some(state)
        state = next
      }
    }
    state.unpersist()
    prev.foreach(_.unpersist())
    import spark.implicits._
    (merges.result().toDF("rank", "lhs", "rhs", "pair_count")
      .select(col("rank").cast("int"), col("lhs"), col("rhs"),
        col("pair_count")), supersteps)
  }

  /** [[trainBatchedStats]] without the superstep count — a drop-in for
    * [[train]] call sites.
    */
  def trainBatched(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int, fetch: Int = 256): DataFrame =
    trainBatchedStats(docs, idCol, textCol, nMerges, fetch)._1

  /** Unsigned UTF-8 byte order — Spark's BinaryType/UTF8String and
    * DuckDB's default collation, so the driver-side tie-break below is
    * bit-compatible with [[topPair]]'s `orderBy(sym, nxt)`.
    */
  private def utf8Less(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < a.length && i < b.length) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    a.length < b.length
  }

  /** Single code-point symbols of a word — the driver twin of
    * `regexp_extract_all(w, '.', 0)` (Java regex '.' and DuckDB both
    * match per code point).
    */
  private def codePointSyms(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Greedy-left merge of (a, b) in one word — run parity by scan: a
    * merged position consumes its right neighbor and the scan resumes
    * after it. Returns the input array unchanged (same reference) when
    * the pair never occurs.
    */
  private def mergeWord(syms: Array[String], a: String,
      b: String): Array[String] = {
    var touched = false
    var j = 0
    while (!touched && j < syms.length - 1) {
      touched = syms(j) == a && syms(j + 1) == b
      j += 1
    }
    if (!touched) syms
    else {
      val out = Array.newBuilder[String]
      j = 0
      while (j < syms.length) {
        if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
          out += a + b; j += 2
        } else {
          out += syms(j); j += 1
        }
      }
      out.result()
    }
  }

  /** "x sorts strictly before y" in the merge PICK order: weighted count
    * desc, then lhs, then rhs in unsigned UTF-8 byte order — exactly
    * [[topPair]]'s `orderBy(c desc, sym, nxt)`.
    */
  private def pickLess(xa: String, xb: String, xc: Long,
      ya: String, yb: String, yc: Long): Boolean =
    xc > yc || (xc == yc && (utf8Less(xa, ya) ||
      (xa == ya && utf8Less(xb, yb))))

  /** The one distributed job both local trainers share: tokenize, count
    * word frequencies, TakeOrdered the top `vocabLimit` words (freq
    * desc, word asc — never a full sort), split to code-point symbols.
    */
  private def collectVocab(docs: DataFrame, textCol: String,
      vocabLimit: Int): Array[(Array[String], Long)] = docs
    .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
    .where(length(col("w")) > 0)
    .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    .orderBy(col("freq").desc, col("w")).limit(vocabLimit)
    .collect()
    .map(r => (codePointSyms(r.getString(0)), r.getLong(1)))

  /** EXACT sequential BPE over the BOUNDED weighted vocabulary, trained
    * driver-side — the production trainer shape every reference BPE
    * implementation uses (Sennrich's script, SentencePiece, the HF
    * trainers all collect word frequencies, then train in memory):
    * ONE distributed corpus scan builds the (word, freq) table, the top
    * `vocabLimit` words by (freq desc, word asc — a TakeOrdered, never a
    * full sort) come to the driver, and all `nMerges` rounds run as
    * plain loops over dictionary-sized structures. Total Spark jobs:
    * ONE, independent of merge count — [[train]]'s job-per-merge loop
    * (the round-12 verdict's scale wall) and [[trainBatched]]'s
    * supersteps both disappear.
    *
    * The driver loop is INCREMENTAL (the Sennrich / SentencePiece
    * trick): pair counts and a pair → containing-words occurrence index
    * are built once, each round's winner comes from a lazy-deletion
    * max-heap (an entry is live iff its count equals the pair's current
    * count — every count change pushes a fresh entry, so the current
    * state is always present), and applying a merge touches ONLY the
    * words the occurrence index lists for the winning pair: each
    * touched word's old adjacencies are subtracted, the merge applied,
    * the new adjacencies added, and the modified pairs re-pushed. Per
    * merge that is O(touched-word characters + log-heap), not O(vocab
    * characters) — the full-recount loop this replaces
    * ([[trainLocalReference]], kept as the spec's equality reference)
    * spent ~2×10¹¹ hash updates at the 32k-merge × 2^20-word production
    * point; BpeSpec pins trajectory equality at 4096 merges and the
    * BenchScale bpe_local_4k case records the measured driver time.
    *
    * Equality: with `vocabLimit` covering every distinct word this is
    * [[train]] EXACTLY — same weighted pair counts, same greedy-left
    * application, same (count desc, UTF-8-lexicographic) pick — BpeSpec
    * pins the trajectory equality on the fixture corpus. With a
    * truncated vocabulary it is the standard frequency-floor
    * approximation those reference trainers ship (min_frequency /
    * vocab caps): deterministic, but counts exclude the tail.
    *
    * Driver budget: `vocabLimit` words × average word bytes — ~100 MB at
    * the default 2^20 words; Heaps' law keeps real vocabularies there
    * even at 100 TB corpus scale (the corpus-sized work — tokenize,
    * count — stays distributed).
    */
  /** Driver-loop wall of this thread's LAST [[trainLocal]] call, in
    * nanoseconds — a bench seam (BenchScale reports the incremental loop
    * separately from the distributed vocab job), not an API contract.
    * ThreadLocal so concurrent trainers (parallel test suites) can't race
    * the bench's read with another call's timing.
    */
  private val trainLocalLoopNanos: ThreadLocal[java.lang.Long] =
    ThreadLocal.withInitial(() => java.lang.Long.valueOf(0L))
  private[graft] def lastTrainLocalLoopNanos: Long =
    trainLocalLoopNanos.get()

  def trainLocal(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int, vocabLimit: Int = 1 << 20): DataFrame = {
    val spark = docs.sparkSession
    val vocab = collectVocab(docs, textCol, vocabLimit)
    val tLoop0 = System.nanoTime()
    val words: Array[Array[String]] = vocab.map(_._1)
    val freqs: Array[Long] = vocab.map(_._2)
    import scala.collection.mutable
    val counts = new mutable.HashMap[(String, String), Long]
    val occs = new mutable.HashMap[(String, String), mutable.Set[Int]]
    // heap of (lhs, rhs, count-at-push); live iff count matches current
    val heap = new java.util.PriorityQueue[(String, String, Long)](
      math.max(16, words.length),
      (x: (String, String, Long), y: (String, String, Long)) =>
        if (x == y) 0
        else if (pickLess(x._1, x._2, x._3, y._1, y._2, y._3)) -1 else 1)
    var i = 0
    while (i < words.length) {
      val syms = words(i)
      var j = 0
      while (j < syms.length - 1) {
        val key = (syms(j), syms(j + 1))
        counts.update(key, counts.getOrElse(key, 0L) + freqs(i))
        occs.getOrElseUpdate(key, mutable.Set.empty[Int]) += i
        j += 1
      }
      i += 1
    }
    counts.foreach { case (p, c) => heap.add((p._1, p._2, c)) }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      // pop to the first LIVE entry (stale counts discard; a pair whose
      // count reverted to an old pushed value is live under that value,
      // which is exactly its current state)
      var top: (String, String, Long) = null
      while (top == null && !heap.isEmpty) {
        val e = heap.poll()
        if (counts.getOrElse((e._1, e._2), -1L) == e._3) top = e
      }
      if (top == null) done = true
      else {
        val (a, b, c) = top
        merges += ((rank, a, b, c))
        val touched = occs.getOrElse((a, b), mutable.Set.empty[Int]).toArray
        val modified = mutable.Set[(String, String)]()
        touched.foreach { w =>
          val old = words(w)
          val next = mergeWord(old, a, b)
          // the occurrence index listed w, so the pair occurs in it
          var j = 0
          while (j < old.length - 1) {
            val p = (old(j), old(j + 1))
            val nc = counts(p) - freqs(w)
            if (nc == 0L) counts.remove(p) else counts(p) = nc
            modified += p
            j += 1
          }
          words(w) = next
          val newPairs = mutable.Set[(String, String)]()
          j = 0
          while (j < next.length - 1) {
            val p = (next(j), next(j + 1))
            counts.update(p, counts.getOrElse(p, 0L) + freqs(w))
            newPairs += p
            modified += p
            j += 1
          }
          // index maintenance: w leaves pairs its new form lost, joins
          // the ones it gained
          j = 0
          while (j < old.length - 1) {
            val p = (old(j), old(j + 1))
            if (!newPairs.contains(p)) occs.get(p).foreach { s =>
              s -= w
              if (s.isEmpty) occs.remove(p)
            }
            j += 1
          }
          newPairs.foreach(p =>
            occs.getOrElseUpdate(p, mutable.Set.empty[Int]) += w)
        }
        modified.foreach(p =>
          counts.get(p).foreach(nc => heap.add((p._1, p._2, nc))))
        rank += 1
      }
    }
    trainLocalLoopNanos.set(System.nanoTime() - tLoop0)
    import spark.implicits._
    merges.result().toDF("rank", "lhs", "rhs", "pair_count")
      .select(col("rank").cast("int"), col("lhs"), col("rhs"),
        col("pair_count"))
  }

  /** The full-recount reference loop [[trainLocal]] replaced — every
    * round rebuilds the complete pair-count table over ALL vocab words
    * and rescans every word on apply (O(vocab characters) per merge).
    * Kept package-private as BpeSpec's independent equality reference
    * for the incremental trainer; never a production call site.
    */
  private[graft] def trainLocalReference(docs: DataFrame, idCol: String,
      textCol: String, nMerges: Int, vocabLimit: Int = 1 << 20): DataFrame = {
    val spark = docs.sparkSession
    val vocab = collectVocab(docs, textCol, vocabLimit)
    val words: Array[Array[String]] = vocab.map(_._1)
    val freqs: Array[Long] = vocab.map(_._2)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val counts =
        new scala.collection.mutable.HashMap[(String, String), Long]
      var i = 0
      while (i < words.length) {
        val syms = words(i)
        var j = 0
        while (j < syms.length - 1) {
          val key = (syms(j), syms(j + 1))
          counts.update(key, counts.getOrElse(key, 0L) + freqs(i))
          j += 1
        }
        i += 1
      }
      if (counts.isEmpty) done = true
      else {
        var best: ((String, String), Long) = null
        counts.foreach { e =>
          if (best == null || pickLess(e._1._1, e._1._2, e._2,
            best._1._1, best._1._2, best._2))
            best = e
        }
        val ((a, b), c) = best
        merges += ((rank, a, b, c))
        i = 0
        while (i < words.length) {
          words(i) = mergeWord(words(i), a, b)
          i += 1
        }
        rank += 1
      }
    }
    import spark.implicits._
    merges.result().toDF("rank", "lhs", "rhs", "pair_count")
      .select(col("rank").cast("int"), col("lhs"), col("rhs"),
        col("pair_count"))
  }

  /** Segment the corpus under a FROZEN merge table (apply merges in rank
    * order) — the "tokenize anywhere with the trained vocab" half.
    * Returns the final symbol table; map-of-windows per merge.
    */
  def segment(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(symbols(docs, idCol, textCol)) {
      case (st, (a, b)) => applyMerge(st, a, b, Seq("doc_id", "wpos"))
    }

  /** Per-document token counts under a FROZEN merge table, applied at
    * DICTIONARY cost: the distinct-word vocabulary is segmented once
    * (the merge windows run over dictionary-sized data), each word's
    * piece count is joined back to the word instances, and per-doc
    * counts are one sum — so tokenizing N TB of text costs one word
    * explode + one vocabulary equi-join, never per-instance windows.
    * (Per-doc piece count == the instance-level segmentation's count:
    * segmentation is a pure function of the word.)
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val vocabSeg = merges.foldLeft(vocabSymbols(docs, idCol, textCol)) {
        case (st, (a, b)) => applyMerge(st, a, b, Seq("w"))
      }
      .groupBy(col("w")).agg(count(lit(1)).as("n_pieces"))
    docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .join(vocabSeg, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_pieces")).as("n_bpe"))
  }
}
