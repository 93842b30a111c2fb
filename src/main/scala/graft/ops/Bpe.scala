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
      keys: Seq[String] = Seq("w")): DataFrame = {
    val word = Window.partitionBy(keys.map(col): _*).orderBy("i")
    val matched = state
      .withColumn("nxt", lead(col("sym"), 1).over(word))
      .withColumn("mat",
        col("sym") === a && coalesce(col("nxt") === b, lit(false)))
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
