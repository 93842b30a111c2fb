package graft

import graft.ops.TextAnalysis

/** Repeated-span scrubbing and bigram surprisal: hand-computed oracles
  * pinning the edge cases the DuckDB gate can't isolate (all-boilerplate
  * docs, docs shorter than the span, coverage-window boundaries).
  */
class TextScrubSpec extends SparkSpec {
  import spark.implicits._

  test("scrubRepeatedSpans: covered tokens cut, doc rebuilt in order; " +
      "short and all-boilerplate docs still emit rows") {
    val docs = Seq(
      (1L, "a b c d e f"),  // every 3-gram shared with doc 4 (and 2)
      (2L, "z a b c d q"),  // interior overlap only: z and q survive
      (3L, "x y"),          // shorter than the span: untouched
      (4L, "a b c d e f"))  // exact dup of 1: scrubbed to empty
      .toDF("doc_id", "text")
    val out = TextAnalysis
      .scrubRepeatedSpans(docs, "doc_id", "text", n = 3, minDf = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.size == 4, "one row per input doc, scrubbed or not")
    // hot 3-grams: "a b c","b c d" (docs 1,2,4); "c d e","d e f" (1,4)
    assert(out(1L) == (("", 0L, 6L)))
    assert(out(4L) == (("", 0L, 6L)))
    // doc 2: starts at pos 1 ("a b c") and 2 ("b c d") are hot, so the
    // 3-wide coverage window cuts pos 1..4; z (pos 0, its own start
    // "z a b" is cold) and q (pos 5, no hot start within 2 back) survive
    assert(out(2L) == (("z q", 2L, 4L)))
    assert(out(3L) == (("x y", 2L, 0L)))
  }

  test("bigramSurprisal: integer bit-length conditional surprise, " +
      "context freq = rollup of bigram freq") {
    val docs = Seq(
      (1L, "a a a a"),   // bigrams (a,a) x3
      (2L, "a b a c"))   // bigrams (a,b), (b,a), (a,c)
      .toDF("doc_id", "text")
    // bfreq: (a,a)=3 (a,b)=1 (b,a)=1 (a,c)=1; cfreq: a=5, b=1
    // surp = bitlen(cfreq) - bitlen(bfreq):
    //   (a,a) -> 3-2=1; (a,b) -> 3-1=2; (b,a) -> 1-1=0; (a,c) -> 2
    val out = TextAnalysis.bigramSurprisal(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 3L, 1.0)))
    assert(out(2L) == ((3L, 4L, 4.0 / 3.0)))
    // a single-token doc has no bigrams and drops out
    val single = TextAnalysis.bigramSurprisal(
      Seq((9L, "solo")).toDF("doc_id", "text"), "doc_id", "text")
    assert(single.isEmpty)
  }

  test("mixtureSample: per-source budgets bind independently; " +
      "unnamed sources are excluded; per-source slice equals the " +
      "single-budget sampler") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 300L).map { id =>
      (id, s"src${id % 3}",
        Seq.fill(5 + rnd.nextInt(20))("w" + rnd.nextInt(50)).mkString(" "))
    }.toDF("doc_id", "source", "text")
    val out = TextAnalysis.mixtureSample(docs, "doc_id", "text", "source",
      Map("src0" -> 300L, "src1" -> 120L)).collect()
    assert(out.nonEmpty && out.forall(_.getString(1) != "src2"))
    val spent = out.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getInt(2).toLong).sum).toMap
    assert(spent("src0") <= 300L && spent("src1") <= 120L)
    // each source's slice is exactly what the single-budget sampler
    // takes at that source's budget — the mixture is per-source prefix
    // takes, nothing cross-source
    val solo = TextAnalysis.tokenBudgetSample(
      docs.where($"source" === "src1"), "doc_id", "text", "source", 120L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.filter(_.getString(1) == "src1")
      .map(_.getLong(0)).toSet == solo)
  }
}
