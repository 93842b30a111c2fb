package graft

import org.apache.spark.sql.functions._

import graft.ops.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge learning: hand-computed rounds on a run-heavy corpus " +
      "(greedy-left parity, lexicographic tie-break)") {
    val docs = Seq((1L, "oooo booo")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "doc_id", "text", nMerges = 2)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // round 1: (o,o) appears 3x in "oooo" + 2x in "booo" = 5 (overlaps
    // counted as adjacencies). Greedy-left: oooo -> [oo, oo],
    // booo -> [b, oo, o].
    // round 2: (oo,oo)=1, (b,oo)=1, (oo,o)=1 — tie at 1, (b,oo) wins
    // lexicographically.
    assert(merges == Seq((1, "o", "o", 5L), (2, "b", "oo", 1L)), merges)
    // segmentation under the frozen merges
    val segd = Bpe.segment(docs, "doc_id", "text",
        merges.map(m => (m._2, m._3)))
      .orderBy($"wpos", $"i").select($"wpos", $"sym")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(segd == Seq((1L, "oo"), (1L, "oo"), (2L, "boo"), (2L, "o")),
      segd)
  }

  test("training trajectory is exact: partition layout cannot change " +
      "which pair wins any round") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val a = Bpe.train(docs.repartition(7), "doc_id", "text", 4).collect()
    val b = Bpe.train(docs.coalesce(1), "doc_id", "text", 4).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 4 && a.map(_.getLong(3)).toSeq.sliding(2).forall {
      case Seq(x, y) => x >= y
      case _ => true
    }, "pair counts never increase across rounds on a shrinking table")
  }

  test("dictionary-cost tokenization == per-instance segmentation " +
      "counts (segmentation is a pure function of the word)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").limit(50)
    val merges = Bpe.train(docs, "doc_id", "text", 4)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val viaVocab = Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaInstances = Bpe.segment(docs, "doc_id", "text", merges)
      .groupBy($"doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaVocab == viaInstances && viaVocab.nonEmpty)
    // merging strictly reduces token counts vs raw characters
    val chars = docs.select($"doc_id",
        length(regexp_replace($"text", "\\s+", "")).cast("long").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaVocab.forall { case (id, n) => n < chars(id) },
      "4 merges must compress every doc below its character count")
  }

  test("early stop: a corpus with no adjacency learns nothing past " +
      "its single merges") {
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "doc_id", "text", nMerges = 5)
    // round 1 merges (a,b) or (c,d) lexicographically first; round 2 the
    // other; then no adjacent pairs remain anywhere — early stop
    assert(merges.count() == 2L)
  }
}
