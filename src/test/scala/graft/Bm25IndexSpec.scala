package graft

import org.apache.spark.sql.functions._

import graft.catalog.VersionedCatalog
import graft.ops.{Bm25Index, TextAnalysis}

class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sf)
    .select($"doc_id", $"text")

  test("index probe == corpus-scan bm25TopK, bit for bit") {
    val idx = Bm25Index.build(docs, "doc_id", "text")
    val probe = idx.probe(Seq("dup", "vector", "spark"), k = 25)
    val scan = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      Seq("dup", "vector", "spark"), k = 25)
    assert(probe.collect().toSeq == scan.collect().toSeq,
      "the index materializes the same (term, doc, tf) relation")
  }

  test("persist/reopen: probe reads only the queried terms' posting " +
      "lists (term predicate pushed to the scan)") {
    val root = tmpDir("bm25")
    Bm25Index.build(docs, "doc_id", "text")
      .save(new VersionedCatalog(root), "bm25_idx", spark)
    val idx = Bm25Index.load(spark, new VersionedCatalog(root), "bm25_idx")
    val fresh = Bm25Index.build(docs, "doc_id", "text")
      .probe(Seq("the", "of"), k = 10)
    val loaded = idx.probe(Seq("the", "of"), k = 10)
    assert(loaded.collect().toSeq == fresh.collect().toSeq)
    // the inverted-file property, columnar form: the term IN (...)
    // predicate reaches the postings parquet scan
    val plan = loaded.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"term predicate must prune the postings scan:\n${plan.take(2000)}")
  }

  test("phrase search: exact positional matches, overlapping " +
      "occurrences counted, persists and reloads") {
    import graft.ops.PositionalIndex
    val corpus = Seq(
      (1L, "the cat sat on the cat mat"),
      (2L, "a a a b a a"),
      (3L, "cat the")).toDF("doc_id", "text")
    val idx = PositionalIndex.build(corpus, "doc_id", "text")
    // "the cat" occurs twice in doc 1, never in doc 3 (reversed)
    val tc = idx.phraseCount(Seq("the", "cat")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tc == Map(1L -> 2L), tc)
    // overlap: "a a" in "a a a ... a a" = positions 1,2 and 5 -> 3
    val aa = idx.phraseCount(Seq("a", "a")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aa == Map(2L -> 3L), aa)
    // 3-word phrase
    val aab = idx.phraseCount(Seq("a", "a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aab == Map(2L -> 1L), aab)
    // persist/reopen parity
    val root = tmpDir("pos")
    idx.save(new VersionedCatalog(root), "pos_idx")
    val loaded = PositionalIndex.load(spark,
      new VersionedCatalog(root), "pos_idx")
    assert(loaded.phraseCount(Seq("the", "cat")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == tc)
  }

  test("incremental addDocs == full rebuild (idf drift included); " +
      "re-ingesting an indexed id fails fast") {
    val half1 = docs.where($"doc_id" % 2 === 0)
    val half2 = docs.where($"doc_id" % 2 =!= 0)
    val grown = Bm25Index.build(half1, "doc_id", "text")
      .addDocs(half2, "doc_id", "text")
    val full = Bm25Index.build(docs, "doc_id", "text")
    assert(grown.nd == full.nd && grown.tt == full.tt)
    val q = Seq("dup", "vector", "spark")
    assert(grown.probe(q, 25).collect().toSeq ==
      full.probe(q, 25).collect().toSeq,
      "append + stats bump must equal the one-shot build")
    val e = intercept[IllegalArgumentException] {
      grown.addDocs(half1.limit(1), "doc_id", "text")
    }
    assert(e.getMessage.contains("already indexed"))
  }
}
