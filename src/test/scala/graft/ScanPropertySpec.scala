package graft

import scala.util.Random

/** Randomized parity for the two scan primitives added in round 10 —
  * the Aho–Corasick automaton and the content-defined chunker — against
  * plain reference implementations, covering the corner geometry
  * (overlapping matches, patterns nested in patterns, boundary grams at
  * text edges, edits near chunk cuts) a hand fixture can miss. Fixed
  * seed: reproducible.
  */
class ScanPropertySpec extends SparkSpec {

  /** Naive all-ends matcher: for every pattern, count every position
    * where it occurs (overlaps included).
    */
  private def refCounts(text: String, pats: Seq[String]): Seq[Long] =
    pats.map { p =>
      (0 to text.length - p.length)
        .count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }

  /** Naive cover-mask scrub. */
  private def refScrub(text: String, pats: Seq[String]): String = {
    val covered = new Array[Boolean](text.length)
    pats.foreach { p =>
      (0 to text.length - p.length).foreach { i =>
        if (text.regionMatches(i, p, 0, p.length))
          (i until i + p.length).foreach(covered(_) = true)
      }
    }
    text.zipWithIndex.collect { case (c, i) if !covered(i) => c }.mkString
  }

  test("round-10 ops hold their shuffle posture at sf0.01 x10: SQ8 " +
      "shuffles only the dims sketch, CDC only chunk hashes, the " +
      "blocklist scan nothing at all") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val tally = new java.util.concurrent.atomic.AtomicLong
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) tally.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        ()
      }
    }
    def shuffled(body: => Unit): Long = {
      spark.sparkContext.addSparkListener(l)
      tally.set(0L)
      try {
        body
        var waited = 0
        var last = -1L
        while (waited < 10000 && tally.get() != last) {
          last = tally.get(); Thread.sleep(200L); waited += 200
        }
      } finally spark.sparkContext.removeSparkListener(l)
      tally.get()
    }
    val docs = graft.ops.ScaleStress.inflateDocs(
      Tables.documents(spark, "/root/testdata/sf0.01"), 10)
    val nDocs = Tables.documents(spark, "/root/testdata/sf0.01").count() * 10
    val emb = graft.ops.ScaleStress.inflateEmbeddings(
      Tables.embeddings(spark, "/root/testdata/sf0.01"), 10)
    val q = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .where(org.apache.spark.sql.functions.col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    // SQ8: the training min/max is the ONLY aggregation — dims rows of
    // partials; the probe is a pure scan into TakeOrdered
    val sqRecs = shuffled {
      assert(graft.ops.SqIndex.build(emb, "vec_id", "embedding", 64)
        .probe(q, 30).count() == 30L)
    }
    assert(sqRecs <= 64L * 40,
      s"SQ8 shuffled $sqRecs records — the sketch should be dims-sized")
    // CDC: chunk text hashed away map-side; both exchanges carry hash
    // rows — a bounded number per doc
    var ledger = 0L
    val cdcRecs = shuffled {
      ledger = graft.ops.Dedup.cdcDedup(docs, "doc_id", "text").count()
    }
    assert(ledger > 0)
    assert(cdcRecs <= nDocs * 40,
      s"CDC shuffled $cdcRecs records for $nDocs docs — superlinear")
    // blocklist: map-only scan — the single forced-eval agg record is
    // all that ever moves
    val blRecs = shuffled {
      graft.ops.TextAnalysis.blocklistStats(docs, "doc_id", "text",
        Seq("table", "spark row")).write.format("noop").mode("overwrite")
        .save()
    }
    assert(blRecs == 0L, s"blocklist scan shuffled $blRecs records")
  }

  test("AcAutomaton == naive matcher on 300 random (text, patterns) " +
      "draws over a tiny alphabet (dense overlap regime)") {
    val rnd = new Random(20260814L)
    (1 to 300).foreach { trial =>
      val text = (1 to 1 + rnd.nextInt(60))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val nPats = 1 + rnd.nextInt(5)
      val pats = (1 to nPats).map { _ =>
        (1 to 1 + rnd.nextInt(4))
          .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.distinct
      val ac = new graft.functions.AcAutomaton(pats.toArray)
      assert(ac.countHits(text).toSeq == refCounts(text, pats),
        s"trial $trial text='$text' pats=$pats")
      assert(ac.scrub(text) == refScrub(text, pats),
        s"trial $trial scrub text='$text' pats=$pats")
    }
  }

  test("cdcChunksClamped on 200 random texts: bounds respected, " +
      "concatenation holds, loose clamps equal the stateless form") {
    val rnd = new Random(20260814L)
    val (k, m, lo, hi) = (8, 16, 12, 48)
    (1 to 200).foreach { trial =>
      val text = (1 to 20 + rnd.nextInt(400))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val chunks =
        graft.functions.TextHashing.cdcChunksClamped(text, k, m, lo, hi)
      assert(chunks.mkString == text, s"trial $trial concatenation")
      // every chunk but the trailing remainder is in [lo, hi]; the
      // remainder only bounded above
      chunks.dropRight(1).foreach(c => assert(
        c.length >= lo && c.length <= hi, s"trial $trial len ${c.length}"))
      assert(chunks.last.length <= hi, s"trial $trial tail")
      // loose clamps degenerate to the stateless form exactly
      val loose = graft.functions.TextHashing.cdcChunksClamped(
        text, k, m, 1, Int.MaxValue)
      assert(loose.toSeq ==
        graft.functions.TextHashing.cdcChunks(text, k, m).toSeq,
        s"trial $trial loose != stateless")
    }
    assert(graft.functions.TextHashing
      .cdcChunksClamped("", k, m, lo, hi).isEmpty)
  }

  test("cdcChunks on 200 random texts: chunks concatenate back, every " +
      "cut is a true boundary gram, and a mid-text edit only re-chunks " +
      "its neighborhood") {
    val rnd = new Random(20260814L)
    val k = 8
    val m = 16
    (1 to 200).foreach { trial =>
      val text = (1 to 50 + rnd.nextInt(300))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val chunks = graft.functions.TextHashing.cdcChunks(text, k, m)
      assert(chunks.mkString == text, s"trial $trial concatenation")
      // every internal cut ends a gram whose hash divides the modulus
      var pos = 0
      chunks.dropRight(1).foreach { c =>
        pos += c.length
        val gram = text.substring(pos - k, pos)
        assert(graft.functions.TextHashing.charHash(gram) % m == 0
          // charHash skips newlines, gramHashes doesn't — the random
          // alphabet here has none, so the two folds agree
          , s"trial $trial cut at $pos not a boundary gram")
      }
      // locality: append a random prefix; the chunk multiset of the
      // suffix past the first post-junction boundary is preserved
      val prefix = (1 to 1 + rnd.nextInt(30))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val edited = graft.functions.TextHashing.cdcChunks(prefix + text, k, m)
      assert(edited.mkString == prefix + text)
      val shared = chunks.toSeq.intersect(edited.toSeq).size
      assert(shared >= chunks.length - 2,
        s"trial $trial: ${chunks.length} chunks, only $shared survive")
    }
  }
}
