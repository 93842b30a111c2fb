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

  test("batched supersteps and the vocabulary-local trainer learn the " +
      "EXACT sequential merge sequence (fixture corpus, 64 merges)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val seq = Bpe.train(docs, "doc_id", "text", 64)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val (batchedDf, steps) =
      Bpe.trainBatchedStats(docs, "doc_id", "text", 64)
    val batched = batchedDf.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(batched == seq,
      s"batched trajectory diverged from sequential:\n$batched\nvs\n$seq")
    // provably-sequential batches are interaction-limited on char-level
    // text (see the trainBatched scaladoc) — the guarantee is "never
    // worse than one job per merge", the big win is trainLocal below
    assert(steps < 64, s"64 merges took $steps supersteps (want < 64)")
    // the vocabulary-local exact trainer: identical trajectory, ONE job
    val local = Bpe.trainLocal(docs, "doc_id", "text", 64)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(local == seq,
      s"local trajectory diverged from sequential:\n$local\nvs\n$seq")
  }

  test("trainLocal matches sequential deep into the vocabulary " +
      "(256 merges) and respects the frequency-ordered vocab cap") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val seq = Bpe.train(docs, "doc_id", "text", 256)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val local = Bpe.trainLocal(docs, "doc_id", "text", 256)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(local == seq)
    // a capped vocab is the reference trainers' frequency floor:
    // deterministic, still well-formed (ranks dense from 1)
    val capped = Bpe.trainLocal(docs, "doc_id", "text", 16,
        vocabLimit = 100)
      .collect().map(_.getInt(0)).toSeq
    assert(capped == (1 to capped.size), s"ranks not dense: $capped")
    assert(capped.nonEmpty)
  }

  test("incremental trainLocal == full-recount reference at 4096 merges " +
      "on a synthetic vocabulary (heap + occurrence-index maintenance)") {
    // deterministic LCG corpus: 4000 distinct words, lengths 6..13 over
    // a-z, frequencies 1..3 — enough adjacency mass (~30k merge-able
    // positions) to run 4096 rounds deep, with heavy count ties so the
    // UTF-8 tie-break is exercised constantly
    var s = 0x2545F4914F6CDD1DL
    def nxt(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def word(): String = {
      val len = 6 + (math.abs(nxt()) % 8).toInt
      (0 until len).map(_ => ('a' + (math.abs(nxt()) % 26).toInt).toChar)
        .mkString
    }
    val words = (0 until 4000).map(_ => word()).distinct
    val rows = words.zipWithIndex.flatMap { case (w, i) =>
      (0 to i % 3).map(r => (i.toLong * 4 + r, w))
    }
    val docs = rows.toDF("doc_id", "text")
    val inc = Bpe.trainLocal(docs, "doc_id", "text", 4096)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val ref = Bpe.trainLocalReference(docs, "doc_id", "text", 4096)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(inc.size == 4096, s"fixture too shallow: ${inc.size} merges")
    val firstDiff = inc.zip(ref).find { case (x, y) => x != y }
    assert(inc == ref,
      s"sizes ${inc.size}/${ref.size}, first divergence: $firstDiff")
  }

  test("batched supersteps: run-heavy self-pair corpus still matches " +
      "sequential (island logic under batches)") {
    // self-pairs force the run-parity path; the tie round forces the
    // strict-truncation fallback to a 1-merge batch
    val docs = Seq((1L, "oooo booo"), (2L, "xyxy xy zz")).toDF(
      "doc_id", "text")
    for (n <- Seq(2, 4, 6)) {
      val seq = Bpe.train(docs, "doc_id", "text", n).collect().toSeq
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3)))
      val batched = Bpe.trainBatched(docs, "doc_id", "text", n)
        .collect().toSeq.map(r => (r.getInt(0), r.getString(1),
          r.getString(2), r.getLong(3)))
      assert(batched == seq, s"nMerges=$n: $batched vs $seq")
    }
  }

  test("selectBatch stops at the first interacting candidate and " +
      "truncates ties at the boundary") {
    // (b,c) interacts with (a,b); (d,e) after it must NOT be taken
    val c1 = Seq(("a", "b", 10L), ("b", "c", 9L), ("d", "e", 8L))
    assert(Bpe.selectBatch(c1, complete = true) == Seq(("a", "b", 10L)))
    // disjoint run is kept; stop-count tie truncates the equal-count
    // member ((d,e)=9 ties the stopping (b,x)=9 — sequential could be
    // preempted by a pair created from (a,b), so (d,e) must go)
    val c2 = Seq(("a", "b", 10L), ("d", "e", 9L), ("b", "x", 9L))
    assert(Bpe.selectBatch(c2, complete = true) == Seq(("a", "b", 10L)))
    // fully disjoint complete list is taken whole
    val c3 = Seq(("a", "b", 5L), ("c", "d", 5L), ("e", "f", 1L))
    assert(Bpe.selectBatch(c3, complete = true) == c3)
    // incomplete list: unfetched candidates may tie the tail — strict
    // truncation above the LAST fetched count
    assert(Bpe.selectBatch(c3, complete = false) ==
      Seq(("a", "b", 5L), ("c", "d", 5L)))
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
