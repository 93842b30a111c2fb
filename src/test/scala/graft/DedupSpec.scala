package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Near-dup operator properties not expressible as a SQL oracle check:
  * banding completeness against brute force, skew resistance of the
  * entropy-balanced band assignment, and expression null semantics.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForcePairs(docs: Seq[(Long, String)], maxDist: Int) = {
    val sigs = docs.map { case (id, t) =>
      id -> graft.functions.TextHashing.simhash(t)
    }
    (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      d = java.lang.Long.bitCount(sa ^ sb) if d <= maxDist
    } yield (ia, ib, d)).toSet
  }

  test("simhashBandedPairs is complete and exact vs brute force") {
    // small vocab ⇒ correlated signature bits, the regime where naive
    // contiguous banding degenerates; completeness must not depend on
    // which bit positions carry the corpus' entropy
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val rnd = new scala.util.Random(42)
    val docs = (1L to 120L).map { id =>
      id -> Seq.fill(6 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.simhashBandedPairs(df, "doc_id", "text", 6)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == bruteForcePairs(docs, 6))
    // each qualifying pair appears exactly once (first-matching-band
    // filter dedups in the join, not via a distinct shuffle)
    val rows = Dedup.simhashBandedPairs(df, "doc_id", "text", 6).count()
    assert(rows == got.size)
  }

  test("entropy-balanced bands avoid degenerate constant-bit buckets") {
    // all docs share most words ⇒ most signature bits corpus-constant;
    // candidate volume must stay near the true pair count, not N²/band
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (1L to 200L).map { id =>
      id -> (base + " tail" + (id % 50))
    }
    val df = docs.toDF("doc_id", "text")
    val expected = bruteForcePairs(docs, 3)
    val got = Dedup.simhashBandedPairs(df, "doc_id", "text", 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == expected)
  }

  test("jaccardPairs prefix filter loses no pairs vs brute force") {
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val rnd = new scala.util.Random(7)
    val docs = (1L to 150L).map { id =>
      id -> Seq.fill(4 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    def shingleSet(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val expected = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = shingleSet(ta); sb = shingleSet(tb)
      if sa.nonEmpty && sb.nonEmpty
      common = (sa & sb).size.toDouble
      j = common / (sa.size + sb.size - common) if j >= 0.6
    } yield (ia, ib)).toSet
    val got = graft.ops.Dedup
      .jaccardPairs(docs.toDF("doc_id", "text"), "doc_id", "text", 3, 0.6)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("dupClusters: transitive closure with min-id canonical labels") {
    val ids = (1L to 9L).toDF("doc_id")
    // components: {1,2,3,4} via a chain (forces >1 propagation round),
    // {6,8}, and singletons 5, 7, 9
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 8L))
      .toDF("id_a", "id_b")
    val got = graft.ops.Dedup.dupClusters(ids, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 6L, 7L -> 7L, 8L -> 6L, 9L -> 9L))
  }

  test("dupClustersStar matches hash-min on a mixed component shape") {
    val ids = (1L to 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 8L))
      .toDF("id_a", "id_b")
    val star = graft.ops.Dedup.dupClustersStar(ids, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    val hashMin = graft.ops.Dedup.dupClusters(ids, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(star == hashMin)
    assert(star == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 6L, 7L -> 7L, 8L -> 6L, 9L -> 9L))
  }

  test("dupClustersStar converges on a 200-node chain in O(log n) rounds") {
    // the adversarial shape: a path graph of diameter 199. Hash-min needs
    // one shuffle round per hop (dupClusters' default 50-round cap rightly
    // refuses it); star contraction must finish well under the same cap.
    val n = 200L
    val ids = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // permute labels so convergence can't ride on ids being pre-sorted
    // along the chain: node i maps to (i * 7919) mod 200 + offsets
    val perm = (1L to n).map(i => i -> ((i * 7919L) % n + 1000L)).toMap
    val pids = ids.as[Long].map(perm).toDF("doc_id")
    val ppairs = pairs.as[(Long, Long)]
      .map { case (a, b) => (perm(a), perm(b)) }.toDF("id_a", "id_b")
    val got = graft.ops.Dedup.dupClustersStar(pids, "doc_id", ppairs,
        maxIters = 20)
      .as[(Long, Long)].collect()
    val minLabel = perm.values.min
    assert(got.length == n)
    assert(got.forall(_._2 == minLabel), "single chain = one component")
    assertThrows[IllegalStateException] {
      graft.ops.Dedup.dupClusters(pids, "doc_id", ppairs, maxIters = 20)
    }
  }

  test("dupClustersStar: empty pair list yields all-singleton clusters") {
    val ids = (1L to 5L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val got = graft.ops.Dedup.dupClustersStar(ids, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == (1L to 5L).map(i => i -> i).toMap)
  }

  test("cdcDedup: chunks concatenate back; a prefix edit re-chunks " +
      "only its neighborhood; the ledger counts copies exactly") {
    val rnd = new scala.util.Random(7)
    val t = (1 to 600).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    def chunksOf(s: String) =
      graft.functions.TextHashing.cdcChunks(s, 16, 64).toSeq
    val base = chunksOf(t)
    assert(base.mkString == t, "chunks concatenate to the input")
    assert(base.size >= 3, s"expected multiple chunks, got ${base.size}")
    // content-defined boundary guarantee: an edit at the front leaves
    // every boundary past the junction aligned, so only the chunks
    // touching the junction change
    val edited = chunksOf("PREFIX-INSERTED " + t)
    assert(edited.mkString == "PREFIX-INSERTED " + t)
    val shared = base.toSet.intersect(edited.toSet).size
    assert(shared >= base.size - 2,
      s"${base.size} base chunks, only $shared survive the prefix edit")
    // degenerate inputs
    assert(chunksOf("").isEmpty)
    assert(chunksOf("short") == Seq("short"))
    // ledger: identical docs share every chunk; singles stay single
    val df = Seq((1L, t), (2L, t), (3L, "short")).toDF("doc_id", "text")
    val led = graft.ops.Dedup.cdcDedup(df, "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val dups = led.filter(_._4 == 2L)
    assert(dups.length == base.distinct.size)
    assert(dups.forall(c => c._3 == 2L && c._5 == 1L),
      "both copies counted, canonical = min doc id")
    val single = led.filter(_._5 == 3L)
    assert(single.length == 1 && single.head._2 == 5L &&
      single.head._3 == 1L && single.head._4 == 1L)
  }

  test("CdcLedger: persisted append-only deltas fold to exactly the " +
      "full rebuild; compact preserves the view") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = docs.where($"doc_id" % 2 === 0)
    val b = docs.where($"doc_id" % 2 =!= 0)
    val root = tmpDir("cdc-ledger")
    val cat = new graft.catalog.VersionedCatalog(root)
    graft.ops.CdcLedger.build(a, "doc_id", "text").save(cat, "cdc")
    val reopened = graft.ops.CdcLedger.load(spark, cat, "cdc")
    val inc = reopened.appendDocs(cat, "cdc", b, "doc_id", "text")
    val full = graft.ops.CdcLedger.build(docs, "doc_id", "text").ledger
    assert(inc.ledger.exceptAll(full).isEmpty &&
      full.exceptAll(inc.ledger).isEmpty,
      "append == full rebuild")
    // the in-memory fold agrees too
    val mem = reopened.addDocs(b, "doc_id", "text")
    assert(mem.ledger.exceptAll(full).isEmpty &&
      full.exceptAll(mem.ledger).isEmpty)
    // compaction re-materializes without changing the view
    val compacted = inc.compact(cat, "cdc")
    assert(compacted.ledger.exceptAll(full).isEmpty &&
      full.exceptAll(compacted.ledger).isEmpty)
  }

  test("exactly-once CDC ledger maintenance: replayed batch ids are " +
      "no-ops; applied folds equal a batch rebuild") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = docs.where($"doc_id" % 2 === 0)
    val b = docs.where($"doc_id" % 2 =!= 0)
    val root = tmpDir("cdc-maint")
    val cat = new graft.catalog.VersionedCatalog(root)
    import graft.ops.CdcLedger
    assert(CdcLedger.applyBatch(a, 0L, "doc_id", "text", cat, "cdc", 16, 64))
    assert(CdcLedger.applyBatch(b, 1L, "doc_id", "text", cat, "cdc", 16, 64))
    // redelivery of either id is a no-op
    assert(!CdcLedger.applyBatch(b, 1L, "doc_id", "text", cat, "cdc", 16, 64))
    assert(!CdcLedger.applyBatch(a, 0L, "doc_id", "text", cat, "cdc", 16, 64))
    assert(!CdcLedger.applyBatch(a.limit(0), 2L, "doc_id", "text", cat,
      "cdc", 16, 64), "empty batch skips")
    val full = CdcLedger.build(docs, "doc_id", "text").ledger
    val got = CdcLedger.load(spark, cat, "cdc").ledger
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty)
    // a MANUAL append between micro-batches (no batchId) must not reset
    // the replay marker: batch 1 redelivered afterwards is still a no-op
    val led = CdcLedger.load(spark, cat, "cdc")
    led.appendDocs(cat, "cdc",
      Seq((1000L, "entirely fresh manual doc text here"))
        .toDF("doc_id", "text"), "doc_id", "text")
    assert(!CdcLedger.applyBatch(b, 1L, "doc_id", "text", cat, "cdc",
      16, 64), "manual append reset last_batch_id — double-count risk")
  }

  test("kCore: iterative peel reaches the maximal subgraph — cascades " +
      "resolve, survivors all have in-subgraph degree >= k") {
    // K4 {1,2,3,4} with a pendant chain 4-5-6: at k=3 the chain peels
    // in CASCADE (6 first, then 5 drops below, then the 4-side edge)
    // leaving exactly the K4 with all degrees 3
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("id_a", "id_b")
    val core3 = Dedup.kCore(edges, k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), core3)
    // k=2 keeps K4 only as well (5 has degree 2 BEFORE the peel but
    // loses 6 in round one and follows) — the fixpoint is not the
    // one-shot degree filter
    val core2 = Dedup.kCore(edges, k = 2).collect()
      .map(r => r.getLong(0)).toSet
    assert(core2 == Set(1L, 2L, 3L, 4L), core2)
    // k=1: every edge endpoint survives
    assert(Dedup.kCore(edges, k = 1).count() == 6L)
    // k above the densest core: empty
    assert(Dedup.kCore(edges, k = 4).isEmpty)
    // symmetric-orientation input canonicalizes — (1,2)+(2,1) is ONE
    // edge, so the 2-core of a single edge is empty, never a phantom
    // degree-2 pair
    val sym = Seq((1L, 2L), (2L, 1L)).toDF("id_a", "id_b")
    assert(Dedup.kCore(sym, k = 2).isEmpty)
    assert(Dedup.kCore(sym, k = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L))
    // a deep peel cascade past maxRounds refuses rather than returning
    // a silent non-fixpoint; the bounded-round semantic is opt-in
    val chain = (1L to 7L).sliding(2)
      .map(s => (s.head, s.last)).toSeq.toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.kCore(chain, k = 2, maxRounds = 2)
    }
    assert(Dedup.kCore(chain, k = 2).isEmpty, "converged: path has no 2-core")
    // bounded-round semantic: exactly 2 simultaneous peels leave the
    // middle of the path
    assert(Dedup.kCore(chain, k = 2, maxRounds = 2,
      requireConverged = false).collect().map(_.getLong(0)).toSet ==
      Set(3L, 4L, 5L))
  }

  test("winnow: rolling-hash fingerprints match the direct formulation") {
    // brute-force reference: hash every k-gram independently (the fold
    // the DuckDB oracle replays), window minima, sorted distinct
    def reference(text: String, k: Int, w: Int): Seq[Long] = {
      val P = 1000000007L
      val cps = text.codePoints().toArray
      if (cps.length < k) return Seq.empty
      val grams = cps.sliding(k).map(_.foldLeft(0L)((a, c) =>
        (a * 31L + c) % P)).toArray
      val mins =
        if (grams.length < w) Array(grams.min)
        else grams.sliding(w).map(_.min).toArray
      mins.distinct.sorted.toSeq
    }
    val texts = Seq("abcdefghij", "aaaaaaaaaaaaaaaa", "ab",
      "the quick brown fox jumps over the lazy dog and then some more")
    for (t <- texts; k <- Seq(4, 16); w <- Seq(3, 8)) {
      val got = graft.functions.TextHashing.winnow(t, k, w).toSeq
      assert(got == reference(t, k, w), s"text='$t' k=$k w=$w")
    }
  }

  test("winnowPairs finds a shared >= k+w-1 char run in unrelated docs") {
    // k=16, w=8: ANY shared run of >= 23 chars guarantees a common
    // fingerprint — embed one quoted block in otherwise disjoint text
    val block = "this exact sentence was copied verbatim into both"
    val docs = Seq(
      (1L, s"alpha bravo charlie $block delta echo foxtrot"),
      (2L, s"zulu yankee xray whiskey $block victor uniform"),
      (3L, "totally different content with no overlap at all here"),
      (4L, "another unrelated document about catalogs and parquet"))
      .toDF("doc_id", "text")
    val got = graft.ops.Dedup
      .winnowPairs(docs, "doc_id", "text",
        k = 16, w = 8, minShared = 1L, maxDocFreq = 10)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), "copied block detected")
    assert(!got.exists(p => Set(p._1, p._2).intersect(Set(3L, 4L)).nonEmpty),
      "disjoint docs stay unpaired")
  }

  test("winnowSpanPairs localizes the copied block in both docs") {
    val block = "this exact sentence was copied verbatim into both documents"
    val prefixA = "alpha bravo charlie delta "          // 26 chars
    val prefixB = "z y x w v u t s r q p o n m l k j " // 34 chars
    val docs = Seq(
      (1L, s"$prefixA$block and then some trailing content here"),
      (2L, s"$prefixB$block with different trailing words area"),
      (3L, "entirely unrelated filler content about nothing at all"))
      .toDF("doc_id", "text")
    val got = graft.ops.Dedup
      .winnowSpanPairs(docs, "doc_id", "text",
        k = 16, w = 8, minShared = 1L, maxDocFreq = 10)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val Array((ia, ib, n, loA, hiA, loB, hiB)) = got
    assert((ia, ib) == (1L, 2L))
    assert(n >= 1L)
    // matched selections must sit INSIDE each doc's copy of the block:
    // gram index ≈ start offset of the k-gram
    assert(loA >= prefixA.length - 16 && hiA <= prefixA.length + block.length,
      s"span A [$loA,$hiA] inside the planted block")
    assert(loB >= prefixB.length - 16 && hiB <= prefixB.length + block.length,
      s"span B [$loB,$hiB] inside the planted block")
    // the block starts 8 chars later in doc 2 than doc 1 — matched
    // positions shift by exactly the prefix delta for aligned content
    assert(loB - loA == (prefixB.length - prefixA.length).toLong)
  }

  test("winnowSpanPairs: within-doc repetition neither trips the doc-freq" +
      " cap nor inflates n_shared") {
    val block = "this exact sentence was copied verbatim across documents"
    // doc 1 repeats the block 3 times internally; doc 2 has it once.
    // Occurrence-counting would see >= 4 rows per fingerprint and a
    // cap of 3 would drop the overlap; doc-frequency counting sees 2
    val docs = Seq(
      (1L, s"$block also $block and again $block"),
      (2L, s"completely different framing here $block trailing words"),
      (3L, "unrelated content about catalogs and shuffles and parquet"))
      .toDF("doc_id", "text")
    val got = graft.ops.Dedup
      .winnowSpanPairs(docs, "doc_id", "text",
        k = 16, w = 8, minShared = 1L, maxDocFreq = 3)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2)).toSet == Set((1L, 2L)))
    // n_shared counts DISTINCT fingerprints: it cannot exceed doc 2's
    // selection count over its single copy of the block (plus margin
    // for boundary grams), far below the |posA|x|posB| cross-product
    val n = got.head._3
    val fpIn2 = graft.functions.TextHashing
      .winnow(s"completely different framing here $block trailing words",
        16, 8).length
    assert(n >= 1L && n <= fpIn2.toLong, s"n_shared=$n vs doc-2 fps=$fpIn2")
  }

  test("simhash index save/load round-trips and probes identically") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "how vexingly quick daft zebras jump today"))
      .toDF("doc_id", "text")
    val probes = Seq(
      (101L, "the quick brown fox jumps over the lazy cat"),
      (102L, "unrelated words about catalogs and parquet"))
      .toDF("doc_id", "text")
    val idx = graft.ops.Dedup.simhashIndex(corpus, "doc_id", "text", 6)
    val fresh = graft.ops.Dedup
      .nearDupProbe(probes, idx, "doc_id", "text", 6)
      .as[(Long, Long, Int)].collect().toSet

    val cat = new graft.catalog.VersionedCatalog(tmpDir("shidx"))
    idx.save(cat, "docs_simhash")
    val reopened = graft.ops.Dedup.loadSimhashIndex(spark, cat, "docs_simhash")
    assert(reopened.masks == idx.masks, "band masks survive in band order")
    val loaded = graft.ops.Dedup
      .nearDupProbe(probes, reopened, "doc_id", "text", 6)
      .as[(Long, Long, Int)].collect().toSet
    assert(loaded == fresh)
    assert(fresh.nonEmpty, "the near-dup probe pair is present")
  }

  test("minhash index save/load round-trips; probe matches fresh pairs") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "red green blue yellow purple orange pink white"))
      .toDF("doc_id", "text")
    // probe 101 is a near-dup of corpus 1; 102 matches nothing
    val probes = Seq(
      (101L, "alpha beta gamma delta epsilon zeta eta iota"),
      (102L, "unrelated words entirely distinct from everything else"))
      .toDF("doc_id", "text")
    val idx = graft.ops.Dedup.minhashIndex(corpus, "doc_id", "text",
      n = 3, numHashes = 8, rowsPerBand = 2)
    val fresh = graft.ops.Dedup
      .minhashProbe(probes, idx, "doc_id", "text", threshold = 0.5)
      .select($"probe_id", $"corpus_id").as[(Long, Long)].collect().toSet
    assert(fresh == Set((101L, 1L)), s"got $fresh")

    val cat = new graft.catalog.VersionedCatalog(tmpDir("mhidx"))
    idx.save(cat, "docs_minhash")
    val reopened = graft.ops.Dedup.loadMinhashIndex(spark, cat, "docs_minhash")
    assert(reopened.n == 3 && reopened.numHashes == 8 &&
      reopened.rowsPerBand == 2)
    val loaded = graft.ops.Dedup
      .minhashProbe(probes, reopened, "doc_id", "text", threshold = 0.5)
      .select($"probe_id", $"corpus_id").as[(Long, Long)].collect().toSet
    assert(loaded == fresh)
  }

  private def clusterMap(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap

  test("dup-cluster index: incremental addDocs == full rebuild, " +
      "including a batch doc that merges two old clusters") {
    // doc 1 ~ doc 2 (cluster 1); docs 3, 4 are singletons and FAR apart
    val batchA = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "one two three four five six seven eight nine"),
      (4L, "red green blue yellow purple orange pink white"))
      .toDF("doc_id", "text")
    // 10 bridges clusters {1,2} and {3}: shares a long run with each;
    // 11 pairs with nothing; 12 is a near-dup of 4
    val batchB = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta one two three " +
        "four five six seven eight nine"),
      (11L, "totally novel content unlike anything else in any corpus"),
      (12L, "red green blue yellow purple orange pink black"))
      .toDF("doc_id", "text")
    val (n, h, r, t) = (3, 8, 1, 0.25)

    val idx = Dedup.dupClusterIndex(batchA, "doc_id", "text", n, h, r, t)
    val incr = idx.addDocs(batchB, "doc_id", "text")
    val full = Dedup.dupClusterIndex(batchA.unionByName(batchB),
      "doc_id", "text", n, h, r, t)
    val (gi, gf) = (clusterMap(incr.clusters), clusterMap(full.clusters))
    assert(gi == gf, s"incremental $gi != full rebuild $gf")
    // the merge actually happened: 1,2,3,10 share a cluster labeled 1
    assert(gi(10L) == 1L && gi(3L) == 1L && gi(2L) == 1L)
    assert(gi(11L) == 11L, "unmatched new doc becomes its own cluster")
    assert(gi(12L) == 4L, "near-dup of a singleton joins it")
    // the index extended: probing against it sees the new docs too
    assert(incr.minhash.sets.count() == 7)
  }

  test("dup-cluster index: persisted keep-best and reopen") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val idx = Dedup.dupClusterIndex(docs, "doc_id", "text", 3, 8, 2, 0.3)
    val cat = new graft.catalog.VersionedCatalog(tmpDir("dcidx"))
    idx.save(cat, "dup_idx")
    val reopened = Dedup.loadDupClusterIndex(spark, cat, "dup_idx")
    assert(reopened.threshold == 0.3)
    assert(clusterMap(reopened.clusters) == clusterMap(idx.clusters))
    // keep-best off the PERSISTED table: doc 1 ("theta" outruns "iota"
    // by a char) keeps cluster 1, cluster 3 keeps itself
    val quality = docs.select($"doc_id", length($"text").as("n_chars"))
    val kb = reopened.keepBest(quality, "doc_id", "n_chars")
      .select($"cluster_id", $"keep_id", $"n_docs")
      .as[(Long, Long, Long)].collect().toSet
    assert(kb == Set((1L, 1L, 2L), (3L, 3L, 1L)), s"got $kb")
  }

  test("decontaminate counts distinct shared n-grams per training doc") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares 2 distinct 4-grams? no: 1 (abgd) + bgde not in bench
      (2L, "zeta eta theta iota"),            // clean
      (3L, "x alpha beta gamma delta")        // shares abgd once
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup
      .decontaminate(train, bench, "doc_id", "text", n = 4)
      .as[(Long, Long)].collect().toMap
    // bench has exactly one 4-gram: "alpha beta gamma delta"
    assert(got == Map(1L -> 1L, 3L -> 1L), "clean docs are absent")
  }

  private def edgeSet(df: org.apache.spark.sql.DataFrame) =
    df.select($"id_a", $"id_b").as[(Long, Long)].collect().toSet

  test("pair-graph index: index-fed graph consumers equal inline-fed") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    val rnd = new scala.util.Random(7)
    // clone families: base sentences plus light perturbations, so the
    // LSH graph has real multi-node components
    val docs = (0L until 60L).map { id =>
      val fam = (id / 4L).toInt
      val base = Seq.tabulate(8)(i => vocab(((fam * 3) + i) % vocab.size))
      val text = (base :+ vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (id, text)
    }
    val df = docs.toDF("doc_id", "text")
    val (n, h, r, t) = (3, 8, 2, 0.5)
    val inline = Dedup.minhashLshPairs(df, "doc_id", "text", n, h, r, t)
      .select($"id_a", $"id_b").persist()
    val idx = Dedup.pairGraphIndex(df, "doc_id", "text", n, h, r, t)
    assert(edgeSet(idx.edges) == edgeSet(inline), "edge sets differ")
    assert(inline.count() > 10, "fixture produced a trivial graph")
    // every consumer fed from the index equals the inline-fed run
    def prMap(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long)].collect().toMap
    assert(prMap(idx.pageRank("doc_id", 3)) ==
      prMap(Dedup.pageRank(inline, "doc_id", 3)))
    assert(clusterMap(idx.dupClusters(df.select($"doc_id"), "doc_id")
        .withColumnRenamed("doc_id", "doc_id")) ==
      clusterMap(Dedup.dupClusters(df.select($"doc_id"), "doc_id", inline)))
    assert(idx.kCore(2).as[(Long, Long)].collect().toSet ==
      Dedup.kCore(inline, 2).as[(Long, Long)].collect().toSet)
    val si = idx.leakageFreeSplit(df.select($"doc_id"), "doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val sf = Dedup.leakageFreeSplit(df.select($"doc_id"), "doc_id", inline)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(si == sf)
    inline.unpersist()
    idx.release()
    Dedup.releaseCaches()
  }

  test("pair-graph index: addDocs == full rebuild; save/load round-trip") {
    val batchA = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "one two three four five six seven eight nine"),
      (4L, "red green blue yellow purple orange pink white"))
      .toDF("doc_id", "text")
    // 10 bridges {1,2} and {3}; 11 pairs with nothing; 12 near-dups 4
    val batchB = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta one two three " +
        "four five six seven eight nine"),
      (11L, "totally novel content unlike anything else in any corpus"),
      (12L, "red green blue yellow purple orange pink black"))
      .toDF("doc_id", "text")
    val (n, h, r, t) = (3, 8, 1, 0.25)
    val idx = Dedup.pairGraphIndex(batchA, "doc_id", "text", n, h, r, t)
    val incr = idx.addDocs(batchB, "doc_id", "text")
    val full = Dedup.pairGraphIndex(batchA.unionByName(batchB),
      "doc_id", "text", n, h, r, t)
    assert(edgeSet(incr.edges) == edgeSet(full.edges),
      "incremental edge set != full rebuild")
    // cross edges actually appeared (old↔new), not just batch self-pairs
    assert(edgeSet(incr.edges).exists { case (a, b) => a <= 4L && b >= 10L })
    // jaccard values survive the fold identically too
    def jmap(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(jmap(incr.edges) == jmap(full.edges))
    // re-ingesting an existing id fails fast
    val ex = intercept[IllegalArgumentException] {
      incr.addDocs(Seq((1L, "alpha beta gamma delta epsilon zeta"))
        .toDF("doc_id", "text"), "doc_id", "text")
    }
    assert(ex.getMessage.contains("already"))
    // save/load: consumers read the committed edges verbatim
    val cat = new graft.catalog.VersionedCatalog(tmpDir("pgidx"))
    incr.save(cat, "pair_graph")
    val reopened = Dedup.loadPairGraphIndex(spark, cat, "pair_graph")
    assert(reopened.threshold == t)
    assert(edgeSet(reopened.edges) == edgeSet(incr.edges))
    incr.release(); idx.release(); full.release()
    Dedup.releaseCaches()
  }

  test("pair-graph maintenance: exactly-once replay and no cache leak") {
    val cat = new graft.catalog.VersionedCatalog(tmpDir("pg-maint"))
    Dedup.releaseCaches()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val batches = Seq(
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
        (2L, "alpha beta gamma delta epsilon zeta eta iota")),
      Seq((10L, "one two three four five six seven eight nine")),
      Seq((11L, "alpha beta gamma delta epsilon zeta eta kappa")))
    batches.zipWithIndex.foreach { case (b, i) =>
      assert(Dedup.applyPairGraphBatch(b.toDF("doc_id", "text"),
        batchId = i.toLong, "doc_id", "text", cat, "pg_idx",
        n = 3, numHashes = 8, rowsPerBand = 1, threshold = 0.25))
    }
    val committed = edgeSet(
      Dedup.loadPairGraphIndex(spark, cat, "pg_idx").edges)
    // a REPLAYED batch id (at-least-once foreachBatch) is a no-op: not
    // applied, edge table byte-identical
    assert(!Dedup.applyPairGraphBatch(
      batches(2).toDF("doc_id", "text"), batchId = 2L, "doc_id", "text",
      cat, "pg_idx", n = 3, numHashes = 8, rowsPerBand = 1,
      threshold = 0.25))
    assert(edgeSet(Dedup.loadPairGraphIndex(spark, cat, "pg_idx").edges)
      == committed)
    // and equals a batch rebuild over everything ingested
    val all = batches.flatten.toDF("doc_id", "text")
    val rebuilt = Dedup.pairGraphIndex(all, "doc_id", "text", 3, 8, 1, 0.25)
    assert(committed == edgeSet(rebuilt.edges))
    rebuilt.release(); Dedup.releaseCaches()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }

  test("dup-cluster maintenance releases its caches per batch") {
    val cat = new graft.catalog.VersionedCatalog(tmpDir("dc-release"))
    Dedup.releaseCaches()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val batches = Seq(
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
        (2L, "alpha beta gamma delta epsilon zeta eta iota")),
      Seq((10L, "one two three four five six seven eight nine")),
      Seq((11L, "alpha beta gamma delta epsilon zeta eta kappa")))
    batches.zipWithIndex.foreach { case (b, i) =>
      assert(Dedup.applyDupClusterBatch(b.toDF("doc_id", "text"),
        batchId = i.toLong, "doc_id", "text", cat, "rel_idx",
        n = 3, numHashes = 8, rowsPerBand = 1, threshold = 0.25))
    }
    // the long-running maintenance loop must not accumulate cached
    // blocks: every per-batch index cache (and the pair-finding
    // transients) is unpersisted after the catalog commit
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
    // and the committed index is intact after release
    val labels = Dedup.loadDupClusterIndex(spark, cat, "rel_idx")
      .clusters.as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 1L),
      s"got $labels")
  }

  test("containmentPairs finds doc-in-doc dups Jaccard misses") {
    // doc 2 is doc 1's text embedded in a much longer page: containment
    // c(2→1)=1.0 but Jaccard ≈ |A|/|B| is far below any usable bar —
    // the asymmetric signal is the whole point of the operator
    val core = "alpha beta gamma delta epsilon zeta eta theta"
    val wrapper = (1 to 20).map(i => s"nav$i menu$i item$i").mkString(" ")
    val docs = Seq(
      (1L, core),
      (2L, s"$wrapper $core $wrapper"),
      (3L, "totally different content with no shared phrasing at all"))
    val df = docs.toDF("doc_id", "text")
    def sh(t: String): Set[String] =
      t.split(" ", -1).sliding(3).map(_.mkString(" ")).toSet
    val expected = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = sh(ta); sb = sh(tb)
      common = (sa & sb).size
      cab = common.toDouble / sa.size; cba = common.toDouble / sb.size
      if math.max(cab, cba) >= 0.8
    } yield (ia, ib, common.toLong)).toSet
    val got = Dedup.containmentPairs(df, "doc_id", "text", 3, 0.8)
      .select($"id_a", $"id_b", $"common").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == expected && got.contains((1L, 2L, sh(core).size.toLong)))
    // and the symmetric Jaccard gate at the same bar finds nothing
    val jac = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.8).count()
    assert(jac == 0L)
    // the capped scale path agrees pair-for-pair here (no shingle is
    // hot enough to trip the doc-freq cap on this fixture)
    val capped = Dedup
      .containmentPairsCapped(df, "doc_id", "text", 3, 0.8, maxDocFreq = 20)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(capped == expected.map { case (a, b, _) => (a, b) })
  }

  test("capped star variant survives dense duplication the plain cap " +
      "zeroes out on") {
    // a 30-copy template farm: EVERY shingle has doc-frequency 30 > cap,
    // so the plain capped variant finds nothing — the round-10 recall
    // cliff. The star variant pairs each copy with the group's min doc.
    val farm = (1L to 30L).map(i =>
      (i, "lorem ipsum dolor sit amet consectetur adipiscing elit"))
    val other = Seq(
      (100L, "completely unrelated text about spark partitioning"),
      (101L, "completely unrelated text about spark partitioning plus"))
    val df = (farm ++ other).toDF("doc_id", "text")
    val plain = Dedup
      .jaccardPairsCapped(df, "doc_id", "text", 3, 0.6, maxDocFreq = 20)
      .as[(Long, Long, Double)].collect()
    assert(plain.forall { case (a, b, _) => a >= 100L && b >= 100L },
      "plain cap must drop every farm pair (the documented cliff)")
    val star = Dedup
      .jaccardPairsCappedStar(df, "doc_id", "text", 3, 0.6, maxDocFreq = 20)
      .as[(Long, Long, Double)].collect()
    val farmPairs = star.filter(_._1 < 100L)
    assert(farmPairs.map(p => (p._1, p._2)).toSet ==
      (2L to 30L).map(i => (1L, i)).toSet,
      "canonical star: min doc paired with every other copy")
    assert(farmPairs.forall(_._3 == 1.0), "verified true Jaccard")
    // the rare-shingle path is untouched: 100–101 still pair via it
    assert(star.exists(p => p._1 == 100L && p._2 == 101L))
    // mixed pair (shares BOTH rare and hot shingles) keeps exact verify:
    // doc 102 = farm text + extra tail appearing in doc 103 too
    val df2 = (farm ++ Seq(
      (102L, "lorem ipsum dolor sit amet consectetur adipiscing elit " +
        "unique tail marker words"),
      (103L, "other prefix entirely unique tail marker words"))).toDF(
      "doc_id", "text")
    val star2 = Dedup
      .containmentPairsCappedStar(df2, "doc_id", "text", 3, 0.8,
        maxDocFreq = 20)
      .select($"id_a", $"id_b", $"cont_ab", $"cont_ba")
      .as[(Long, Long, Double, Double)].collect()
    // doc 102 contains the whole farm template → containment from each
    // farm doc into 102 is 1.0; star centers on doc 1
    val into102 = star2.filter(p => p._1 == 1L && p._2 == 102L)
    assert(into102.length == 1 && into102.head._3 == 1.0,
      s"farm-min→102 containment via star, got ${star2.mkString(",")}")
  }

  test("chain variant recovers the duplicate group the star misses when " +
      "every bucket minimum lives in another group") {
    // farm A (ids 1-30) holds the full template; farm B (ids 31-60) a
    // PREFIX of it — every B shingle's bucket therefore contains all of
    // A, so each bucket's minimum doc is doc 1 (in A). The star's only
    // candidates for B docs are (1, b), which fail exact verification
    // (jaccard(A,B) = 4/8 < 0.6) — farm B vanishes from the star
    // variant entirely. Chaining pairs adjacent bucket members, so B's
    // in-group edges (31,32)...(59,60) surface with jaccard 1.0.
    val full = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val prefix = "w1 w2 w3 w4 w5 w6"
    val df = ((1L to 30L).map((_, full)) ++ (31L to 60L).map((_, prefix)))
      .toDF("doc_id", "text")
    val star = Dedup
      .jaccardPairsCappedStar(df, "doc_id", "text", 3, 0.6, maxDocFreq = 20)
      .as[(Long, Long, Double)].collect()
    assert(!star.exists(p => p._1 > 30L || p._2 > 30L),
      s"star must miss farm B entirely, got ${star.length} pairs")
    val chain = Dedup
      .jaccardPairsCappedChain(df, "doc_id", "text", 3, 0.6, maxDocFreq = 20)
      .as[(Long, Long, Double)].collect()
    val bDocs = chain.filter(p => p._2 > 30L).flatMap(p => Seq(p._1, p._2))
      .filter(_ > 30L).toSet
    assert(bDocs == (31L to 60L).toSet,
      s"chain must surface every farm-B doc, got $bDocs")
    assert(chain.filter(p => p._1 > 30L).forall(_._3 == 1.0))
    // chain candidates only ADD to the star's: A's pairs survive intact
    assert(star.map(p => (p._1, p._2)).toSet.subsetOf(
      chain.map(p => (p._1, p._2)).toSet))
    // mega-shingle regime end-to-end: lowering the per-task row bound
    // forces the bucketed predecessor derivation (probe finds an
    // over-bound shingle) — the surfaced pair set must be identical to
    // the plain-window plan's
    val bucketed = Dedup
      .jaccardPairsCappedChain(df, "doc_id", "text", 3, 0.6,
        maxDocFreq = 20, rowsPerTask = 8L)
      .as[(Long, Long, Double)].collect()
    assert(bucketed.toSet == chain.toSet,
      "bucketed mega-path must surface exactly the window plan's pairs")
  }

  test("adjacencyChainEdges: range-bucketed derivation equals the " +
      "single-window edge set on skewed, gappy doc ids") {
    // adversarial shape for the bucketing: one mega-hot shingle (every
    // doc), several medium ones, doc ids clumped at both ends of the
    // range with a huge hole in the middle (so many ranges are empty and
    // clump boundaries fall mid-bucket), plus a shingle whose docs all
    // land in ONE range (stitch must emit nothing for it)
    val rnd = new scala.util.Random(7)
    val ids = ((1L to 400L) ++ (900000L to 900400L)).filter(_ => rnd.nextBoolean())
    def occWith(nb: Long => Long) = ids.flatMap { d =>
      val hot = Seq(77L)                        // mega-hot: every doc
      val med = if (d % 3 == 0) Seq(11L) else Nil
      val clump = if (d < 500L) Seq(22L) else Nil // single-range shingle
      (hot ++ med ++ clump).map(s => (s, d, nb(s)))
    }.toDF("shingle", "doc", "nb")
    val lo = ids.min
    val hi = ids.max
    // mega shingle split 7 ways, medium split 3, clumped one unsplit —
    // heterogeneous nb is the production shape (split ∝ df)
    val occ = occWith { s => if (s == 77L) 7L else if (s == 11L) 3L else 1L }
    val got = Dedup.adjacencyChainEdges(occ, lo, hi)
      .as[(Long, Long)].collect().toSet
    // reference: plain per-shingle window lag (the skew-prone original)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shingle")).orderBy(col("doc"))
    val want = occ.withColumn("prev", lag(col("doc"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("prev"), col("doc"))
      .as[(Long, Long)].collect().toSet
    assert(got == want, s"edge sets differ: extra=${got -- want} " +
      s"missing=${want -- got}")
    assert(got.forall(p => p._1 < p._2))
    // degenerate bucket counts: all-1 (collapses to the pure window) and
    // a far-oversized count (most ranges empty, clumps spread across
    // many stitches) must both reproduce the same set
    assert(Dedup.adjacencyChainEdges(occWith(_ => 1L), lo, hi)
      .as[(Long, Long)].collect().toSet == want)
    assert(Dedup.adjacencyChainEdges(occWith(_ => 4096L), lo, hi)
      .as[(Long, Long)].collect().toSet == want)
  }

  test("pageRank: hand-computed fixed point on a path graph; hub wins") {
    // path a(1)–b(2)–c(3): deg 1/2/1, n=3, scale=1200 → r0=400 each,
    // base=(15·1200/100)/3=60
    // round 1: inflow a=400//2=200, b=400+400=800, c=200
    //          r1 = 60+(85·s)//100 → a=230, b=740, c=230
    // round 2: contrib a→b 230, b→{a,c} 740//2=370, c→b 230
    //          r2(a)=60+(85·370)//100=374, r2(b)=60+(85·460)//100=451
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val r2 = graft.ops.Dedup.pageRank(pairs, "doc_id", iters = 2,
        scale = 1200L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 374L, 2L -> 451L, 3L -> 374L), r2)
    // the 2-degree hub outranks the leaves at any iteration depth
    val r5 = graft.ops.Dedup.pageRank(pairs, "doc_id", iters = 5,
        scale = 1000000000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r5(2L) > r5(1L) && r5(1L) == r5(3L), r5)
    spark.catalog.clearCache()
  }

  test("contracted PageRank == raw pageRank BIT-EXACTLY on planted " +
      "clone cliques (per node, mixed family sizes), zero cross edges") {
    // three disjoint cliques — sizes 3, 5, 2: the dup-graph family shape
    // the inflation fixtures plant. Regular degree per family, so the
    // per-member scalar recurrence must reproduce raw PR exactly.
    def clique(ids: Seq[Long]): Seq[(Long, Long)] =
      for (i <- ids.indices; j <- i + 1 until ids.size)
        yield (ids(i), ids(j))
    val pairs = (clique(Seq(1L, 2L, 3L)) ++
      clique(Seq(10L, 11L, 12L, 13L, 14L)) ++
      clique(Seq(20L, 21L))).toDF("id_a", "id_b")
    for (it <- Seq(1, 3)) {
      val raw = graft.ops.Dedup.pageRank(pairs, "doc_id", iters = it)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val con = graft.ops.Dedup
        .pageRankContracted(pairs, "doc_id", iters = it)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(con == raw, s"iters=$it: contracted $con != raw $raw")
    }
    // a bridge merges the families under CC labels (one irregular
    // component — the documented approximation regime): output still
    // covers all nodes with positive mass
    val bridged = (clique(Seq(1L, 2L, 3L)) ++ clique(Seq(20L, 21L)) ++
      Seq((3L, 20L))).toDF("id_a", "id_b")
    val con = graft.ops.Dedup.pageRankContracted(bridged, "doc_id",
        iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(con.keySet == Set(1L, 2L, 3L, 20L, 21L) &&
      con.values.forall(_ > 0), con)
    // caller-supplied labels keep the families separate — the bridge
    // becomes a real CROSS edge and rank flows from the bigger family
    // into the smaller through the spread-inflow term
    val lab = Seq((1L, 100L), (2L, 100L), (3L, 100L), (20L, 200L),
      (21L, 200L)).toDF("id", "c")
    val conL = graft.ops.Dedup.pageRankContracted(bridged, "doc_id",
        iters = 3, labels = Some(lab))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(conL.keySet == con.keySet && conL.values.forall(_ > 0), conL)
    // family 200 receives cross inflow on top of its own recurrence: its
    // members outrank what an ISOLATED 2-clique would hold
    val iso = graft.ops.Dedup.pageRankContracted(
        (clique(Seq(1L, 2L, 3L)) ++ clique(Seq(20L, 21L)))
          .toDF("id_a", "id_b"), "doc_id", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(conL(20L) > iso(20L),
      s"cross inflow missing: ${conL(20L)} <= ${iso(20L)}")
    spark.catalog.clearCache()
  }

  test("one-permutation signature: codegen == interpreted == the " +
    "published algorithm, including rotation densification") {
    // pure-Scala replay of ophSigData (Li/Owen/Zhang binning +
    // Shrivastava/Li rotation): bin u = (A·h+B) mod P by u mod H, keep
    // the min, borrow clockwise at d·Q for empty bins
    def reference(sh: Seq[Long], h: Int): Seq[Long] = {
      import graft.functions.TextHashing.{OphA, OphB, OphQ, P}
      val mins = Array.fill(h)(Long.MaxValue)
      sh.foreach { x =>
        val u = (OphA * x + OphB) % P
        val bin = (u % h).toInt
        if (u < mins(bin)) mins(bin) = u
      }
      (0 until h).map { j =>
        if (mins(j) != Long.MaxValue) mins(j)
        else {
          val d = (1 until h).find(d => mins((j + d) % h) != Long.MaxValue).get
          mins((j + d) % h) + d.toLong * OphQ
        }
      }
    }
    // short docs (few shingles vs 8 bins) force empty bins, so the
    // densification path is exercised, not just the direct minima
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "alpha beta gamma")   // exactly one 3-shingle -> 7 empty bins
    ).toDF("doc_id", "text")
    def sigs(): Map[Long, Seq[Long]] = df.select($"doc_id",
        graft.functions.TextExprs.ophSig(
          Dedup.shingleHashes($"text", 3), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val codegen = sigs()
    val interpreted = try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      sigs()
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(codegen == interpreted)
    val expected = df.as[(Long, String)].collect().map { case (id, t) =>
      val words = t.split(" ").toSeq
        .map(graft.functions.TextHashing.charHash)
      val sh = words.sliding(3).map(_.foldLeft(0L)((a, w) =>
        (a * 31 + w) % graft.functions.TextHashing.P)).toSeq.distinct
      id -> reference(sh, 8)
    }.toMap
    assert(codegen == expected)
  }

  test("OPH banding: verified-pair parity with the classic signature " +
    "on a near-dup corpus") {
    // 30 near-dup groups of 3 (one word perturbed) + 60 distinct docs:
    // in-group Jaccard is high, cross-group ~0; both pipelines verify
    // with EXACT Jaccard so precision is 1 by construction and only
    // candidate recall can differ between the signature flavors
    val rnd = new scala.util.Random(11)
    val vocab = Vector.tabulate(400)(i => s"w$i")
    def sentence() =
      Seq.fill(14 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    val groups = (0 until 30).flatMap { g =>
      val base = sentence().split(" ")
      (0 until 3).map { v =>
        val words = base.clone()
        words(rnd.nextInt(words.length)) = s"v$v"
        (g * 10L + v, words.mkString(" "))
      }
    }
    val noise = (1000L until 1060L).map(id => (id, sentence()))
    val df = (groups ++ noise).toDF("doc_id", "text")
    def pairSet(p: org.apache.spark.sql.DataFrame) =
      p.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val classic = pairSet(Dedup.minhashLshPairs(df, "doc_id", "text",
      n = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.6))
    val oph = pairSet(Dedup.ophLshPairs(df, "doc_id", "text",
      n = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.6))
    val truth = (0 until 30).flatMap { g =>
      Seq((g * 10L, g * 10L + 1), (g * 10L, g * 10L + 2),
        (g * 10L + 1, g * 10L + 2))
    }.toSet
    // soundness: every emitted pair is a true in-group pair (the
    // exact-Jaccard verify guarantees it; cross-group Jaccard ~0)
    assert(oph.subsetOf(truth), (oph -- truth).take(5))
    assert(classic.subsetOf(truth))
    // recall parity: OPH must find essentially what classic finds
    assert(oph.size >= (classic.size * 0.9).toInt,
      s"oph=${oph.size} classic=${classic.size}")
    spark.catalog.clearCache()
  }

  test("minhash signature null semantics match the column formulation") {
    val df = Seq(
      (1L, Some("one two three four")),
      (2L, Some("")),    // fewer than n words -> empty shingle array
      (3L, None: Option[String])
    ).toDF("doc_id", "text")
    val sig = df.select($"doc_id",
      Dedup.minhashSignature($"text", n = 3, numHashes = 4).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    // doc 1: 4 non-null slots
    assert(sig(1L).forall(_ != null) && sig(1L).size == 4)
    // docs 2 and 3: an array of 4 null slots, NOT a null array
    assert(sig(2L) != null && sig(2L).size == 4 && sig(2L).forall(_ == null))
    assert(sig(3L) != null && sig(3L).size == 4 && sig(3L).forall(_ == null))
  }

  test("crossDedup drops snapshot near-dups, keeps originals and docs " +
    "too short to shingle") {
    val snapshot = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      // near-copy of snapshot doc 1 (one word changed at the tail)
      (10L, "alpha beta gamma delta epsilon zeta eta iota"),
      // genuinely new content
      (11L, "completely different words about other topics entirely"),
      // too short to form a 3-shingle: can match nothing, must survive
      (12L, "hi there")
    ).toDF("doc_id", "text")
    val idx = Dedup.minhashIndex(snapshot, "doc_id", "text",
      n = 3, numHashes = 8, rowsPerBand = 2)
    val kept = Dedup.crossDedup(incoming, idx, "doc_id", "text",
      threshold = 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 12L), s"kept $kept")
    idx.release()
  }

  test("capped simhash pairs: complete at high cap (== the " +
      "entropy-balanced variant == brute force), a subset under a " +
      "tight cap, and hot buckets only ever REMOVE pairs") {
    val docs = (1L to 60L).map { i =>
      // 6 families of shared boilerplate with per-doc tail tokens
      val fam = i % 6
      (i, s"alpha$fam beta$fam gamma$fam delta common words " +
        s"tail${i % 9} x${i % 4}")
    }.toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val complete = pairSet(
      Dedup.simhashBandedPairs(docs, "doc_id", "text", 6))
    // cap >= corpus: nothing is hot, every bucket complete → the fixed
    // contiguous bands find exactly the pigeonhole-complete answer
    val high = pairSet(Dedup.simhashBandedPairsCapped(
      docs, "doc_id", "text", maxDist = 6, maxBucket = 60))
    assert(high == complete, s"high-cap diff: ${high.diff(complete)} / " +
      s"${complete.diff(high)}")
    assert(complete.nonEmpty)
    val tight = pairSet(Dedup.simhashBandedPairsCapped(
      docs, "doc_id", "text", maxDist = 6, maxBucket = 4))
    assert(tight.subsetOf(complete), "capping invented a pair")
    Dedup.releaseCaches()
  }

  test("leakageFreeSplit: no near-dup pair straddles splits; every doc " +
      "assigned; singletons spread across all three splits") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.6)
      .select("id_a", "id_b").cache()
    val split = Dedup.leakageFreeSplit(
      docs.select($"doc_id"), "doc_id", pairs).cache()
    assert(split.count() == docs.count(), "every doc gets a split")
    // THE invariant: both endpoints of every near-dup edge land in the
    // same split — contamination is impossible by construction
    val straddling = pairs
      .join(split.select($"doc_id".as("id_a"), $"split".as("sa")), Seq("id_a"))
      .join(split.select($"doc_id".as("id_b"), $"split".as("sb")), Seq("id_b"))
      .where($"sa" =!= $"sb")
    assert(straddling.isEmpty, s"straddling pairs: ${straddling.head(3).toSeq}")
    val byed = split.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byed.keySet == Set("train", "val", "test"),
      s"splits present: $byed")
    assert(byed("train") > byed("val") && byed("train") > byed("test"),
      s"80/10/10 shape: $byed")
    // stability: re-splitting the same corpus is bit-identical
    val again = Dedup.leakageFreeSplit(
      docs.select($"doc_id"), "doc_id", pairs)
    assert(split.exceptAll(again).isEmpty && again.exceptAll(split).isEmpty)
    pairs.unpersist(); split.unpersist()
    Dedup.releaseCaches()
  }

  test("spread: streaming inputs pass through untouched (no .rdd probe); " +
    "few-partition batch inputs round-robin to default parallelism") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Long]
    val streamDf = src.toDF()
    // .rdd on a streaming plan throws; spread must return it as-is
    val passed = Dedup.spread(streamDf)
    assert(passed.isStreaming)
    assert(passed eq streamDf)
    // batch: 1 input partition on a many-core session spreads out
    val one = spark.range(0, 100, 1, numPartitions = 1).toDF("id")
    val sp = Dedup.spread(one)
    assert(sp.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // and row set is untouched
    assert(sp.agg(sum(col("id"))).head().getLong(0) == 4950L)
  }
}
