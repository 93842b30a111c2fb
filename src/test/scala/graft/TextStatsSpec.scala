package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** The fused single-pass TextStatsExpr must be bit-equal to the
  * composable column formulation it replaces — tokenization edge cases
  * (leading/trailing/mixed whitespace, empty string, unicode, surrogate
  * pairs) and randomized corpora alike, since the DuckDB oracles replay
  * the composable semantics.
  */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private val edge = Seq(
    "", " ", "  ", "a", " a", "a ", " a ", "a  b", "\ta\nb\r", "\f",
    "the of and", "el la de", "der die das", "...", "a.b,c", "12ab34!x",
    "héllo wörld", "a😀b c", "0 1 2", "  the  ", "the", ".,;")
  private val rnd = new scala.util.Random(11)
  private val alphabet = "ab c.1\tZ\n!ö "
  private val random = (1 to 300).map { _ =>
    (1 to rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
      .mkString
  }

  test("text expressions compile under forced whole-stage codegen") {
    import graft.functions.TextExprs
    // fallback off: a broken doGenCode fails the query instead of
    // silently reverting to interpreted eval
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq((1L, "a b c d e"), (2L, null.asInstanceOf[String]))
        .toDF("id", "text")
      val rows = df.select(
        TextAnalysis.stats($"text").as("st"),
        TextExprs.charHash($"text").as("ch"),
        TextExprs.simhash($"text").as("sh"),
        TextExprs.shingleHashes($"text", 3).as("shh"),
        TextExprs.shingleStrings($"text", 3).as("shs"),
        TextExprs.minhashSig(TextExprs.shingleHashes($"text", 3), 4)
          .as("sig"),
        TextExprs.ophSig(TextExprs.shingleHashes($"text", 3), 4)
          .as("osig")).collect()
      assert(rows.length == 2)
      val r = rows.find(!_.isNullAt(1)).get
      assert(r.getAs[Long]("ch") ==
        graft.functions.TextHashing.charHash("a b c d e"))
      assert(r.getSeq[Long](r.fieldIndex("sig")).length == 4)
      assert(r.getSeq[Long](r.fieldIndex("osig")).length == 4)
      // null text: stats/hashes null, minhash sig = 4 null slots
      val n = rows.find(_.isNullAt(1)).get
      assert(n.getSeq[Any](n.fieldIndex("sig")).forall(_ == null))
      assert(n.getSeq[Any](n.fieldIndex("osig")).forall(_ == null))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("fused stats equal the composable formulation on every column") {
    val sw = TextAnalysis.langLexicons.head._2
    val df = (edge ++ random).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select($"id", $"text", TextAnalysis.stats($"text").as("st"))
    val rows = df.select(
      // composable
      TextAnalysis.tokenCount($"text").as("c_nt"),
      TextAnalysis.meanTokenLen($"text").as("c_mtl"),
      TextAnalysis.punctRatio($"text").as("c_pr"),
      TextAnalysis.stopwordRatio($"text", sw).as("c_sr"),
      TextAnalysis.qualityScore($"text", sw).as("c_q"),
      size(TextAnalysis.bpeTokens($"text")).as("c_bpe"),
      TextAnalysis.langId($"text").as("c_lang"),
      length($"text").as("c_len"),
      // fused
      TextAnalysis.tokenCountOf($"st").as("f_nt"),
      TextAnalysis.meanTokenLenOf($"st").as("f_mtl"),
      TextAnalysis.punctRatioOf($"st").as("f_pr"),
      TextAnalysis.stopwordRatioOf($"st").as("f_sr"),
      TextAnalysis.qualityScoreOf($"st").as("f_q"),
      TextAnalysis.bpeTokenCountOf($"st").as("f_bpe"),
      TextAnalysis.langIdOf($"st").as("f_lang"),
      $"st".getField("n_chars").as("f_len"),
      $"text")
    rows.collect().foreach { r =>
      val t = r.getAs[String]("text")
      assert(r.getAs[Int]("c_nt") == r.getAs[Int]("f_nt"), s"n_tokens [$t]")
      assert(r.getAs[Double]("c_mtl") == r.getAs[Double]("f_mtl"), s"mtl [$t]")
      assert(r.getAs[Double]("c_pr") == r.getAs[Double]("f_pr"), s"pr [$t]")
      assert(r.getAs[Double]("c_sr") == r.getAs[Double]("f_sr"), s"sr [$t]")
      assert(r.getAs[Double]("c_q") == r.getAs[Double]("f_q"), s"q [$t]")
      assert(r.getAs[Int]("c_bpe") == r.getAs[Int]("f_bpe"), s"bpe [$t]")
      assert(r.getAs[String]("c_lang") == r.getAs[String]("f_lang"), s"lang [$t]")
      assert(r.getAs[Int]("c_len") == r.getAs[Int]("f_len"), s"len [$t]")
    }
  }

  test("lexicon probing: >7-byte and non-ASCII lexicon words hit exactly " +
      "(the packed-Long fast path covers ≤7 UTF-8 bytes; longer words " +
      "take the byte-compare fallback)") {
    import graft.functions.TextExprs
    // "therefore" = 9 ASCII bytes (fallback); "tötö" = 6 UTF-8 bytes
    // (packed path, multi-byte chars); "straßenbahn" = 12 bytes
    val lex = Seq(Seq("therefore", "tötö", "a"),
      Seq("straßenbahn", "of"))
    val df = Seq(
      (1L, "therefore tötö a thereford straßenbahn of"),
      (2L, "THEREFORE x"), // case-sensitive: no hit
      (3L, "")).toDF("id", "text")
    val got = df.select($"id",
        TextExprs.textStats($"text", lex).getField("lex_hits").as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L) == Seq(3, 2), got(1L))
    assert(got(2L) == Seq(0, 0))
    assert(got(3L) == Seq(0, 0)) // the empty-string token matches nothing
  }

  test("heuristicKeep: the one-pass gate expression equals the composable " +
      "annotate-then-filter formulation on every threshold/lang/gopher " +
      "combination") {
    val df = (edge ++ random ++ Seq(
      // gopher-boundary rows: exactly 50 words, alpha-share and
      // stopword-count extremes
      Seq.fill(50)("the").mkString(" "),
      (1 to 50).map(_.toString).mkString(" "),
      Seq.fill(49)("word").mkString(" ") + " the",
      ("the be " + Seq.fill(48)("abc").mkString(" "))))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val st = TextAnalysis.stats($"text")
    val annotated = df.select($"id", $"text",
      TextAnalysis.tokenCountOf(st).as("n_tokens"),
      TextAnalysis.qualityScoreOf(st).as("quality"),
      TextAnalysis.langIdOf(st).as("pred_lang"))
    val cases = Seq(
      (0, 1 << 20, 0.0, Nil, false),
      (1, 10, 0.2, Nil, false),
      (0, 1 << 20, 0.35, Seq("en", "de"), false),
      (0, 1 << 20, 0.0, Nil, true),
      (2, 60, 0.1, Seq("en"), true))
    for ((minT, maxT, minQ, langs, gopher) <- cases) {
      var composable = annotated
        .where($"n_tokens" >= minT && $"n_tokens" <= maxT &&
          $"quality" >= minQ)
      if (langs.nonEmpty)
        composable = composable.where($"pred_lang".isin(langs: _*))
      if (gopher)
        composable = composable.where(TextAnalysis.gopherKeepExpr($"text"))
      val fused = df.where(TextAnalysis.heuristicKeep($"text",
        minT, maxT, minQ, langs, gopher))
      val want = composable.select($"id").collect().map(_.getLong(0)).toSet
      val got = fused.select($"id").collect().map(_.getLong(0)).toSet
      assert(got == want,
        s"case ($minT,$maxT,$minQ,$langs,$gopher): " +
          s"only-fused=${got -- want} only-composable=${want -- got}")
    }
  }

  test("unigramSurprisal: exact integer bit-length surprise, hand-checked") {
    // corpus freqs: a=3 (bitlen 2 -> surp 40-(2-1)=39), b=1, c=1
    // (bitlen 1 -> surp 40). Integer arithmetic means the sums are exact.
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val byDoc = TextAnalysis.unigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: surp(a)=39 twice + surp(b)=40 -> 118 over 3 tokens
    assert(byDoc(1L) == ((3L, 118L, 118.0 / 3.0)))
    // doc 2: surp(a)=39 + surp(c)=40 -> 79 over 2 tokens
    assert(byDoc(2L) == ((2L, 79L, 79.0 / 2.0)))
    // monotonicity: corpus-frequent tokens carry strictly less surprise
    val freqHeavy = Seq((1L, Seq.fill(64)("the").mkString(" ")),
      (2L, "rare")).toDF("doc_id", "text")
    val m = TextAnalysis.unigramSurprisal(freqHeavy, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(m(2L) > m(1L))
  }

  test("bm25TopK: rare-term doc outranks common-term doc; non-matching " +
      "docs never score; exact integer values") {
    // 4 docs: 'rare' appears only in doc 1; 'common' in three docs.
    // N=4 (bitlen 3), df(rare)=1 (bitlen 1) -> idf_bits 2;
    // df(common)=3 (bitlen 2) -> idf_bits 1.
    val df = Seq(
      (1L, "rare x x x"), (2L, "common x x x"),
      (3L, "common x x x"), (4L, "common y y y")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(df, "doc_id", "text",
        terms = Seq("rare", "common"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // doc 5-absent: only matching docs appear
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L, 4L))
    val score = got.toMap
    // identical tf/dl, higher idf: rare wins; equal-score commons tie
    assert(score(1L) == 2L * score(2L), score)
    assert(score(2L) == score(3L) && score(3L) == score(4L), score)
    // hand value: tf=1, dl=4, N=4, T=16:
    // tfn = (100000*220*16) div (100*16 + 30*16 + 90*4*4) = 352000000 div 3520
    //     = 100000; score(common doc) = 1 * 100000
    assert(score(2L) == 100000L, score)
    // ranking: doc 1 first (desc score, then id)
    assert(got.head._1 == 1L)
  }

  test("Aho–Corasick blocklist: every overlapping occurrence counted; " +
      "fail links cross pattern boundaries; op totals are exact") {
    val ac = new graft.functions.AcAutomaton(
      Array("he", "she", "his", "hers"))
    // the textbook fixture: "ushers" contains she, he (inside shers),
    // hers — and his not at all
    assert(ac.countHits("ushers").toSeq == Seq(1L, 1L, 0L, 1L))
    val ov = new graft.functions.AcAutomaton(Array("a", "aa"))
    assert(ov.countHits("aaa").toSeq == Seq(3L, 2L), "overlaps count")
    val nest = new graft.functions.AcAutomaton(
      Array("table", "tab", "able"))
    assert(nest.countHits("a table!").toSeq == Seq(1L, 1L, 1L),
      "nested patterns all fire from one pass")
    assert(nest.countHits("").toSeq == Seq(0L, 0L, 0L))
    // scrub: the union of matched spans disappears, overlaps merge
    val sc = new graft.functions.AcAutomaton(Array("she", "ell"))
    assert(sc.scrub("she sells") == " ss",
      s"got '${sc.scrub("she sells")}'")
    assert(ov.scrub("aaa") == "", "total cover scrubs to empty")
    assert(sc.scrub("clean") == "clean", "no match → untouched")
    val op = graft.ops.TextAnalysis.blocklistScrub(
      Seq((1L, "she sells")).toDF("doc_id", "text"), "doc_id", "text",
      Seq("she", "ell")).head()
    assert(op.getString(1) == " ss" && op.getLong(2) == 6L)
    // the DataFrame op (codegen path): totals and distinct-fired counts
    val df = Seq((1L, "she sells seashells"), (2L, "nothing")).toDF(
      "doc_id", "text")
    val got = graft.ops.TextAnalysis.blocklistStats(df, "doc_id", "text",
      Seq("he", "she", "sell")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // she: "she" + "seashells"→... "she" occurs in "she" and inside
    // "seashells" (sea-SHE-lls); he inside both shes; sell once
    assert(got(1L) == ((5L, 3L)), got)
    assert(got(2L) == ((0L, 0L)), got)
  }

  test("dsirSelect: importance = raw_bits − tgt_bits exactly; " +
      "target-like docs rank first") {
    // corpus: d1 is pure target-style, d2 mixes, d3 is foreign
    val corpus = Seq((1L, "s t s t"), (2L, "s t u"), (3L, "x y x"))
      .toDF("doc_id", "text")
    val target = Seq((100L, "s t s t")).toDF("doc_id", "text")
    val got = TextAnalysis.dsirSelect(corpus, target, "doc_id", "text",
      quota = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    // hand arithmetic: raw LM bf(s,t)=3 cf(s)=3, bf(t,s)=1 cf(t)=2,
    // bf(t,u)=1, bf(x,y)=1 cf(x)=1, bf(y,x)=1 cf(y)=1; target LM
    // bf(s,t)=2 cf(s)=2, bf(t,s)=1 cf(t)=1.
    // d1: raw 0+1+0=1, tgt 0+0+0=0 → +1
    // d2: raw 0+1=1, tgt 0+(bitlen(1)+1)=2 → −1
    // d3: raw 0, tgt 32+32=64 → −64 (cut by quota)
    assert(got.toSeq == Seq((1L, 3L, 1L), (2L, 2L, -1L)), got.toSeq)
  }

  test("rrfFuse: integer reciprocal-rank scores, one-sided docs keep " +
      "their single contribution, deterministic tie-break") {
    val a = Seq((10L, 5L), (11L, 3L), (12L, 1L)).toDF("doc_id", "score")
    val b = Seq((11L, 0.9), (13L, 0.8)).toDF("doc_id", "cos")
    val got = TextAnalysis.rrfFuse(
      a, Seq(col("score").desc, col("doc_id")),
      b, Seq(col("cos").desc, col("doc_id")),
      "doc_id", k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    // ranks: a → 10:1, 11:2, 12:3; b → 11:1, 13:2
    // 11: 1000000/62 + 1000000/61 = 16129 + 16393 = 32522
    // 10: 16393; 13: 16129; 12: 15873
    assert(got.toSeq == Seq((11L, 32522L), (10L, 16393L),
      (13L, 16129L), (12L, 15873L)), got.toSeq)
  }

  test("packSequences: per-shard offsets are a gap-free concatenation, " +
      "cut coordinates consistent, straddlers span the right count") {
    import spark.implicits._
    val docs = (1L to 40L).map { i =>
      (i, if (i % 2 == 0) "a" else "b", ("w " * (i % 13 + 1).toInt).trim)
    }.toDF("doc_id", "source", "text")
    val packed = graft.ops.TextAnalysis
      .packSequences(docs, "doc_id", "text", "source", seqLen = 10L)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("start_seq"), r.getAs[Long]("start_off"),
        r.getAs[Long]("n_seqs")))
    assert(packed.length == 40)
    for (shard <- Seq("a", "b")) {
      val rows = packed.filter(_._1 == shard)
        .sortBy(t => t._3 * 10 + t._4) // global token offset
      // gap-free: each doc starts exactly where the previous one ended
      var off = 0L
      for ((_, n, seq, so, ns) <- rows) {
        assert(seq == off / 10 && so == off % 10,
          s"$shard: expected offset $off, got seq=$seq off=$so")
        assert(ns == (off + n - 1) / 10 - off / 10 + 1,
          s"$shard: span wrong for n=$n at $off")
        off += n
      }
      // totals: last end == sum of tokens; at least one doc straddles
      assert(off == rows.map(_._2).sum)
      assert(rows.exists(_._5 > 1), "fixture should contain a straddler")
    }

    // the loader manifest: every sequence except a shard's last is
    // exactly full, every doc's slices tile [0, n_tokens) gap-free
    val manifest = graft.ops.TextAnalysis
      .sequenceManifest(docs, "doc_id", "text", "source", seqLen = 10L)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("take_from"),
        r.getAs[Long]("take_n")))
    for (shard <- Seq("a", "b")) {
      val m = manifest.filter(_._1 == shard)
      val bySeq = m.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
      val last = bySeq.keys.max
      for ((seq, tok) <- bySeq)
        assert(seq == last || tok == 10L, s"$shard seq $seq holds $tok")
      val byDoc = m.groupBy(_._3)
      for ((doc, slices) <- byDoc) {
        val sorted = slices.sortBy(_._4)
        assert(sorted.head._4 == 0L, s"doc $doc starts at nonzero")
        sorted.sliding(2).filter(_.length == 2).foreach { w =>
          assert(w(0)._4 + w(0)._5 == w(1)._4, s"doc $doc slice gap")
        }
        // fully consumed: slices sum to the doc's token count
        assert(sorted.map(_._5).sum == doc % 13 + 1,
          s"doc $doc not fully consumed")
      }
    }
  }

  test("epochOrder: a bijection over each shard's sequence space, " +
      "distinct across epochs, deterministic within one") {
    import graft.ops.TextAnalysis
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val packed = TextAnalysis.packSequences(docs, "doc_id", "text",
      "source", seqLen = 256L)
    val counts = TextAnalysis.shardSeqCounts(packed, "source").cache()
    def order(epoch: Long): Map[(String, Long), Long] =
      TextAnalysis.epochOrder(counts, "source", epoch)
        .select($"source", $"seq", $"epoch_pos").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val e1 = order(1L)
    // bijection: per shard, epoch positions are exactly 0..n-1
    e1.keys.groupBy(_._1).foreach { case (shard, ks) =>
      val ps = ks.map(e1).toSeq.sorted
      assert(ps == (0L until ps.size.toLong), s"shard $shard not a " +
        "permutation")
    }
    // epochs reorder; re-running an epoch does not
    val e2 = order(2L)
    assert(e1 != e2, "epochs 1 and 2 must differ")
    assert(order(1L) == e1, "same epoch, same order")
    counts.unpersist()
    ()
  }
}
