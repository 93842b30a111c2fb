package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text shingling expressions.
  *
  * Semantics are EXACTLY the composable-column formulation (split on a
  * single space, per-word polynomial code-point hash mod 1e9+7, n-window
  * combine h = (h*31 + wordHash) mod P, first-occurrence distinct) — the
  * same arithmetic the DuckDB oracles reproduce — but evaluated in one
  * tight JVM loop per row instead of nested interpreted lambdas
  * (~50× on the 5k-doc corpus).
  */
object TextHashing {
  val P: Long = 1000000007L

  def wordHash(w: String): Long = {
    var h = 0L
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      h = (h * 31L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  def shingleHashes(text: String, n: Int): Array[Long] = {
    val words = text.split(" ", -1)
    if (words.length < n) return Array.emptyLongArray
    val wh = new Array[Long](words.length)
    var i = 0
    while (i < words.length) { wh(i) = wordHash(words(i)); i += 1 }
    val seen = new mutable.LinkedHashSet[Long]
    i = 0
    while (i <= words.length - n) {
      var h = 0L
      var k = 0
      while (k < n) { h = (h * 31L + wh(i + k)) % P; k += 1 }
      seen.add(h)
      i += 1
    }
    seen.toArray
  }

  /** 63-bit SimHash, identical arithmetic to the composable formulation
    * (word split on single space, per-word polynomial code-point hash mod
    * 4611686018427387847, per-bit ±1 votes, sign bits).
    */
  def simhash(text: String): Long = {
    val M = 4611686018427387847L
    val words = text.split(" ", -1)
    val votes = new Array[Int](63)
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      var h = 0L
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        h = (h * 131L + cp) % M
        i += Character.charCount(cp)
      }
      var j = 0
      while (j < 63) {
        if ((h & (1L << j)) != 0L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      wi += 1
    }
    var sig = 0L
    var j = 0
    while (j < 63) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** Rolling polynomial char hash, identical arithmetic to the composable
    * `aggregate(regexp_extract_all(text, '.'), 0, (acc, c) ->
    * (acc*31 + ascii(c)) % P)` formulation the DuckDB oracles replay:
    * fold over code points, skipping newlines (`.` matches any char
    * except \n in both Java regex and RE2).
    */
  def charHash(text: String): Long = {
    var h = 0L
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (cp != '\n') h = (h * 31L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    * MOSS algorithm; public): the sorted-distinct set of sliding-window
    * minima over the k-char-gram rolling hashes. Any substring shared by
    * two documents with length ≥ k + w − 1 contributes AT LEAST one
    * common fingerprint to both (the window minimum is content-defined,
    * so both docs select the same gram inside the shared span) — the
    * guarantee that makes fingerprint equality a complete candidate
    * filter for long verbatim overlap.
    *
    * Gram hash arithmetic is the repo-standard polynomial fold
    * ((acc*31 + code) mod P) over the gram's code points, evaluated as a
    * TRUE rolling hash (subtract the outgoing char's base^(k−1) term,
    * shift, add the incoming char) — O(len) per doc; window minima via a
    * monotonic deque — O(len) total, not O(len·w). Code-point iteration,
    * so supplementary chars hash as one unit exactly like [[charHash]].
    * Returns empty when the doc has fewer than k code points; when there
    * are grams but fewer than w of them, the single minimum over all
    * grams (every doc with any gram yields ≥ 1 fingerprint).
    */
  /** Rolling k-gram hashes over a code-point array — the ONE copy of the
    * gram arithmetic [[winnow]] and [[winnowPos]] (and their oracles)
    * must agree on: hash of gram i = polynomial fold ((acc*31 + cp) mod
    * P) over cps[i, i+k), computed rolling (subtract the outgoing
    * cp·31^(k−1) term, shift, add the incoming cp). Empty when fewer
    * than k code points.
    */
  private def gramHashes(cps: Array[Int], k: Int): Array[Long] = {
    val nGrams = cps.length - k + 1
    if (nGrams <= 0) return Array.emptyLongArray
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk = (bk * 31L) % P; i += 1 }
    val grams = new Array[Long](nGrams)
    var h = 0L
    i = 0
    while (i < k) { h = (h * 31L + cps(i)) % P; i += 1 }
    grams(0) = h
    i = 1
    while (i < nGrams) {
      h = (h - (cps(i - 1) * bk) % P + P) % P
      h = (h * 31L + cps(i + k - 1)) % P
      grams(i) = h
      i += 1
    }
    grams
  }

  def winnow(text: String, k: Int, w: Int): Array[Long] = {
    // code points first: rolling over chars would split surrogate pairs
    val grams = gramHashes(text.codePoints().toArray, k)
    val nGrams = grams.length
    if (nGrams == 0) return Array.emptyLongArray
    val seen = new java.util.TreeSet[java.lang.Long]
    var i = 0
    if (nGrams < w) {
      var mn = grams(0)
      i = 1
      while (i < nGrams) { if (grams(i) < mn) mn = grams(i); i += 1 }
      seen.add(mn)
    } else {
      // monotonic deque of gram indices, front = current window minimum
      val dq = new Array[Int](nGrams)
      var head = 0
      var tail = 0 // exclusive
      i = 0
      while (i < nGrams) {
        while (tail > head && grams(dq(tail - 1)) >= grams(i)) tail -= 1
        dq(tail) = i; tail += 1
        if (dq(head) <= i - w) head += 1
        if (i >= w - 1) seen.add(grams(dq(head)))
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** Position-annotated winnowing: the (fingerprint, gram index) pairs
    * the window minima select, ascending by position — the building
    * block for SPAN-level dedup (locate and excise a duplicated run
    * instead of dropping the whole doc). Selection is the LEFTMOST
    * minimum per window (deterministic and replayable in SQL via
    * list_indexof, which is first-occurrence); [[winnow]]'s value set is
    * selection-rule-independent, so the two stay consistent.
    */
  def winnowPos(text: String, k: Int, w: Int): Array[(Long, Long)] = {
    val grams = gramHashes(text.codePoints().toArray, k)
    val nGrams = grams.length
    if (nGrams == 0) return Array.empty
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)]
    var i = 0
    if (nGrams < w) {
      var mn = grams(0); var mi = 0
      i = 1
      while (i < nGrams) { if (grams(i) < mn) { mn = grams(i); mi = i }; i += 1 }
      out += ((mn, mi.toLong))
    } else {
      // monotonic deque; STRICT > popping keeps the earliest equal
      // minimum at the head (leftmost selection)
      val dq = new Array[Int](nGrams)
      var head = 0
      var tail = 0
      var lastPos = -1
      i = 0
      while (i < nGrams) {
        while (tail > head && grams(dq(tail - 1)) > grams(i)) tail -= 1
        dq(tail) = i; tail += 1
        if (dq(head) <= i - w) head += 1
        if (i >= w - 1 && dq(head) != lastPos) {
          lastPos = dq(head)
          out += ((grams(lastPos), lastPos.toLong))
        }
        i += 1
      }
    }
    out.toArray
  }

  def shingleStrings(text: String, n: Int): Array[String] = {
    val words = text.split(" ", -1)
    if (words.length < n) return Array.empty
    val seen = new mutable.LinkedHashSet[String]
    var i = 0
    while (i <= words.length - n) {
      val sb = new java.lang.StringBuilder(words(i))
      var k = 1
      while (k < n) { sb.append(' ').append(words(i + k)); k += 1 }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray
  }

  // ---- Java-callable codegen entry points (Scala objects emit static
  // ---- forwarders, so generated Java calls these directly) ----

  def charHashU(s: UTF8String): Long = charHash(s.toString)

  def simhashU(s: UTF8String): Long = simhash(s.toString)

  def shingleHashData(s: UTF8String, n: Int): GenericArrayData =
    new GenericArrayData(shingleHashes(s.toString, n))

  def shingleStringData(s: UTF8String, n: Int): GenericArrayData =
    new GenericArrayData(
      shingleStrings(s.toString, n).map(UTF8String.fromString): Array[Any])

  def winnowData(s: UTF8String, k: Int, w: Int): GenericArrayData =
    new GenericArrayData(winnow(s.toString, k, w))

  def winnowPosData(s: UTF8String, k: Int, w: Int): GenericArrayData =
    new GenericArrayData(winnowPos(s.toString, k, w).map { case (fp, pos) =>
      org.apache.spark.sql.catalyst.InternalRow(fp, pos)
    }: Array[Any])

  /** Content-defined chunking (the rsync/LBFS/restic boundary rule): a
    * chunk boundary falls after code point i+k−1 whenever the rolling
    * hash of the k-gram ending there is ≡ 0 (mod `modulus`) — so
    * boundaries are a pure LOCAL function of the content, and an edit
    * anywhere re-chunks only the window it touches: every boundary
    * past the first one clear of the edit realigns, which is what makes
    * chunk-level dedup robust to prefix/infix edits where fixed-size
    * blocks lose alignment forever. Expected chunk ≈ modulus + k − 1
    * chars. Same [[gramHashes]] arithmetic as winnowing — O(len),
    * rolling. The trailing remainder is always its own chunk; chunks
    * concatenate back to the input exactly. (Production CDC adds
    * min/max chunk clamps — a sequential variant of the same scan —
    * omitted here to keep boundaries stateless and SQL-replayable.)
    */
  def cdcChunks(text: String, k: Int, modulus: Int): Array[String] = {
    val cps = text.codePoints().toArray
    if (cps.length == 0) return Array.empty
    val grams = gramHashes(cps, k)
    val cutsB = Array.newBuilder[Int] // exclusive code-point end index
    var i = 0
    while (i < grams.length) {
      if (grams(i) % modulus == 0) {
        val end = i + k
        if (end < cps.length) cutsB += end
      }
      i += 1
    }
    chunksFromCuts(cps, cutsB.result())
  }

  /** Materialize chunks from internal cut positions (exclusive
    * code-point ends, ascending) plus the implicit final cut — the one
    * copy of the reassembly both chunkers share.
    */
  private def chunksFromCuts(cps: Array[Int],
      internalCuts: Array[Int]): Array[String] = {
    val cuts = internalCuts :+ cps.length
    val out = new Array[String](cuts.length)
    var start = 0
    var j = 0
    while (j < cuts.length) {
      out(j) = new String(cps, start, cuts(j) - start)
      start = cuts(j)
      j += 1
    }
    out
  }

  def cdcChunksData(s: UTF8String, k: Int, modulus: Int): GenericArrayData =
    new GenericArrayData(
      cdcChunks(s.toString, k, modulus)
        .map(UTF8String.fromString): Array[Any])

  /** [[cdcChunks]] with production chunk-size clamps (LBFS §3.2): a
    * boundary only cuts once the current chunk reaches `minLen`
    * (suppressing pathological slivers when boundary grams cluster),
    * and a cut is FORCED at `maxLen` (bounding the no-boundary tail).
    * The clamp makes the scan sequential (each decision depends on the
    * previous cut), still O(len); with minLen = 1 and a huge maxLen it
    * equals the stateless form exactly. Clamped boundaries stay
    * content-local: an edit's influence ends at the first unsuppressed
    * boundary past it plus at most one maxLen window.
    */
  def cdcChunksClamped(text: String, k: Int, modulus: Int, minLen: Int,
      maxLen: Int): Array[String] = {
    require(minLen >= 1 && maxLen >= minLen,
      s"need 1 <= minLen <= maxLen, got $minLen..$maxLen")
    val cps = text.codePoints().toArray
    if (cps.length == 0) return Array.empty
    val grams = gramHashes(cps, k)
    val cutsB = Array.newBuilder[Int]
    var start = 0
    var e = 1 // exclusive end candidate
    while (e < cps.length) {
      val len = e - start
      val gi = e - k // the gram ending exactly at e
      val isBoundary = gi >= 0 && gi < grams.length &&
        grams(gi) % modulus == 0
      if (len >= maxLen || (len >= minLen && isBoundary)) {
        cutsB += e
        start = e
      }
      e += 1
    }
    chunksFromCuts(cps, cutsB.result())
  }

  def cdcChunksClampedData(s: UTF8String, k: Int, modulus: Int,
      minLen: Int, maxLen: Int): GenericArrayData =
    new GenericArrayData(
      cdcChunksClamped(s.toString, k, modulus, minLen, maxLen)
        .map(UTF8String.fromString): Array[Any])

  def minhashAllNull(numHashes: Int): GenericArrayData =
    new GenericArrayData(new Array[Any](numHashes))

  /** MinHash slots over an ArrayData of (possibly null) shingle hashes;
    * null/empty/all-null input handled by the caller via
    * [[minhashAllNull]] or here (all-null slots back).
    */
  def minhashSigData(
      arr: org.apache.spark.sql.catalyst.util.ArrayData,
      numHashes: Int): GenericArrayData = {
    val m = arr.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var j = 0
    while (j < m) {
      if (!arr.isNullAt(j)) {
        any = true
        val h = arr.getLong(j)
        var i = 0
        while (i < numHashes) {
          val v = ((2L * i + 1L) * h + 7919L * i + 13L) % P
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!any) minhashAllNull(numHashes)
    else new GenericArrayData(mins)
  }

  // One-permutation-hashing constants: the single universal rehash
  // (decorrelates bin routing from the raw shingle values) and the
  // densification offset step. All arithmetic stays in [0, P·OphA + OphB]
  // ≪ Long.MaxValue, so the oracle replays it exactly in BIGINT.
  val OphA: Long = 1299721L
  val OphB: Long = 104729L
  val OphQ: Long = 7919L

  /** One-permutation MinHash signature (Li, Owen & Zhang, NIPS 2012) with
    * rotation densification (Shrivastava & Li, ICML 2014): each shingle
    * hash is rehashed ONCE — u = (OphA·h + OphB) mod P — routed to bin
    * u mod H, and each bin keeps its minimum u; an empty bin j borrows
    * the first non-empty bin clockwise ((j+d) mod H, smallest d ≥ 1) at
    * offset penalty d·OphQ so different borrow distances cannot
    * spuriously collide. ONE hash evaluation per shingle instead of
    * classic MinHash's H — the hashing pass drops from O(n·H) to O(n) at
    * corpus scale — while the signature LSH-bands exactly like the
    * classic one. Deterministic; all-null signature for null/empty input
    * (the [[minhashAllNull]] contract).
    */
  def ophSigData(
      arr: org.apache.spark.sql.catalyst.util.ArrayData,
      numHashes: Int): GenericArrayData = {
    val m = arr.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var j = 0
    while (j < m) {
      if (!arr.isNullAt(j)) {
        any = true
        val h = arr.getLong(j)
        val u = (OphA * h + OphB) % P
        val bin = (u % numHashes).toInt
        if (u < mins(bin)) mins(bin) = u
      }
      j += 1
    }
    if (!any) minhashAllNull(numHashes)
    else {
      val out = new Array[Long](numHashes)
      var i = 0
      while (i < numHashes) {
        if (mins(i) != Long.MaxValue) out(i) = mins(i)
        else {
          var d = 1
          while (mins((i + d) % numHashes) == Long.MaxValue) d += 1
          out(i) = mins((i + d) % numHashes) + d.toLong * OphQ
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** Single-pass text statistics: every raw count the ts1/ts2/ts3/ts6
  * text-analysis family needs, in ONE scan of the string — replacing up
  * to 8 re-evaluations of `split("\\s+")` plus interpreted filter/
  * aggregate lambdas per row. Semantics replicate the built-in column
  * formulation EXACTLY (so existing DuckDB oracles still match):
  *
  *  - tokens = Java `split("\\s+", -1)`: segments between maximal ASCII
  *    whitespace runs, with a leading empty token when the text starts
  *    with whitespace, a trailing one when it ends with it, and `[""]`
  *    for the empty string;
  *  - n_chars counts code points (Spark's `length`); token lengths too;
  *  - n_punct counts code points outside [A-Za-z0-9] and ASCII
  *    whitespace (the `[^A-Za-z0-9\s]` per-char regex);
  *  - n_bpe counts maximal letter runs + digit runs + single other
  *    non-whitespace chars (the `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`
  *    alternation's greedy scan);
  *  - lex_hits(i) counts tokens contained in `lexicons(i)` (the
  *    `filter(tokens, array_contains(...))` count).
  */
case class TextStatsExpr(child: Expression, lexicons: Seq[Seq[String]])
    extends UnaryExpression {

  @transient private lazy val packed: TextScan.PackedLexicons =
    TextScan.packLexicons(lexicons)

  /** codegen entry point (the expression instance rides into the
    * generated class as a reference object so the lexicon sets come
    * along)
    */
  def compute(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow =
    nullSafeEval(s).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textStatsExpr", this,
      classOf[TextStatsExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override def dataType: DataType = TextStatsExpr.statsType
  override def prettyName: String = "text_stats"

  // One pass over the raw UTF-8 BYTES — no String decode, no per-token
  // substring allocation, no codePointCount re-scan. Code points are
  // counted at their lead byte ((b & 0xC0) != 0x80); the whitespace /
  // letter / digit classes are pure-ASCII by the semantics above, so a
  // non-ASCII lead byte is always a punct code point and never a token
  // boundary. Byte-exact with the previous String formulation on any
  // valid UTF-8 input (TextStatsSpec pins the fused == composable
  // equality; the ts1–ts4 oracles pin it against DuckDB).
  override protected def nullSafeEval(v: Any): Any = {
    val c = TextScan.scan(v.asInstanceOf[UTF8String].getBytes, packed)
    org.apache.spark.sql.catalyst.InternalRow(
      c.nTokens, c.sumLen, c.nPunct, c.nChars, c.nBpe,
      new GenericArrayData(c.lexHits))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextStatsExpr {
  /** The stats struct type — exposed so a caller building a
    * CommonExpressionRef over a still-unresolved stats column can state
    * the ref's type without asking the unresolved child.
    */
  val statsType: StructType = new StructType()
    .add("n_tokens", IntegerType, nullable = false)
    .add("sum_tok_len", LongType, nullable = false)
    .add("n_punct", IntegerType, nullable = false)
    .add("n_chars", IntegerType, nullable = false)
    .add("n_bpe", IntegerType, nullable = false)
    .add("lex_hits", ArrayType(IntegerType, containsNull = false),
      nullable = false)
}

/** The shared byte-level text scan behind [[TextStatsExpr]] and
  * [[HeuristicGateExpr]] — ONE pass over the raw UTF-8 bytes, no String
  * decode, no per-token substring allocation, no codePointCount re-scan.
  *
  * Semantics replicate the composable column formulation EXACTLY (so the
  * DuckDB oracles replay them):
  *  - tokens = Java `split("\\s+", -1)`: segments between maximal ASCII
  *    whitespace runs, with a leading empty token when the text starts
  *    with whitespace, a trailing one when it ends with it, and `[""]`
  *    for the empty string;
  *  - code points are counted at their lead byte ((b & 0xC0) != 0x80);
  *    the whitespace / letter / digit classes are pure-ASCII, so a
  *    non-ASCII lead byte is always a punct code point and never a token
  *    boundary;
  *  - n_punct counts code points outside [A-Za-z0-9] and ASCII
  *    whitespace (the `[^A-Za-z0-9\s]` per-char regex);
  *  - n_bpe counts maximal letter runs + digit runs + single other
  *    non-whitespace chars (the `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`
  *    alternation's greedy scan);
  *  - lexHits(i) counts tokens contained in lexicon i (exact string
  *    equality — see [[TextScan.packLexicons]]);
  *  - nAlpha counts tokens containing at least one ASCII letter (the
  *    `rlike("[A-Za-z]")` token filter of the Gopher rules).
  */
private[graft] object TextScan {
  /** Lexicon words prepared for allocation-free byte-level probing: a
    * word of <= 7 UTF-8 bytes packs losslessly into one Long (length tag
    * in the top byte, bytes little-endian below — the tag makes "ab" !=
    * "ab\u0000"), probed with a binary search over a sorted Long[];
    * rarer longer words fall back to exact byte-wise comparison. Both
    * paths are EXACT string equality (UTF-8 is injective), identical to
    * Set[String].contains on the decoded token.
    */
  final case class PackedLexicons(
      short: Array[Array[Long]],
      long: Array[Array[Array[Byte]]],
      anyLong: Boolean) {
    def n: Int = short.length
  }

  def packLexicons(lexicons: Seq[Seq[String]]): PackedLexicons = {
    val shortW = lexicons.map { lex =>
      lex.iterator
        .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .filter(_.length <= 7)
        .map { w =>
          var p = w.length.toLong << 56
          var k = 0
          while (k < w.length) { p |= (w(k) & 0xFFL) << (8 * k); k += 1 }
          p
        }
        .toArray.sorted
    }.toArray
    val longW = lexicons.map(_.iterator
      .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .filter(_.length > 7).toArray).toArray
    PackedLexicons(shortW, longW, longW.exists(_.nonEmpty))
  }

  final class Counts(nLex: Int) {
    var nTokens = 0
    var sumLen = 0L
    var nPunct = 0
    var nChars = 0
    var nBpe = 0
    var nAlpha = 0
    val lexHits = new Array[Int](nLex)
  }

  def scan(bytes: Array[Byte], lex: PackedLexicons): Counts = {
    val n = bytes.length
    val c = new Counts(lex.n)
    val lexShort = lex.short
    val lexLongWords = lex.long

    var start = 0       // current token start (byte index)
    var inWs = false    // inside a whitespace run
    var bpeRun = 0      // 0 = none, 1 = letter run, 2 = digit run

    def emitToken(st: Int, end: Int): Unit = {
      c.nTokens += 1
      var cp = 0
      var alpha = false
      var k = st
      while (k < end) {
        val b = bytes(k)
        if ((b & 0xC0) != 0x80) cp += 1
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) alpha = true
        k += 1
      }
      c.sumLen += cp
      if (alpha) c.nAlpha += 1
      val tl = end - st
      if (tl <= 7) {
        var packed = tl.toLong << 56
        var k2 = 0
        while (k2 < tl) {
          packed |= (bytes(st + k2) & 0xFFL) << (8 * k2); k2 += 1
        }
        var li = 0
        while (li < lexShort.length) {
          if (java.util.Arrays.binarySearch(lexShort(li), packed) >= 0)
            c.lexHits(li) += 1
          li += 1
        }
      } else if (lex.anyLong) {
        var li = 0
        while (li < lexLongWords.length) {
          val words = lexLongWords(li)
          var wi = 0
          var hit = false
          while (!hit && wi < words.length) {
            val w = words(wi)
            if (w.length == tl) {
              var k3 = 0
              while (k3 < tl && w(k3) == bytes(st + k3)) k3 += 1
              hit = k3 == tl
            }
            wi += 1
          }
          if (hit) c.lexHits(li) += 1
          li += 1
        }
      }
    }

    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b & 0xC0) != 0x80) { // lead byte = one code point
        c.nChars += 1
        val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
          b == '\f' || b == '\r'
        val letter = (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
        val digit = b >= '0' && b <= '9'
        if (!ws && !letter && !digit) c.nPunct += 1
        if (ws) bpeRun = 0
        else if (letter) { if (bpeRun != 1) { c.nBpe += 1; bpeRun = 1 } }
        else if (digit) { if (bpeRun != 2) { c.nBpe += 1; bpeRun = 2 } }
        else { c.nBpe += 1; bpeRun = 0 } // each punct char: its own match
        if (ws) {
          if (!inWs) { emitToken(start, i); inWs = true }
        } else if (inWs) { start = i; inWs = false }
      }
      i += 1
    }
    if (inWs) emitToken(n, n) // trailing empty token
    else emitToken(start, n)
    c
  }
}

/** The full stage-1 curation verdict — token-count bounds, quality
  * floor, language allowlist, optional Gopher hard gates — as ONE
  * boolean scalar over ONE [[TextScan]] byte pass.
  *
  * Why a dedicated expression instead of a filter over annotation
  * columns: `FilterExec` codegen has no subexpression elimination (only
  * `ProjectExec` does), and Catalyst's filter pushdown +
  * `CollapseProject` inline an annotation column's FULL definition into
  * every predicate reference — a gate written as
  * `where(n_tokens >= a && n_tokens <= b && quality >= q)` re-evaluates
  * the whole scrub->stats chain once per reference (measured at the
  * x100 bench shape: 15 inlined copies, 341 s for a pass whose one-scan
  * cost is ~20 s). One scalar in the predicate = one evaluation, and the
  * verdict fuses the Gopher token-filter terms (nAlpha, stopword hits)
  * into the same pass that computes the stats, so the gate does not even
  * pay a second `split()`.
  *
  * The verdict arithmetic below replicates the composable Column
  * formulation BIT FOR BIT — same integer comparisons, same IEEE double
  * op order as qualityScoreOf / langIdOf / gopherKeepExpr, same
  * short-circuit conjunction — TextStatsSpec pins the equivalence
  * against the annotate-then-filter formulation on edge + random
  * corpora, and the ts38 curate oracle replays it in SQL.
  *
  * `lexicons` are the language lexicons in [[langIdOf]] slot order
  * (quality's stopword ratio reads slot 0); `gopherStop` lands in the
  * trailing slot only when `gopherGates` is on.
  */
case class HeuristicGateExpr(child: Expression,
    lexicons: Seq[Seq[String]], langNames: Seq[String],
    gopherStop: Seq[String], minTokens: Int, maxTokens: Int,
    minQuality: Double, langs: Seq[String], gopherGates: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "heuristic_keep"

  @transient private lazy val packed: TextScan.PackedLexicons =
    TextScan.packLexicons(
      lexicons ++ (if (gopherGates) Seq(gopherStop) else Nil))
  @transient private lazy val langAllow: Set[String] = langs.toSet

  def keep(s: UTF8String): Boolean = {
    val c = TextScan.scan(s.getBytes, packed)
    // token-count bounds (tokenCountOf(st) >= minTokens && <= maxTokens)
    if (c.nTokens < minTokens || c.nTokens > maxTokens) return false
    // qualityScoreOf, identical when/otherwise guards and IEEE op order
    val sr =
      if (c.nTokens == 0) 0.0
      else c.lexHits(0).toDouble / c.nTokens.toDouble
    val mtl =
      if (c.nTokens == 0) 0.0
      else c.sumLen.toDouble / c.nTokens.toDouble
    val lenOk = if (mtl >= 3.0 && mtl <= 10.0) 1.0 else 0.0
    val pr =
      if (c.nChars == 0) 0.0
      else c.nPunct.toDouble / c.nChars.toDouble
    val quality = sr * 0.4 + lenOk * 0.4 + (1.0 - pr) * 0.2
    if (!(quality >= minQuality)) return false
    // langIdOf: argmax with first-slot precedence on ties, 'und' when no
    // lexicon matched
    if (langs.nonEmpty) {
      var best = 0
      var i = 0
      while (i < langNames.length) {
        if (c.lexHits(i) > best) best = c.lexHits(i)
        i += 1
      }
      var lang = "und"
      if (best > 0) {
        var j = 0
        var found = false
        while (!found && j < langNames.length) {
          if (c.lexHits(j) == best) { lang = langNames(j); found = true }
          j += 1
        }
      }
      if (!langAllow.contains(lang)) return false
    }
    // gopherKeepExpr: pure integer arithmetic (sum_len vs bound*n_words,
    // 100*n_alpha vs n_words*pct, stopword hits) — replayable exactly
    if (gopherGates) {
      val nW = c.nTokens.toLong
      val stopHits = c.lexHits(lexicons.length)
      if (!(nW >= 50L && nW <= 100000L &&
          c.sumLen >= 3L * nW && c.sumLen <= 10L * nW &&
          c.nAlpha * 100L >= nW * 80L &&
          stopHits >= 2L)) return false
    }
    true
  }

  override protected def nullSafeEval(v: Any): Any =
    keep(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("heuristicGateExpr", this,
      classOf[HeuristicGateExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.keep($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** array<long> of distinct n-word shingle hashes of a text column.
  * Codegen'd as a static call so the surrounding stage stays inside
  * WholeStageCodegen (CodegenFallback would break the whole span).
  */
case class ShingleHashExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(s: Any): Any =
    new GenericArrayData(
      TextHashing.shingleHashes(s.asInstanceOf[UTF8String].toString, n))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashing.shingleHashData($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** array<long> of sorted-distinct winnowing fingerprints (k-char-gram
  * rolling hash, window-w minima — see [[TextHashing.winnow]]). Codegen'd
  * as a static call so the stage stays in WholeStageCodegen.
  */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1, s"need k >= 2 and w >= 1, got k=$k w=$w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(s: Any): Any =
    TextHashing.winnowData(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashing.winnowData($c, $k, $w)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** array<string> of content-defined chunks (see
  * [[TextHashing.cdcChunks]]) — O(len) rolling-hash boundary scan.
  */
case class CdcChunksExpr(child: Expression, k: Int, modulus: Int)
    extends UnaryExpression {
  require(k >= 2 && modulus >= 1,
    s"need k >= 2 and modulus >= 1, got k=$k modulus=$modulus")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(s: Any): Any =
    TextHashing.cdcChunksData(s.asInstanceOf[UTF8String], k, modulus)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashing.cdcChunksData($c, $k, $modulus)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** array<string> of size-clamped content-defined chunks (see
  * [[TextHashing.cdcChunksClamped]]).
  */
case class CdcChunksClampedExpr(child: Expression, k: Int, modulus: Int,
    minLen: Int, maxLen: Int) extends UnaryExpression {
  require(k >= 2 && modulus >= 1 && minLen >= 1 && maxLen >= minLen,
    s"bad params k=$k modulus=$modulus clamp=$minLen..$maxLen")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks_clamped"

  override protected def nullSafeEval(s: Any): Any =
    TextHashing.cdcChunksClampedData(s.asInstanceOf[UTF8String], k,
      modulus, minLen, maxLen)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashing.cdcChunksClampedData($c, $k, " +
        s"$modulus, $minLen, $maxLen)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** array<struct<fp,pos>> of position-annotated winnowing selections
  * (leftmost window minimum — see [[TextHashing.winnowPos]]).
  */
case class WinnowPosExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1, s"need k >= 2 and w >= 1, got k=$k w=$w")
  override def dataType: DataType = ArrayType(new StructType()
    .add("fp", LongType, nullable = false)
    .add("pos", LongType, nullable = false), containsNull = false)
  override def prettyName: String = "winnow_positions"

  override protected def nullSafeEval(s: Any): Any =
    TextHashing.winnowPosData(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashing.winnowPosData($c, $k, $w)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** array<string> of distinct n-word shingle strings of a text column. */
case class ShingleStringExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_strings"

  override protected def nullSafeEval(s: Any): Any =
    new GenericArrayData(
      TextHashing.shingleStrings(s.asInstanceOf[UTF8String].toString, n)
        .map(UTF8String.fromString): Array[Any])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashing.shingleStringData($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** MinHash signature over precomputed shingle hashes: slot i = min over
  * the array of (a_i*h + b_i) mod P with a_i = 2i+1, b_i = 7919i+13 —
  * the same arithmetic as `array_min(transform(sh, h -> (a*h+b) % P))`
  * per slot, but all `numHashes` slots in ONE pass over the array
  * instead of `numHashes` interpreted lambda traversals. Matches the
  * column formulation's null semantics: a NULL input array, an empty
  * array, or an all-null array yields an array of `numHashes` null
  * slots (as array_min would per slot); null elements are skipped.
  */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextHashing.minhashAllNull(numHashes)
    else nullSafeEval(v)
  }

  override protected def nullSafeEval(v: Any): Any =
    TextHashing.minhashSigData(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      numHashes)

  // never-null output with special null-INPUT handling, so the nullSafe
  // helpers don't fit — generate the ternary directly
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${childGen.isNull}
            ? graft.functions.TextHashing.minhashAllNull($numHashes)
            : graft.functions.TextHashing.minhashSigData(
                ${childGen.value}, $numHashes);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** One-permutation MinHash signature over precomputed shingle hashes:
  * one rehash per shingle routed into `numHashes` bins, empty bins
  * densified by rotation (see [[TextHashing.ophSigData]]). The
  * signature is a drop-in for [[MinHashSigExpr]]'s in LSH banding at
  * 1/numHashes of the hashing cost.
  */
case class OphSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "oph_sig"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextHashing.minhashAllNull(numHashes)
    else nullSafeEval(v)
  }

  override protected def nullSafeEval(v: Any): Any =
    TextHashing.ophSigData(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      numHashes)

  // never-null output with special null-INPUT handling (see
  // MinHashSigExpr) — generate the ternary directly
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${childGen.isNull}
            ? graft.functions.TextHashing.minhashAllNull($numHashes)
            : graft.functions.TextHashing.ophSigData(
                ${childGen.value}, $numHashes);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Rolling polynomial char hash of a text column (single-pass). */
case class CharHashExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "char_hash"

  override protected def nullSafeEval(s: Any): Any =
    TextHashing.charHash(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashing.charHashU($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** 63-bit SimHash of a text column (single-pass). */
case class SimHashExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(s: Any): Any =
    TextHashing.simhash(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashing.simhashU($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextExprs {
  def shingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashExpr(ColumnBridge.expression(text), n))
  def shingleStrings(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleStringExpr(ColumnBridge.expression(text), n))
  def simhash(text: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(text)))
  def charHash(text: Column): Column =
    ColumnBridge.column(CharHashExpr(ColumnBridge.expression(text)))
  def minhashSig(sh: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(sh), numHashes))
  def ophSig(sh: Column, numHashes: Int): Column =
    ColumnBridge.column(OphSigExpr(ColumnBridge.expression(sh), numHashes))
  def textStats(text: Column, lexicons: Seq[Seq[String]]): Column =
    ColumnBridge.column(TextStatsExpr(ColumnBridge.expression(text), lexicons))
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowExpr(ColumnBridge.expression(text), k, w))
  def winnowPositions(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowPosExpr(ColumnBridge.expression(text), k, w))
  def cdcChunks(text: Column, k: Int, modulus: Int): Column =
    ColumnBridge.column(CdcChunksExpr(ColumnBridge.expression(text), k,
      modulus))
  def blocklistHits(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(BlocklistHitsExpr(ColumnBridge.expression(text),
      patterns))
  def blocklistScrub(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(BlocklistScrubExpr(ColumnBridge.expression(text),
      patterns))
  def cdcChunksClamped(text: Column, k: Int, modulus: Int, minLen: Int,
      maxLen: Int): Column =
    ColumnBridge.column(CdcChunksClampedExpr(ColumnBridge.expression(text),
      k, modulus, minLen, maxLen))
}
