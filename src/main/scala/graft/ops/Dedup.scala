package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, at three cost
  * tiers:
  *
  *  - exact: hash-groupBy on content (or sha256 of content) — one shuffle
  *    on the hash key, scales to any corpus size;
  *  - n-gram Jaccard: shingle explode + self-join on shingle — exact
  *    near-dup pairs, quadratic only within shingle buckets;
  *  - MinHash + LSH: constant-size signatures, band-bucket join — the
  *    100 TB path: candidate generation cost is linear in corpus size,
  *    verification only within buckets;
  *  - SimHash: 64-bit signature, near-dups = small Hamming distance.
  *
  * All hashes derive from [[charHash]], a rolling polynomial over
  * characters, so results are engine-reproducible (unlike murmur3).
  */
object Dedup {

  val P: Long = 1000000007L

  /** Ordered polynomial char hash — reproducible in any engine with an
    * ordered fold (see TextAnalysis.fingerprint).
    */
  def charHash(text: Column): Column =
    aggregate(
      regexp_extract_all(text, lit("."), lit(0)),
      lit(0L),
      (acc, c) => (acc * 31L + ascii(c)) % P)

  /** Exact dedup: canonical id (min) + multiplicity per distinct content
    * hash. Group on sha256 rather than the raw text so the shuffle key is
    * 32 bytes regardless of document size.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), sha2(col(textCol), 256).as("content_sha"))
      .groupBy("content_sha")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingles of a text column (empty when fewer than
    * n words).
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    array_distinct(
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Exact n-gram Jaccard near-dup pairs: docs sharing ≥ `threshold`
    * Jaccard similarity over word `n`-gram shingle sets. Returns
    * (id_a, id_b, jaccard) with id_a < id_b.
    *
    * Plan shape: explode shingles → self-equi-join on shingle (shuffle on
    * shingle hash) → pair-count aggregate → jaccard. No cross join; cost
    * is bounded by shingle-bucket sizes, and a distinct-shingle explode
    * keeps buckets duplicate-free.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = df.select(col(idCol).as("doc"), shingles(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0)
    val counts = sh.select(col("doc"), size(col("sh")).as("cnt"))
    val ex = sh.select(col("doc"), explode(col("sh")).as("shingle"))
    val pairs = ex.as("a").join(ex.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(counts.withColumnsRenamed(Map("doc" -> "id_a_c", "cnt" -> "cnt_a")),
        col("id_a") === col("id_a_c"))
      .join(counts.withColumnsRenamed(Map("doc" -> "id_b_c", "cnt" -> "cnt_b")),
        col("id_b") === col("id_b_c"))
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") /
          (col("cnt_a") + col("cnt_b") - col("common")).cast("double"))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** MinHash signature: for each of `numHashes` permutations i, the min of
    * (a_i * shingleHash + b_i) mod P over the document's shingles.
    * Deterministic seeds; a_i odd to be invertible mod 2^k-ish ranges.
    */
  def minhashSignature(text: Column, n: Int, numHashes: Int): Column = {
    val sh = shingles(text, n)
    val hashes = transform(sh, s =>
      aggregate(regexp_extract_all(s, lit("."), lit(0)), lit(0L),
        (acc, c) => (acc * 31L + ascii(c)) % P))
    array((0 until numHashes).map { i =>
      val a = 2L * i + 1L
      val b = 7919L * i + 13L
      array_min(transform(hashes, h => (lit(a) * h + lit(b)) % lit(P)))
    }: _*)
  }

  /** MinHash+LSH candidate pairs verified by exact Jaccard.
    *
    * Bands of `rowsPerBand` signature slots hash to buckets; docs sharing
    * any band bucket are candidates; candidates are verified with the
    * exact shingle Jaccard and filtered at `threshold`. At scale: the
    * band explode is linear, the bucket self-join shuffles on
    * (band, bucket-hash) and only collides true candidates.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, rowsPerBand: Int,
      threshold: Double): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val sig = df
      .select(col(idCol).as("doc"), col(textCol).as("txt"),
        minhashSignature(col(textCol), n, numHashes).as("sig"))
      .where(size(shingles(col("txt"), n)) > 0)
    val banded = sig.select(col("doc"), col("txt"),
      explode(array((0 until numBands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("_",
            slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc"), col("txt"), col("bb.band"), col("bb.bucket"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("a.txt").as("txt_a"),
        col("b.doc").as("id_b"), col("b.txt").as("txt_b"))
      .distinct()
    // verify candidates with exact Jaccard over the same shingle sets
    val withSets = cand
      .withColumn("sh_a", shingles(col("txt_a"), n))
      .withColumn("sh_b", shingles(col("txt_b"), n))
    withSets.select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** 63-bit SimHash over word tokens: bit j of the signature is the sign
    * of the sum over tokens of (+1 if bit j of tokenHash else -1).
    * Bit tests use precomputed power-of-two masks (engine-portable — no
    * variable shift amounts).
    */
  def simhash(text: Column): Column = {
    val toks = split(text, " ")
    val hashes = transform(toks, t =>
      aggregate(regexp_extract_all(t, lit("."), lit(0)), lit(0L),
        (acc, c) => (acc * 131L + ascii(c)) % lit(4611686018427387847L)))
    val powers = array((0 to 62).map(j => lit(1L << j)): _*)
    aggregate(
      sequence(lit(0), lit(62)),
      lit(0L),
      (acc, j) => {
        val mask = get(powers, j) // 0-based
        val vote = aggregate(hashes, lit(0L),
          (v, h) => v + when(h.bitwiseAND(mask) =!= 0L, 1L).otherwise(-1L))
        acc + when(vote > 0, mask).otherwise(lit(0L))
      })
  }

  /** Hamming distance between two simhash signatures. */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
