package graft

import org.apache.spark.sql.functions._

import graft.functions.Bloom
import graft.ops.Dedup

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def buildWords(items: Seq[Long], numBits: Int, k: Int,
      parts: Int): Array[Long] =
    items.toDF("v").repartition(parts)
      .agg(Bloom.bloomAgg($"v", numBits, k))
      .head().getSeq[Long](0).toArray

  test("no false negatives, ever") {
    val items = (0L until 2000L).map(i => i * 0x9e37L + 17L)
    val words = buildWords(items, numBits = 1 << 15, k = 5, parts = 7)
    val misses = items.toDF("v")
      .where(!Bloom.mightContain($"v", words, 5)).count()
    assert(misses == 0L)
  }

  test("merge-order invariance: words identical under any partitioning") {
    val items = (0L until 5000L).map(i => i * 31L - 7L)
    val a = buildWords(items, 1 << 16, 4, parts = 1)
    val b = buildWords(items, 1 << 16, 4, parts = 13)
    assert(a.sameElements(b))
  }

  test("membership summary table: per-day filters persisted to parquet " +
      "OR-merge to the direct union filter bit-for-bit; range probes " +
      "keep the no-FN contract") {
    val nb = 1 << 14
    val rows = (0L until 6000L).map(i => ((i % 5).toInt, i * 131L + 3L))
    val store = tmpDir("bloom-table")
    rows.toDF("day", "v").repartition(7)
      .groupBy($"day").agg(Bloom.bloomAgg($"v", nb, 4).as("bf"))
      .write.mode("overwrite").parquet(store)
    // whole-range merge == one direct filter over every key
    val merged = spark.read.parquet(store)
      .agg(Bloom.bloomMerge($"bf", nb))
      .head().getSeq[Long](0).toArray
    val direct = buildWords(rows.map(_._2), nb, 4, parts = 3)
    assert(merged.sameElements(direct), "OR-merge lost bits vs direct")
    // slice merge (days 0-1): every key of the slice still hits
    val sliceWords = spark.read.parquet(store).where($"day" < 2)
      .agg(Bloom.bloomMerge($"bf", nb)).head().getSeq[Long](0).toArray
    val sliceKeys = rows.filter(_._1 < 2).map(_._2)
    val misses = sliceKeys.toDF("v")
      .where(!Bloom.mightContain($"v", sliceWords, 4)).count()
    assert(misses == 0L, "false negative through storage + slice merge")
    // and the slice filter is genuinely smaller than the union: most
    // out-of-slice keys do NOT hit (it's a filter, not a constant true)
    val outKeys = rows.filter(_._1 >= 2).map(_._2)
    val outHits = outKeys.toDF("v")
      .where(Bloom.mightContain($"v", sliceWords, 4)).count()
    assert(outHits < outKeys.size / 10,
      s"slice filter saturated: $outHits/${outKeys.size} out-of-slice hits")
  }

  test("false-positive rate stays near the (1 - e^(-kn/m))^k envelope") {
    val n = 4000
    val m = 1 << 16
    val k = 5
    val items = (0L until n.toLong).map(i => i * 0x1234567L + 3L)
    val words = buildWords(items, m, k, parts = 5)
    // a disjoint probe set (offset far outside the build range)
    val probes = (0 until 20000).map(i => 1000000000L + i * 77L)
    val fps = probes.toDF("v")
      .where(Bloom.mightContain($"v", words, k)).count()
    val expected = math.pow(1 - math.exp(-k.toDouble * n / m), k)
    val observed = fps.toDouble / probes.size
    assert(observed <= 2 * expected + 0.005,
      f"FP rate $observed%.4f vs expected $expected%.4f")
  }

  test("decontaminateBloom == decontaminate, both join modes; the plan " +
    "carries the codegen bloom probe") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val train = docs.where($"doc_id" % 29 =!= 0)
    val bench = docs.where($"doc_id" % 29 === 0)
    val exact = Dedup.decontaminate(train, bench, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (bcast <- Seq(false, true)) {
      val bloomed = Dedup.decontaminateBloom(train, bench, "doc_id", "text",
        n = 4, numBits = 1 << 16, numHashes = 5, broadcastBench = bcast)
      assert(bloomed.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap == exact,
        s"broadcastBench=$bcast")
    }
    // tiny filter (64 bits, saturated): still exact — FPs all removed
    val saturated = Dedup.decontaminateBloom(train, bench, "doc_id", "text",
      n = 4, numBits = 64, numHashes = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(saturated == exact)
    val plan = Dedup.decontaminateBloom(train, bench, "doc_id", "text",
      n = 4, numBits = 1 << 16, numHashes = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"))
    Dedup.releaseCaches()
  }

  test("probe expressions with identical filter content compare equal " +
      "(content-based equals enables Catalyst canonicalization)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions.BloomMightContain
    val w = Array(5L, -9L)
    val a = BloomMightContain(Literal(1L), w, 3)
    val b = BloomMightContain(Literal(1L), w.clone(), 3)
    assert(a == b && a.hashCode == b.hashCode)
    assert(a.canonicalized.semanticEquals(b.canonicalized))
    assert(a != BloomMightContain(Literal(1L), Array(5L, -8L), 3))
    assert(a != BloomMightContain(Literal(1L), w, 4))
  }

  test("bloom_merge rejects NULL filter words instead of reading " +
      "undefined data") {
    val ok = Seq((1L, 2L), (3L, 4L)).toDF("w0", "w1")
      .select(array($"w0", $"w1").as("bf"))
      .agg(Bloom.bloomMerge($"bf", numBits = 128))
      .head().getSeq[Long](0)
    assert(ok == Seq(3L, 6L))
    val ex = intercept[Exception] {
      Seq(Tuple1(1L)).toDF("w0")
        .select(array($"w0", lit(null).cast("bigint")).as("bf"))
        .agg(Bloom.bloomMerge($"bf", numBits = 128))
        .head()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(_.getMessage != null) &&
      chain(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("NULL")),
      s"expected the NULL-word message in: $ex")
  }
}
