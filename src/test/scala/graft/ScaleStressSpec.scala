package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

import graft.ops.{Dedup, PqIndex, ScaleStress}

/** The first scale datapoint beyond sf0.1: inflate the real fixtures ×10
  * executor-side (ScaleStress) and pin that the scale-path operators
  * keep the plans they were designed for — banded equi-joins and
  * broadcast ADC, never a nested-loop fallback — and that their shuffle
  * volume grows LINEARLY with the corpus (the property that separates a
  * bucketed design from an all-pairs one at 100 TB).
  */
class ScaleStressSpec extends SparkSpec {
  import spark.implicits._

  private val sf001 = "/root/testdata/sf0.01"
  private val sf01 = "/root/testdata/sf0.1"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  /** Total shuffle records written while `body` executes. */
  private def shuffleRecords(body: => Unit): Long = {
    val tally = new java.util.concurrent.atomic.AtomicLong
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) tally.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      // listener events are async; give the bus a moment to drain
      var waited = 0
      var last = -1L
      while (waited < 10000 && tally.get() != last) {
        last = tally.get(); Thread.sleep(200L); waited += 200
      }
    } finally spark.sparkContext.removeSparkListener(l)
    tally.get()
  }

  private def dd3(docs: DataFrame): DataFrame =
    Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.6)
  private def dd6(docs: DataFrame): DataFrame =
    Dedup.simhashBandedPairs(docs, "doc_id", "text", 6)
  private def sim6(emb: DataFrame, q: Seq[Float]): DataFrame =
    PqIndex.build(emb, "vec_id", "embedding", m = 4, dims = 64, ksub = 16)
      .probe(q, 30)

  test("inflation is executor-side, id-unique, and variant-grouped") {
    val docs = Tables.documents(spark, sf001)
    val big = ScaleStress.inflateDocs(docs, 10)
    assert(big.count() == docs.count() * 10)
    assert(big.select("doc_id").distinct().count() == docs.count() * 10)
    // no driver-side materialization: the plan is scan + generate, no
    // LocalTableScan of prebuilt rows
    assert(!plan(big).contains("LocalTableScan"), plan(big).take(500))
    val emb = Tables.embeddings(spark, sf001)
    val bigE = ScaleStress.inflateEmbeddings(emb, 10)
    assert(bigE.count() == emb.count() * 10)
    assert(bigE.select("vec_id").distinct().count() == emb.count() * 10)
  }

  test("dd3/dd6/sim6 plans hold their shape at sf0.1 x10") {
    val docs = ScaleStress.inflateDocs(Tables.documents(spark, sf01), 10)
    for ((name, p) <- Seq("dd3" -> plan(dd3(docs)), "dd6" -> plan(dd6(docs)))) {
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$name fell back to nested-loop at x10")
      assert(!p.contains("CartesianProduct"),
        s"$name planned a cartesian at x10")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
        p.contains("BroadcastHashJoin"), s"$name lost its equi-join at x10")
    }
    val emb = ScaleStress.inflateEmbeddings(Tables.embeddings(spark, sf01), 10)
    val q = Tables.embeddings(spark, sf01).where($"vec_id" === 0L)
      .select($"embedding").head().getSeq[Float](0)
    val p6 = plan(sim6(emb, q))
    assert(p6.contains("BroadcastHashJoin") &&
      !p6.contains("BroadcastNestedLoopJoin"), "sim6 ADC not broadcast at x10")
    assert(p6.contains("TakeOrderedAndProject"), "sim6 lost top-k pushdown")
  }

  test("shuffle volume scales linearly with x10 inflation (dd3 + sim6), " +
      "and the x10 runs finish inside the ceiling") {
    val docs1 = Tables.documents(spark, sf001)
    val docs10 = ScaleStress.inflateDocs(docs1, 10)
    val nDocs10 = docs1.count() * 10
    val t0 = System.nanoTime()
    var pairs10 = 0L
    val infl = shuffleRecords { pairs10 = dd3(docs10).count() }
    val dd3S = (System.nanoTime() - t0) / 1e9
    // every variant group is a tight near-dup cluster, so pairs exist...
    assert(pairs10 > 0)
    // ...but the banded design keeps total shuffle LINEAR in the corpus:
    // a bounded number of signature/band records per doc plus the
    // verified candidates. An all-pairs regression would shuffle
    // O(n²) ≈ 25M records here and blow far past this bracket. (A
    // ×1-vs-×10 ratio is NOT used: at ×1 AQE broadcasts everything and
    // reports ~80 records — the plans aren't comparable.)
    assert(infl <= nDocs10 * 50 + pairs10 * 20,
      s"dd3 shuffled $infl records for $nDocs10 docs / $pairs10 pairs " +
        "— superlinear")

    val emb1 = Tables.embeddings(spark, sf001)
    val emb10 = ScaleStress.inflateEmbeddings(emb1, 10)
    val nVecs10 = emb1.count() * 10
    val q = emb1.where($"vec_id" === 0L).select($"embedding")
      .head().getSeq[Float](0)
    val t1 = System.nanoTime()
    val inflE = shuffleRecords { assert(sim6(emb10, q).count() == 30L) }
    val sim6S = (System.nanoTime() - t1) / 1e9
    // build+probe shuffles the m codes per vector (plus agg partials),
    // never the pairwise corpus
    assert(inflE <= nVecs10 * 50,
      s"sim6 shuffled $inflE records for $nVecs10 vectors — superlinear")

    // dd6 at the same x10 volume: completes and finds the in-group
    // near-dups (variants differ by a couple of appended tokens, well
    // inside Hamming 6)
    val t2 = System.nanoTime()
    val dd6Pairs = dd6(docs10).count()
    val dd6S = (System.nanoTime() - t2) / 1e9
    assert(dd6Pairs > 0)

    // generous wall ceiling (host-load swings 2-4x): the point is
    // "finishes in seconds, not minutes" at x10
    val total = dd3S + sim6S + dd6S
    assert(total < 240.0, f"x10 stress took $total%.1f s (dd3 $dd3S%.1f, " +
      f"sim6 $sim6S%.1f, dd6 $dd6S%.1f)")
    info(f"x10 stress: dd3 $dd3S%.1f s, sim6 $sim6S%.1f s, dd6 $dd6S%.1f s; " +
      s"shuffle dd3 $infl recs / $pairs10 pairs, sim6 $inflE recs")
  }

  test("sketch aggregations shuffle sketches, not rows, at sf0.1 x10 — " +
      "and the inflation forces the compaction path honestly") {
    val ev10 = ScaleStress
      .inflateEvents(Tables.events(spark, sf01), 10).cache()
    val nRows = ev10.count() // ~1M rows
    val typed = ev10.select($"event_type", $"event_id",
      org.apache.spark.sql.functions.round($"value" * 100)
        .cast("long").as("v_cents"))

    // per-type IQR fences: ~5 groups × partitions sketch partials cross
    // the wire; rows are filtered map-side after a broadcast join
    var outliers = 0L
    val fenceShuffle = shuffleRecords {
      outliers = graft.ops.Profiling
        .iqrOutliers(typed, "event_type", "v_cents").count()
    }
    assert(outliers > 0, "inflated fixture lost its outlier tail")
    assert(fenceShuffle < nRows / 100,
      s"IQR shuffled $fenceShuffle records for $nRows rows — " +
        "rows are crossing the wire")

    // the x10 value perturbation pushes per-type distinct cents far past
    // k: the compaction path (not just a bigger head) is what ran above;
    // certificate must be nonzero AND still rank-honest vs a true sort
    val fences = typed.groupBy($"event_type")
      .agg(graft.functions.Kll
        .kllQuantiles($"v_cents", 4096, Seq(0.25, 0.75)).as("s"))
      .select($"event_type", $"s.qs".getItem(0).as("q1"),
        $"s.err".as("err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(fences.forall(_._3 > 0L), "x10 didn't force compaction")
    val one = fences.head
    val vals = typed.where($"event_type" === one._1)
      .select($"v_cents").as[Long].collect().sorted
    val target = math.max(1L, math.ceil(0.25 * vals.length.toDouble).toLong)
    val less = vals.count(_ < one._2).toLong
    val lessEq = vals.count(_ <= one._2).toLong
    assert(less + 1 - one._3 <= target && target <= lessEq + one._3,
      s"${one._1}: q1=${one._2} rank [${less + 1},$lessEq] " +
        s"vs $target ± ${one._3}")
    // and the certificate is tight enough to matter at this scale
    assert(one._3 < vals.length / 20,
      s"err ${one._3} vs n=${vals.length} — certificate too loose")
    ev10.unpersist()
    ()
  }
}
