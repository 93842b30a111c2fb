package graft

import org.apache.spark.sql.functions._

import graft.functions.Kll.kllQuantiles
import graft.functions.{KllBuf, KllQuantiles}

/** KLL quantile-sketch properties beyond the exact-regime oracle gates
  * (q12 grouped, st9 windowed): the distinct-bounded exact head, the
  * self-reported worst-case rank-error certificate under forced
  * compaction (for ANY partitioning/merge tree), lossless binary-
  * decomposed spill, and serde round-trip.
  */
class KllSpec extends SparkSpec {
  import spark.implicits._

  private val probs = Seq(0.25, 0.5, 0.75, 0.95)

  /** quantile_disc ground truth: rank max(1, ceil(p·n)), 1-indexed */
  private def exactQ(xs: Seq[Long], p: Double): Long = {
    val sorted = xs.sorted
    sorted((math.max(1L, math.ceil(p * xs.size.toDouble).toLong) - 1).toInt)
  }

  private def sketchOf(rows: Seq[Long], k: Int, parts: Int = 7) =
    rows.toDF("v").repartition(parts)
      .agg(kllQuantiles(col("v"), k, probs).as("s"))
      .select(col("s.qs"), col("s.err"), col("s.n"))
      .as[(Seq[Long], Long, Long)].head()

  test("exact regime: distinct <= k gives quantile_disc answers with a " +
      "zero error certificate, under any partitioning") {
    val rnd = new scala.util.Random(3)
    // 40 distinct values, heavily skewed counts, 20k rows
    val data = Seq.fill(20000)((math.pow(rnd.nextDouble(), 3) * 40).toLong)
    for (parts <- Seq(1, 4, 13)) {
      val (qs, err, n) = sketchOf(rnd.shuffle(data), k = 64, parts = parts)
      assert(err == 0L, s"exact regime must certify err=0, got $err")
      assert(n == data.size.toLong)
      assert(qs == probs.map(exactQ(data, _)), s"parts=$parts")
    }
  }

  test("compacting regime: the certificate is honest — every answer's " +
      "true rank lies within err of the target rank") {
    val rnd = new scala.util.Random(17)
    // 30k distinct-heavy values >> k: compactions are forced
    val data = Seq.fill(30000)(rnd.nextInt(1000000).toLong)
    val (qs, err, n) = sketchOf(data, k = 128)
    assert(err > 0L, "this fixture must force compactions")
    assert(n == data.size.toLong)
    val sorted = data.sorted
    probs.zip(qs).foreach { case (p, q) =>
      val target = math.max(1L, math.ceil(p * n.toDouble).toLong)
      // the true rank interval of value q: [less+1, lessEq]
      val less = sorted.count(_ < q).toLong
      val lessEq = sorted.count(_ <= q).toLong
      assert(less + 1 - err <= target && target <= lessEq + err,
        s"p=$p: value $q rank [${less + 1},$lessEq] vs target $target ± $err")
    }
    // and the certificate is non-vacuous: far tighter than n
    assert(err < n / 4, s"err=$err is not a useful bound for n=$n")
  }

  test("spill is lossless: exceeding k distinct by itself only compacts " +
      "what overflows — heavy counts survive binary decomposition") {
    val agg = KllQuantiles(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("v")),
      k = 16, probs = probs)
    val buf = agg.createAggregationBuffer()
    // one dominant value (count 1000, bits across many levels) + spread
    val data = Seq.fill(1000)(50L) ++ (1L to 40L)
    data.foreach(buf.add(_, 1L))
    val (items, weights) = buf.weightedItems()
    // total mass is always preserved exactly, compacted or not
    assert(weights.sum == data.size.toLong)
    assert(buf.n == data.size.toLong)
    // the dominant value's mass dwarfs any compaction error
    val wOf = items.zip(weights).toMap
    assert(wOf(50L) >= 1000L - buf.errBound)
    // p50 sits inside the dominant run regardless of compactions
    assert(buf.quantiles(Array(0.5))(0) == 50L)
  }

  test("merge certificate telescopes: merged err <= sum of parts, and " +
      "bounds still hold after an 8-way merge tree") {
    val agg = KllQuantiles(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("v")),
      k = 64, probs = probs)
    val rnd = new scala.util.Random(29)
    val shards = Seq.fill(8)(Seq.fill(4000)(rnd.nextInt(100000).toLong))
    val bufs = shards.map { xs =>
      val b = agg.createAggregationBuffer(); xs.foreach(b.add(_, 1L)); b
    }
    val partErr = bufs.map(_.errBound).sum
    val merged = bufs.reduce((a, b) => agg.merge(a, b))
    val data = shards.flatten
    assert(merged.n == data.size.toLong)
    val sorted = data.sorted
    probs.foreach { p =>
      val q = merged.quantiles(Array(p))(0)
      val target = math.max(1L, math.ceil(p * merged.n.toDouble).toLong)
      val less = sorted.count(_ < q).toLong
      val lessEq = sorted.count(_ <= q).toLong
      assert(less + 1 - merged.errBound <= target &&
        target <= lessEq + merged.errBound,
        s"p=$p after merge: rank [${less + 1},$lessEq] vs " +
          s"$target ± ${merged.errBound}")
    }
    assert(merged.errBound >= partErr,
      "merge must carry the parts' accumulated error forward")
  }

  test("calibrated quality filter, sketch twin: windowless plan; kept " +
      "set == exact disc-quantile threshold wherever the certificate " +
      "is zero; certificate honest elsewhere") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val p = 0.5
    val out = graft.ops.TextAnalysis.calibratedQualityFilterApprox(
      docs, "doc_id", "text", "source", p)
    // the 100 TB point: no per-source row sort anywhere in the plan —
    // rows never shuffle, only sketches do, and the cutoff table joins
    // back as a broadcast
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "approx twin must not window-sort")
    assert(plan.contains("BroadcastHashJoin"), "cutoffs must broadcast")

    val kept = out.select("doc_id", "source", "quality_u", "q_cut", "q_err")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // ground truth per source from a driver-side sort of every score
    val all = docs.select(col("doc_id"), col("source"),
        round(graft.ops.TextAnalysis.qualityScoreOf(
          graft.ops.TextAnalysis.stats(col("text"))) * 1000000L)
          .cast("long").as("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(kept.nonEmpty && kept.length < docs.count())
    val bySource = all.groupBy(_._2)
    kept.groupBy(_._2).foreach { case (src, rows) =>
      val scores = bySource(src).map(_._3).sorted
      val n = scores.length
      val cutRank = math.max(1L, math.ceil(p * n.toDouble).toLong)
      val exactCut = scores((cutRank - 1).toInt)
      val err = rows.head._5
      if (err == 0L) {
        assert(rows.head._4 == exactCut, s"$src cutoff")
        val expectKeep = bySource(src).filter(_._3 >= exactCut).map(_._1).toSet
        assert(rows.map(_._1).toSet == expectKeep, s"$src kept set")
      } else {
        // certificate: the sketch cutoff's true rank within ±err of target
        val cut = rows.head._4
        val less = scores.count(_ < cut).toLong
        val lessEq = scores.count(_ <= cut).toLong
        assert(less + 1 - err <= cutRank && cutRank <= lessEq + err, src)
      }
    }
  }

  test("mergeable-summary rollup: stored binary partials, merged from " +
      "PARQUET, answer exactly what a direct sketch answers — both " +
      "regimes") {
    import graft.functions.Kll.{kllMerge, kllSketch}
    val rnd = new scala.util.Random(41)
    // exact regime: 60 distinct values across 6 'days'
    val exactRows = Seq.tabulate(12000)(i =>
      (i % 6, (math.pow(rnd.nextDouble(), 2) * 60).toLong))
    // compaction regime: ~8k distinct values >> k
    val bigRows = Seq.tabulate(12000)(i =>
      (i % 6, rnd.nextInt(500000).toLong))
    for ((rows, wantExact) <- Seq((exactRows, true), (bigRows, false))) {
      val df = rows.toDF("day", "v").repartition(5)
      val store = tmpDir("sketch-table")
      // build the summary table once, persist it as a real parquet table
      df.groupBy($"day").agg(kllSketch($"v", 128).as("sk"))
        .write.mode("overwrite").parquet(store)
      val merged = spark.read.parquet(store)
        .agg(kllMerge($"sk", 128, probs).as("s"))
        .select($"s.qs", $"s.err", $"s.n")
        .as[(Seq[Long], Long, Long)].head()
      val direct = sketchOf(rows.map(_._2), k = 128, parts = 5)
      assert(merged._3 == rows.size.toLong)
      if (wantExact) {
        // zero-compaction regime: merged partials ARE the direct answer
        assert(merged._2 == 0L && direct._2 == 0L)
        assert(merged._1 == direct._1)
        assert(merged._1 == probs.map(exactQ(rows.map(_._2), _)))
      } else {
        // certificate telescopes through storage: still rank-honest
        assert(merged._2 > 0L)
        val sorted = rows.map(_._2).sorted
        probs.zip(merged._1).foreach { case (p, q) =>
          val target =
            math.max(1L, math.ceil(p * merged._3.toDouble).toLong)
          val less = sorted.count(_ < q).toLong
          val lessEq = sorted.count(_ <= q).toLong
          assert(less + 1 - merged._2 <= target && target <= lessEq + merged._2,
            s"p=$p via stored partials")
        }
        // a slice query merges fewer partials and pays LESS error than
        // the all-days merge ever could accumulate
        val slice = spark.read.parquet(store).where($"day" < 2)
          .agg(kllMerge($"sk", 128, probs).as("s"))
          .select($"s.err", $"s.n").as[(Long, Long)].head()
        assert(slice._2 == rows.count(_._1 < 2).toLong)
      }
    }
  }

  test("serialize/deserialize round-trips head, levels, parities and " +
      "the certificate") {
    val agg = KllQuantiles(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("v")),
      k = 8, probs = probs)
    val buf = agg.createAggregationBuffer()
    val rnd = new scala.util.Random(5)
    Seq.fill(500)(rnd.nextInt(200).toLong).foreach(buf.add(_, 1L))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.n == buf.n)
    assert(back.errBound == buf.errBound)
    assert(back.head.toMap == buf.head.toMap)
    assert(back.levels.map(_.sorted) == buf.levels.map(_.sorted))
    assert(back.parities == buf.parities)
    val (bi, bw) = buf.weightedItems(); val (ri, rw) = back.weightedItems()
    assert(bi.sameElements(ri) && bw.sameElements(rw))
  }

  test("all-NULL input yields NULL (quantile_disc semantics), not a " +
      "sentinel value") {
    val row = Seq[Option[Long]](None, None, None).toDF("v")
      .agg(kllQuantiles(col("v"), 32, probs).as("s")).head()
    assert(row.isNullAt(0), "empty sketch must evaluate to NULL")
    // grouped: the all-NULL group is NULL, the live group is exact
    val grouped = Seq(("a", Some(5L)), ("a", Some(7L)), ("b", None))
      .toDF("g", "v").groupBy($"g")
      .agg(kllQuantiles(col("v"), 32, Seq(0.5)).as("s"))
      .orderBy($"g").collect()
    assert(!grouped(0).isNullAt(1) &&
      grouped(0).getStruct(1).getSeq[Long](0) == Seq(5L))
    assert(grouped(1).isNullAt(1))
  }
}
