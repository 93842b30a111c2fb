package graft

import org.apache.spark.sql.functions._

import graft.functions.CountMin.countMinTopK
import graft.functions.CountMinTopK

/** Count-Min sketch properties beyond the exact-regime oracle gate
  * (a10): the one-sided bias (never under-counts), the (ε, δ) envelope
  * under adversarial collision load, and linear-merge equivalence —
  * merging partial sketches must give BIT-IDENTICAL estimates to one
  * sketch over the concatenated stream, the property Space-Saving only
  * approximates with its absent-item augmentation.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def topOf(rows: Seq[Long], depth: Int, width: Int,
      capacity: Int, k: Int) =
    rows.toDF("v").repartition(4)
      .agg(countMinTopK(col("v"), depth, width, capacity, k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.cnt"), col("e.err"))
      .as[(Long, Long, Long)].collect()

  test("exact when candidates fit and rows don't fully collide, " +
      "across partition merges") {
    val data = (1L to 8L).flatMap(i => Seq.fill(i.toInt * 3)(i))
    val got = topOf(scala.util.Random.shuffle(data),
      depth = 4, width = 4096, capacity = 16, k = 8)
    assert(got.map(r => (r._1, r._2)).toSeq ==
      (1L to 8L).map(i => (9L - i, (9 - i) * 3L)).toSeq)
  }

  test("never under-counts, and the e*N/width envelope holds under " +
      "heavy collision load") {
    val rnd = new scala.util.Random(7)
    // 50k distinct light keys hammered into 2x256 cells: estimates MUST
    // inflate, but only upward and within the envelope
    val heavy = Seq.fill(800)(1001L) ++ Seq.fill(500)(1002L)
    val light = Seq.fill(3000)(rnd.nextInt(50000).toLong + 2000L)
    val data = rnd.shuffle(heavy ++ light)
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = topOf(data, depth = 2, width = 256, capacity = 64, k = 10)
    val n = data.size.toLong
    val bound = math.ceil(math.E * n.toDouble / 256.0).toLong
    got.foreach { case (item, cnt, err) =>
      val t = truth.getOrElse(item, 0L)
      assert(cnt >= t, s"CM under-counted item $item: $cnt < $t")
      assert(err == bound, s"reported envelope $err != $bound")
      assert(cnt - t <= bound,
        s"item $item overestimate ${cnt - t} outside e*N/width = $bound")
    }
    // the true heavy hitters always surface: est(heavy) >= true(heavy)
    // dominates everything below the envelope
    val items = got.map(_._1).toSet
    assert(items.contains(1001L) && items.contains(1002L))
  }

  test("linear merge: partial sketches sum to the single-stream sketch " +
      "bit-for-bit") {
    val agg = CountMinTopK(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("v")),
      depth = 3, width = 512, capacity = 32, k = 10)
    val rnd = new scala.util.Random(11)
    val a = Seq.fill(300)(7L) ++ Seq.fill(400)(rnd.nextInt(1000).toLong + 100L)
    val b = Seq.fill(250)(9L) ++ Seq.fill(400)(rnd.nextInt(1000).toLong + 100L)
    def bufOf(xs: Seq[Long]) = {
      val buf = agg.createAggregationBuffer()
      xs.foreach { x => buf.add(x, 1L); buf.cand.update(x, ()) }
      buf
    }
    val merged = agg.merge(bufOf(a), bufOf(b))
    val single = bufOf(a ++ b)
    assert(merged.counts.sameElements(single.counts),
      "merged cell counts differ from the single-stream sketch")
    assert(merged.total == single.total)
    // estimates (and hence any downstream top-k) agree exactly
    (a ++ b).distinct.foreach { item =>
      assert(merged.estimate(item) == single.estimate(item), s"item $item")
    }
  }

  test("heavy-hitter summary table: per-shard binary partials persisted " +
      "to parquet merge to the single-stream answer — linearity " +
      "survives storage") {
    import graft.functions.CountMin.{cmMerge, cmSketch}
    val rnd = new scala.util.Random(23)
    val rows = Seq.tabulate(20000)(i =>
      ((i % 7).toLong, (math.pow(rnd.nextDouble(), 2) * 120).toLong))
    val store = tmpDir("cm-table")
    rows.toDF("day", "v").repartition(5)
      .groupBy(col("day"))
      .agg(cmSketch(col("v"), 4, 1024, 200).as("sk"))
      .write.mode("overwrite").parquet(store)
    val got = spark.read.parquet(store)
      .agg(cmMerge(col("sk"), 4, 1024, 200, 10).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .as[(Long, Long)].collect().toSeq
    // exact regime (distinct 120 <= capacity, no 4-row full collision):
    // merged storage partials == the plain groupBy top-10
    val truth = rows.map(_._2).groupBy(identity)
      .map { case (k, v) => (k, v.size.toLong) }.toSeq
      .sortBy { case (k, c) => (-c, k) }.take(10)
    assert(got == truth)
    // a SLICE merge (days 0-1 only) answers that slice exactly too
    val slice = spark.read.parquet(store).where(col("day") < 2)
      .agg(cmMerge(col("sk"), 4, 1024, 200, 10).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.cnt")).as[(Long, Long)].collect().toSeq
    val sliceTruth = rows.filter(_._1 < 2).map(_._2).groupBy(identity)
      .map { case (k, v) => (k, v.size.toLong) }.toSeq
      .sortBy { case (k, c) => (-c, k) }.take(10)
    assert(slice == sliceTruth)
  }

  test("serialize/deserialize round-trips the sketch and candidates") {
    val agg = CountMinTopK(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("v")),
      depth = 2, width = 128, capacity = 8, k = 4)
    val buf = agg.createAggregationBuffer()
    Seq(1L, 1L, 2L, 3L, 3L, 3L).foreach { x =>
      buf.add(x, 1L); buf.cand.update(x, ())
    }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.counts.sameElements(buf.counts))
    assert(back.total == buf.total)
    assert(back.cand.keys.toSet == buf.cand.keys.toSet)
  }

  test("fromBytes structurally rejects a sketch serialized under " +
      "different depth/width instead of misparsing it") {
    val buf = new graft.functions.CmBuf(4, 1024)
    (1L to 100L).foreach { i => buf.add(i, 1L); buf.cand.update(i, ()) }
    val bytes = graft.functions.CmBuf.toBytes(buf)
    // same params round-trip cleanly
    val rt = graft.functions.CmBuf.fromBytes(bytes, 4, 1024)
    assert(rt.total == buf.total && rt.counts.sameElements(buf.counts))
    // wider, deeper, and narrower readers must all fail loudly
    intercept[IllegalArgumentException](
      graft.functions.CmBuf.fromBytes(bytes, 4, 2048))
    intercept[IllegalArgumentException](
      graft.functions.CmBuf.fromBytes(bytes, 8, 1024))
    intercept[IllegalArgumentException](
      graft.functions.CmBuf.fromBytes(bytes, 2, 1024))
  }

  test("cm_inner: join-size estimate from two stored sketches — upper " +
      "bound always, exact without cross-collisions; SQL-callable") {
    import graft.functions.{CmBuf, CountMin}
    val (d, w) = (4, 1 << 16)
    val a = new CmBuf(d, w)
    val b = new CmBuf(d, w)
    (0 to 20).foreach(i => a.add(i.toLong, i + 1L))
    (10 to 30).foreach(i => b.add(i.toLong, 2L))
    val truth = (10 to 20).map(i => (i + 1L) * 2L).sum
    val est = Seq((CmBuf.toBytes(a), CmBuf.toBytes(b))).toDF("sa", "sb")
      .select(CountMin.cmInner(col("sa"), col("sb"), d, w).as("e"))
      .head().getLong(0)
    // 42 active keys in a 2^16-wide row: this fixture is collision-free
    // (deterministic hashing — if it ever collided the test would have
    // failed on day one), so the estimate is EXACT
    assert(est == truth, s"est $est vs true join size $truth")
    // a deliberately narrow sketch can only over-count
    val (d2, w2) = (2, 16)
    val na = new CmBuf(d2, w2)
    val nb = new CmBuf(d2, w2)
    (0 to 20).foreach(i => na.add(i.toLong, i + 1L))
    (10 to 30).foreach(i => nb.add(i.toLong, 2L))
    val nEst = Seq((CmBuf.toBytes(na), CmBuf.toBytes(nb)))
      .toDF("sa", "sb")
      .select(CountMin.cmInner(col("sa"), col("sb"), d2, w2).as("e"))
      .head().getLong(0)
    assert(nEst >= truth, s"narrow estimate $nEst under-counts $truth")
    // the whole flow in SQL: sketch per side, estimate the join size
    GraftSession.registerFunctions(spark)
    val sqlEst = spark.sql(
      "SELECT cm_inner(sa, sb, 4, 65536) FROM " +
        "(SELECT (SELECT cm_sketch(v, 4, 65536, 8) FROM VALUES " +
        "(1L),(1L),(2L) AS t(v)) AS sa, (SELECT cm_sketch(v, 4, 65536, 8) " +
        "FROM VALUES (1L),(3L) AS u(v)) AS sb)").head().getLong(0)
    assert(sqlEst == 2L) // fa(1)=2 * fb(1)=1
  }
}
