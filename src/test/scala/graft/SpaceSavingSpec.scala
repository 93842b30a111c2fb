package graft

import org.apache.spark.sql.functions._

import graft.functions.SpaceSaving.spaceSavingTopK

/** Space-Saving sketch properties beyond the exact-regime oracle gate
  * (a8): over-capacity bounds, guaranteed-presence of true heavy
  * hitters, and distributed-merge correctness across partitions.
  */
class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  private def topOf(rows: Seq[Long], capacity: Int, k: Int) =
    rows.toDF("v").repartition(4)
      .agg(spaceSavingTopK(col("v"), capacity, k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.cnt"), col("e.err"))
      .as[(Long, Long, Long)].collect()

  test("exact when distinct fits capacity, across partition merges") {
    val data = (1L to 8L).flatMap(i => Seq.fill(i.toInt * 3)(i))
    val got = topOf(scala.util.Random.shuffle(data), capacity = 16, k = 8)
    // counts exact, err 0, ordered cnt desc / item asc
    assert(got.toSeq == (8L to 1L by -1L).map(i => (i, i * 3, 0L)))
  }

  test("over capacity: upper/lower bounds bracket the truth and " +
      "frequent items survive") {
    val rnd = new scala.util.Random(7)
    // two true heavy hitters in a sea of 500 distinct light items
    val heavy = Seq.fill(400)(1001L) ++ Seq.fill(300)(1002L)
    val light = Seq.fill(600)(rnd.nextInt(500).toLong)
    val data = rnd.shuffle(heavy ++ light)
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = topOf(data, capacity = 64, k = 10)
    val items = got.map(_._1).toSet
    assert(items.contains(1001L) && items.contains(1002L))
    // mergeable-summaries bound: per-item estimate error ≤ n/capacity
    // (a strict per-item upper bound does NOT survive distributed
    // merge-pruning — an item evicted in one partial buffer loses that
    // buffer's mass — but the epsilon-n envelope does)
    val epsN = data.size.toLong / 64 + 1
    got.foreach { case (item, cnt, _) =>
      val t = truth.getOrElse(item, 0L)
      assert(math.abs(cnt - t) <= epsN,
        s"estimate for $item off by more than eps*n: cnt=$cnt truth=$t")
    }
    // the two real heavy hitters lead the ranking
    assert(got.take(2).map(_._1).toSet == Set(1001L, 1002L))
  }

  test("rejects non-bigint input at analysis time") {
    val e = intercept[Exception] {
      Seq("a", "b").toDF("v").agg(spaceSavingTopK(col("v"), 8, 2)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("bigint"))
  }
}
