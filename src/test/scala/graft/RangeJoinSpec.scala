package graft

import graft.ops.RangeJoin

/** Binned range join vs brute force: containment and overlap, with
  * interval spans straddling bin boundaries and duplicates impossible
  * by construction (one matching bin per true pair).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(13)
  private val points = (1L to 400L).map(i =>
    (i, s"k${rnd.nextInt(3)}", rnd.nextInt(1000).toLong)).toSeq
  private val intervals = (1L to 60L).map { i =>
    val lo = rnd.nextInt(950).toLong
    (1000L + i, s"k${rnd.nextInt(3)}", lo, lo + rnd.nextInt(120))
  }.toSeq

  test("pointInInterval equals brute force at several bin widths") {
    val p = points.toDF("pid", "k", "t")
    val iv = intervals.toDF("iid", "k", "lo", "hi")
    val expected = (for {
      (pid, pk, t) <- points; (iid, ik, lo, hi) <- intervals
      if pk == ik && t >= lo && t <= hi
    } yield (pid, iid)).toSet
    Seq(7L, 64L, 1000L).foreach { bin =>
      val got = RangeJoin.pointInInterval(p, iv, "t", "lo", "hi", bin,
        keys = Seq("k"))
        .select($"pid", $"iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"bin=$bin produced duplicates")
      assert(got.toSet == expected, s"bin=$bin")
    }
  }

  test("intervalOverlap equals brute force, one row per pair") {
    val a = intervals.take(30).toDF("iid", "k", "lo", "hi")
    val b = intervals.drop(30)
      .map { case (id, k, lo, hi) => (id + 1000, k, lo, hi) }
      .toDF("jid", "k", "lo2", "hi2")
    val expected = (for {
      (ai, ak, alo, ahi) <- intervals.take(30)
      (bi, bk, blo, bhi) <- intervals.drop(30)
      if ak == bk && alo <= bhi && blo <= ahi
    } yield (ai, bi + 1000)).toSet
    Seq(13L, 200L).foreach { bin =>
      val got = RangeJoin.intervalOverlap(a, b, "lo", "hi", "lo2", "hi2",
        bin, keys = Seq("k"))
        .select($"iid", $"jid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"bin=$bin produced duplicates")
      assert(got.toSet == expected, s"bin=$bin")
    }
  }
}
