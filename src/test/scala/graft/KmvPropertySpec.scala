package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Kmv, KmvBuf}

/** Pure-JVM algebraic properties of the KMV buffer — no Spark session:
  * the sketch is a VALUE, and its merge must behave like one under any
  * split, order, duplication, or serde round-trip, because the
  * distributed aggregation path exercises exactly those reorderings.
  * Fixed seed: reproducible.
  */
class KmvPropertySpec extends AnyFunSuite {

  private def bufOf(k: Int, vs: Seq[Long]): KmvBuf = {
    val b = new KmvBuf(k); vs.foreach(b.add); b
  }
  private def bytes(b: KmvBuf): Seq[Byte] = b.toBytes.toSeq

  test("merge is order-insensitive, duplication-proof, and equals the " +
      "direct build under 50 random splits") {
    val rnd = new Random(0xbeefL)
    for (trial <- 1 to 50) {
      val k = Seq(16, 64, 256)(trial % 3)
      val n = 1 + rnd.nextInt(2000)
      val vs = Seq.fill(n)(rnd.nextLong() % 500L) // heavy duplicates
      val direct = bufOf(k, vs)
      // random split into up to 5 slices, merged in shuffled order
      val slices = vs.grouped(1 + rnd.nextInt(vs.size)).toSeq
      val parts = rnd.shuffle(slices.map(bufOf(k, _)))
      val merged = new KmvBuf(k)
      parts.foreach(merged.mergeIn)
      assert(bytes(merged) == bytes(direct), s"trial $trial split-merge")
      // idempotence: re-merging a part changes nothing
      parts.headOption.foreach { p =>
        merged.mergeIn(p)
        assert(bytes(merged) == bytes(direct), s"trial $trial idempotence")
      }
      // serde round-trip preserves the value
      val rt = Kmv.fromBytes(direct.toBytes, k)
      assert(bytes(rt) == bytes(direct), s"trial $trial serde")
      // exact regime: distinct below k reports the true distinct count
      val distinct = vs.distinct.size
      if (distinct < k)
        assert(direct.estimate == distinct.toLong, s"trial $trial exact")
    }
  }

  test("intersection is symmetric and exact when both sides are exact") {
    val rnd = new Random(0xfeedL)
    for (trial <- 1 to 30) {
      val a = Seq.fill(200)(rnd.nextLong() % 300L)
      val b = Seq.fill(200)(rnd.nextLong() % 300L)
      val (sa, sb) = (bufOf(1024, a).toBytes, bufOf(1024, b).toBytes)
      val expected = a.toSet.intersect(b.toSet).size.toLong
      assert(Kmv.intersectEst(sa, sb) == expected, s"trial $trial")
      assert(Kmv.intersectEst(sb, sa) == expected, s"trial $trial sym")
    }
  }
}
