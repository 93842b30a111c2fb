package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** Randomized parity for the windowed greedy-left merge application:
  * the distributed gaps-and-islands formulation must agree with a plain
  * fold-left reference implementation on every word — including the run
  * corners (self-pairs over odd/even runs, matches at word edges) that
  * a hand-picked example can miss. Fixed seed: reproducible.
  */
class BpePropertySpec extends SparkSpec {
  import spark.implicits._

  /** Textbook greedy-left single-merge application. */
  private def applyRef(syms: List[String], a: String,
      b: String): List[String] = syms match {
    case x :: y :: rest if x == a && y == b =>
      (a + b) :: applyRef(rest, a, b)
    case x :: rest => x :: applyRef(rest, a, b)
    case Nil => Nil
  }

  test("applyMerge == fold-left reference on 200 random run-heavy words") {
    val rnd = new Random(20260814L)
    val alphabet = Seq("a", "b", "ab", "o")
    val words = (1 to 200).map { i =>
      val len = 1 + rnd.nextInt(12)
      (i.toLong, Seq.fill(len)(alphabet(rnd.nextInt(alphabet.size))))
    }
    // random merge pair per batch — including self-pairs and pairs whose
    // concat collides with an existing symbol ("a"+"b" == "ab")
    for ((a, b) <- Seq(("a", "a"), ("a", "b"), ("o", "o"), ("ab", "a"))) {
      val state = words.toDF("wid", "syms")
        .select(col("wid").as("w"), lit(1L).as("freq"),
          posexplode(col("syms")).as(Seq("j", "sym")))
        .select(col("w"), col("freq"),
          (col("j") + 1).cast("long").as("i"), col("sym"))
      val got = Bpe.applyMerge(state, a, b, Seq("w"))
        .orderBy(col("w"), col("i"))
        .select(col("w"), col("sym"))
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getString(1)).toList).toMap
      words.foreach { case (wid, syms) =>
        val expect = applyRef(syms.toList, a, b)
        assert(got.getOrElse(wid, Nil) == expect,
          s"merge ($a,$b) on ${syms.mkString("|")}: " +
            s"got ${got.getOrElse(wid, Nil)}, want $expect")
      }
    }
  }
}
