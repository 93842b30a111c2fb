package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Token-budget mixture sampling: exact prefix-take semantics and the
  * approximate rate-based scale variant.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(3)
  private val docs = (1L to 400L).map { id =>
    val src = s"src${id % 3}"
    (id, src, Seq.fill(5 + rnd.nextInt(20))("w" + rnd.nextInt(50))
      .mkString(" "))
  }.toDF("doc_id", "source", "text")

  test("exact sample: per-source budget respected and maximal") {
    val budget = 300L
    val got = TextAnalysis
      .tokenBudgetSample(docs, "doc_id", "text", "source", budget)
    val bySrc = got.groupBy("source")
      .agg(sum($"n_tok".cast("long")).as("tot"),
        count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, (tot, _)) =>
      assert(tot <= budget, s"$src over budget: $tot")
    }
    // maximality: the next doc in rank order would cross the budget
    val ranked = docs.select($"doc_id", $"source",
        TextAnalysis.tokenCountOf(TextAnalysis.stats($"text")).as("n_tok"),
        TextAnalysis.sampleRank($"doc_id").as("rk"))
      .collect()
      .groupBy(_.getString(1))
    val taken = got.select("doc_id").collect().map(_.getLong(0)).toSet
    ranked.foreach { case (src, rows) =>
      val inOrder = rows.sortBy(r => (r.getLong(3), r.getLong(0)))
      val firstSkipped = inOrder.find(r => !taken(r.getLong(0)))
      firstSkipped.foreach { nxt =>
        assert(bySrc(src)._1 + nxt.getInt(2) > budget,
          s"$src skipped a doc that still fit")
      }
    }
  }

  test("approx sample: deterministic, lands near the budget") {
    val budget = 600L
    val a = TextAnalysis
      .tokenBudgetSampleApprox(docs, "doc_id", "text", "source", budget)
    val b = TextAnalysis
      .tokenBudgetSampleApprox(docs, "doc_id", "text", "source", budget)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "same inputs, same sample")
    val bySrc = a.groupBy("source")
      .agg(sum($"n_tok".cast("long")).as("tot")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc.foreach { case (src, tot) =>
      assert(tot > budget / 3 && tot < budget * 2,
        s"$src realized $tot vs budget $budget")
    }
    // a source under budget is passed through whole (rate clamps at 1)
    val tiny = Seq((9001L, "tiny", "one two three")).toDF(
      "doc_id", "source", "text")
    val kept = TextAnalysis.tokenBudgetSampleApprox(
      docs.unionByName(tiny), "doc_id", "text", "source", budget)
    assert(kept.where($"source" === "tiny").count() == 1)
  }
}
