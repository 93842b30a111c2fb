package graft

import org.apache.spark.sql.functions._

import graft.ops.Expectations

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  test("row rules count false AND null as violations; unique key " +
      "counts surplus rows; all in one scan") {
    val df = Seq((1L, Option(5)), (1L, None), (2L, Option(-1)),
      (3L, Option(2))).toDF("k", "v")
    val got = Expectations.check(df,
      rowRules = Seq("v_pos" -> (col("v") > 0)),
      uniqueKeys = Seq("k_unique" -> Seq("k")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("v_pos" -> 2L, "k_unique" -> 1L), got)
    // a clean table reports zeros, not missing rows
    val clean = Expectations.check(df.where(col("v") > 0),
      rowRules = Seq("v_pos" -> (col("v") > 0)),
      uniqueKeys = Seq("k_unique" -> Seq("k")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean == Map("v_pos" -> 0L, "k_unique" -> 0L), clean)
    // empty input: sums are null → coalesced to 0
    val empty = Expectations.check(df.where(lit(false)),
      rowRules = Seq("v_pos" -> (col("v") > 0)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(empty == Map("v_pos" -> 0L), empty)
    // rule names containing dots (or other path-y characters) resolve
    // literally — regression: col("rule_a.b") parsed as a nested field
    val dotted = Expectations.check(df,
      rowRules = Seq("v.pos`check" -> (col("v") > 0)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dotted == Map("v.pos`check" -> 2L), dotted)
  }

  test("referential probe: dangling child keys counted; null keys " +
      "only when nullIsViolation") {
    val child = Seq(Option(1L), Option(1L), Option(9L), None)
      .toDF("ck")
    val parent = Seq(1L, 2L).toDF("pk")
    val lax = Expectations.checkRef(child, Seq("ck"), parent, Seq("pk"),
      "fk").head()
    assert(lax.getString(0) == "fk" && lax.getLong(1) == 1L)
    val strict = Expectations.checkRef(child, Seq("ck"), parent,
      Seq("pk"), "fk", nullIsViolation = true).head()
    assert(strict.getLong(1) == 2L)
  }
}
