package graft

import graft.ops.AsOf

/** As-of join: union-window form vs brute force, including no-match
  * nulls, same-instant inclusivity, and multi-key isolation.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin equals brute force on a random corpus") {
    val rnd = new scala.util.Random(5)
    val lefts = (1L to 300L).map(i =>
      (i, s"k${rnd.nextInt(5)}", rnd.nextInt(100).toLong))
    val rights = (1000L to 1080L).map(i =>
      (i, s"k${rnd.nextInt(5)}", rnd.nextInt(100).toLong,
        rnd.nextDouble()))
    val left = lefts.toDF("id", "k", "t")
    val right = rights.toDF("rid", "k", "rt", "payload")

    val got = AsOf.asofJoin(left, right, Seq("k"), "t", "rt", "id", "rid",
      Seq("rid", "payload"))
      .select($"id", $"rid").as[(Long, Option[Long])].collect().toMap

    val expected = lefts.map { case (id, k, t) =>
      val matches = rights.filter(r => r._2 == k && r._3 <= t)
      id -> (if (matches.isEmpty) None
             else Some(matches.maxBy(r => (r._3, r._1))._1))
    }.toMap
    assert(got == expected)
    // same-instant right rows are visible (inclusive semantics)
    val l2 = Seq((1L, "a", 10L)).toDF("id", "k", "t")
    val r2 = Seq((7L, "a", 10L, 1.5)).toDF("rid", "k", "rt", "payload")
    val inc = AsOf.asofJoin(l2, r2, Seq("k"), "t", "rt", "id", "rid",
      Seq("rid", "payload")).head()
    assert(inc.getAs[Long]("rid") == 7L && inc.getAs[Double]("payload") == 1.5)
  }

  test("null payload in the latest right row is NOT overwritten by older") {
    val l = Seq((1L, "a", 10L)).toDF("id", "k", "t")
    val r = Seq(
      (100L, "a", 1L, Some(5.0)),
      (101L, "a", 2L, None: Option[Double]) // latest, null payload
    ).toDF("rid", "k", "rt", "payload")
    val row = AsOf.asofJoin(l, r, Seq("k"), "t", "rt", "id", "rid",
      Seq("rid", "payload")).head()
    assert(row.getAs[Long]("rid") == 101L, "latest row wins")
    assert(row.isNullAt(row.fieldIndex("payload")),
      "its null payload must not be backfilled from an older row")
  }

  test("null keys never match (equi-join semantics)") {
    val l = Seq((1L, Some("a"), 10L), (2L, None: Option[String], 10L))
      .toDF("id", "k", "t")
    val r = Seq((100L, Some("a"), 1L, 7.0),
      (101L, None: Option[String], 1L, 9.0))
      .toDF("rid", "k", "rt", "payload")
    val rows = AsOf.asofJoin(l, r, Seq("k"), "t", "rt", "id", "rid",
      Seq("rid", "payload"))
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(x.fieldIndex("rid"))) None
         else Some(x.getAs[Long]("rid")))).toMap
    assert(rows == Map(1L -> Some(100L), 2L -> None),
      "null-key left row comes back unmatched, never joined to null-key right")
  }
}
