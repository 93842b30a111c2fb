package graft

import graft.ops.{Dedup, TextAnalysis}

/** Unit fixtures for topTerms ranking and edit-distance near-dup (the
  * oracle gates ts12/dd14 cover sf0.01; these pin the tie-break rules
  * and the candidates-only levenshtein behavior).
  */
class TopTermsSpec extends SparkSpec {
  import spark.implicits._

  test("topTerms ranks tf desc, then rarer-corpus-term first, then term") {
    val df = Seq(
      (1L, "apple apple banana cherry"),
      (2L, "banana banana cherry"),
      (3L, "cherry date date")).toDF("doc_id", "text")
    val got = TextAnalysis.topTerms(df, "doc_id", "text", k = 2)
      .as[(Long, String, Long, Long, Int)].collect().toSet
    // df: apple=1, banana=2, cherry=3, date=1
    assert(got == Set(
      (1L, "apple", 2L, 1L, 1),  // tf 2 wins
      (1L, "banana", 1L, 2L, 2), // tf tie with cherry → lower df wins
      (2L, "banana", 2L, 2L, 1),
      (2L, "cherry", 1L, 3L, 2),
      (3L, "date", 2L, 1L, 1),
      (3L, "cherry", 1L, 3L, 2)))
  }

  test("trianglePairs emits each a<b<c triangle exactly once") {
    // K4 on {1,2,3,4} plus a pendant edge (4,5): C(4,3)=4 triangles
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val got = graft.ops.Dedup.trianglePairs(edges)
      .as[(Long, Long, Long)].collect()
    assert(got.length == 4)
    assert(got.toSet == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L),
      (2L, 3L, 4L)))
  }

  test("editDistancePairs verifies LSH candidates with levenshtein") {
    val base = "the quick brown fox jumps over the lazy dog near the river"
    val df = Seq(
      1L -> base,
      2L -> base.replace("lazy", "sleepy"), // 1 word edit → near-dup
      3L -> "completely different words about astronomy and spark engines xyz"
    ).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(df, "doc_id", "text",
        n = 3, numHashes = 8, rowsPerBand = 2, maxRel = 0.25)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
    // tight threshold rejects the same candidate pair
    val none = Dedup.editDistancePairs(df, "doc_id", "text",
        n = 3, numHashes = 8, rowsPerBand = 2, maxRel = 0.01)
      .count()
    assert(none == 0L)
  }
}
