package graft

import org.apache.spark.sql.functions._

import graft.functions.Kmv

/** KMV / theta sketch: the set-intersection member of the stored-sketch
  * family. Pins the exact-below-k regime (what the a13 oracle relies
  * on), bit-stable bytes under any partitioning and merge tree, the
  * estimator's error envelope past k, and the SQL registrations.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: estimate and intersection are exact counts; " +
      "sketch bytes independent of partitioning") {
    val a = spark.range(0L, 1000L).select($"id".as("v"))
    val skA = a.agg(Kmv.kmvSketch($"v", 4096)).head().getAs[Array[Byte]](0)
    assert(Kmv.estimateOf(skA) == 1000L, "below k the sketch is exact")
    // duplicate-heavy input: distinct semantics
    val dup = spark.range(0L, 5000L).select(($"id" % 100L).as("v"))
    val skDup = dup.agg(Kmv.kmvSketch($"v", 4096)).head().getAs[Array[Byte]](0)
    assert(Kmv.estimateOf(skDup) == 100L)
    // bytes are a canonical value: 1 vs 13 partitions, same bytes
    val sk13 = a.repartition(13)
      .agg(Kmv.kmvSketch($"v", 4096)).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(skA, sk13),
      "sketch bytes must not depend on partitioning")
    // exact intersection: [0,1000) ∩ [600,1600) = [600,1000) = 400
    val b = spark.range(600L, 1600L).select($"id".as("v"))
    val skB = b.agg(Kmv.kmvSketch($"v", 4096)).head().getAs[Array[Byte]](0)
    assert(Kmv.intersectEst(skA, skB) == 400L,
      "both sides exact ⇒ intersection exact")
    assert(Kmv.intersectEst(skB, skA) == 400L, "symmetric")
  }

  test("merged partials == direct sketch (bit-identical), and the " +
      "estimator stays inside its error envelope past k") {
    // union property: per-slice partials merged == one-shot build
    val rows = spark.range(0L, 30000L)
      .select(($"id" % 10L).as("slice"), ($"id" * 2654435761L).as("v"))
    val direct = rows.agg(Kmv.kmvSketch($"v", 256))
      .head().getAs[Array[Byte]](0)
    val merged = rows.groupBy($"slice")
      .agg(Kmv.kmvSketch($"v", 256).as("sk"))
      .agg(Kmv.kmvMerge($"sk", 256).as("m"))
      .select($"m.sketch").head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, merged),
      "slice-merge must equal the direct build byte for byte")
    // 30000 distinct at k=256: relative error ~1/sqrt(254) ≈ 6.3%; 3σ
    val est = Kmv.estimateOf(direct)
    assert(math.abs(est - 30000L) < 30000L * 0.19,
      s"estimate $est outside 3σ of 30000")
    // overlap estimator: two 20k sets sharing 10k elements
    val x = spark.range(0L, 20000L).select($"id".as("v"))
    val y = spark.range(10000L, 30000L).select($"id".as("v"))
    val skX = x.agg(Kmv.kmvSketch($"v", 1024)).head().getAs[Array[Byte]](0)
    val skY = y.agg(Kmv.kmvSketch($"v", 1024)).head().getAs[Array[Byte]](0)
    val ov = Kmv.intersectEst(skX, skY)
    assert(math.abs(ov - 10000L) < 3000L, s"overlap estimate $ov vs 10000")
  }

  test("SQL registrations and malformed-sketch rejection") {
    GraftSession.registerFunctions(spark)
    spark.range(0L, 500L).select(($"id" % 49L).as("v"), ($"id" % 2L).as("g"))
      .createOrReplaceTempView("kmv_in")
    val row = spark.sql(
      """SELECT kmv_est(kmv_sketch(v, 256)) AS n FROM kmv_in""").head()
    assert(row.getLong(0) == 49L)
    val m = spark.sql(
      """SELECT m.n_distinct FROM (
        |  SELECT kmv_merge(sk, 256) AS m FROM (
        |    SELECT g, kmv_sketch(v, 256) AS sk FROM kmv_in GROUP BY g))
        |""".stripMargin).head()
    assert(m.getLong(0) == 49L)
    val both = spark.sql(
      """SELECT kmv_intersect(a.sk, b.sk) FROM
        |  (SELECT kmv_sketch(v, 256) AS sk FROM kmv_in WHERE g = 0) a,
        |  (SELECT kmv_sketch(v, 256) AS sk FROM kmv_in WHERE g = 1) b
        |""".stripMargin).head()
    // v = id % 49 with odd modulus: even AND odd ids each cover every
    // residue class (gcd(2,49) = 1), so both groups hold exactly the 49
    // distinct values and the overlap is total
    assert(both.getLong(0) == 49L)
    // a sketch stored under k=256 must refuse to merge as k=512
    val sk = spark.range(0L, 10L).select($"id".as("v"))
      .agg(Kmv.kmvSketch($"v", 256)).head().getAs[Array[Byte]](0)
    val e = intercept[Exception] { Kmv.fromBytes(sk, 512) }
    assert(e.getMessage.contains("parameter mismatch"))
  }
}
