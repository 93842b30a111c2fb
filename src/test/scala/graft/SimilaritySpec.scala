package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val queryVec: Seq[Float] = emb.where($"vec_id" === 0L)
    .select($"embedding").head().getSeq[Float](0)

  test("dot/cosine expression matches reference fold arithmetic") {
    val rows = emb.limit(50)
      .select($"vec_id", $"embedding",
        Similarity.dot($"embedding", $"embedding").as("d2"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      var acc = 0.0
      v.foreach(x => acc += x.toDouble * x.toDouble)
      assert(r.getDouble(2) == acc, s"vec ${r.getLong(0)}")
    }
  }

  test("IVF: deterministic training, full coverage, recall vs brute force") {
    val centroids = Similarity.ivfTrain(emb, "vec_id", "embedding",
      k = 8, iters = 2).cache()
    assert(centroids.count() == 8)
    val assignments = Similarity.assign(emb, "vec_id", "embedding", centroids)
      .cache()
    // every vector assigned exactly once
    assert(assignments.count() == emb.count())
    assert(assignments.select("vec_id").distinct().count() == emb.count())

    // deterministic rebuild
    val again = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 8, iters = 2)
    assert(centroids.exceptAll(again).isEmpty)

    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queryVec, 10).select("vec_id").collect().map(_.getLong(0)).toSet
    // probing every centroid must reproduce brute force exactly
    val all = Similarity.ivfTopK(emb, "vec_id", "embedding", centroids,
      assignments, queryVec, 10, nprobe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(all == exact)
    // nprobe=3 keeps decent recall on this corpus
    val approx = Similarity.ivfTopK(emb, "vec_id", "embedding", centroids,
      assignments, queryVec, 10, nprobe = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(approx.intersect(exact).size >= 5,
      s"recall ${approx.intersect(exact).size}/10")
  }

  test("IVF index: build once, persist, probe many across catalog reopen") {
    import graft.ops.IvfIndex
    val root = tmpDir("ivf")
    val cat = new graft.catalog.VersionedCatalog(root)
    IvfIndex.build(emb, "vec_id", "embedding", k = 8, iters = 2)
      .save(cat, "ann_idx")

    // a NEW catalog handle (fresh session's view): load without training
    val idx = IvfIndex.load(spark, new graft.catalog.VersionedCatalog(root),
      "ann_idx")
    assert(idx.centroids.count() == 8)
    assert(idx.assignments.count() == emb.count())

    // probe several queries against the one persisted index; full-probe
    // equals brute force, per-query
    Seq(queryVec, queryVec.map(v => -v), queryVec.reverse).foreach { q =>
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        q, 5).select("vec_id").collect().map(_.getLong(0)).toSet
      val got = idx.probe(emb, "vec_id", "embedding", q, 5, nprobe = 8)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(got == exact)
    }
  }

  test("multi-probe LSH recall >= single-probe recall") {
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queryVec, 10).select("vec_id").collect().map(_.getLong(0)).toSet
    val single = Similarity.lshTopK(emb, "vec_id", "embedding", queryVec,
      bits = 8, k = 10).select("vec_id").collect().map(_.getLong(0)).toSet
    val multi = Similarity.lshTopKMultiProbe(emb, "vec_id", "embedding",
      queryVec, bits = 8, k = 10).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(multi.intersect(exact).size >= single.intersect(exact).size)
    assert(multi.contains(0L), "query's own bucket always probed")
  }

  test("LSH topK probes only the query bucket") {
    val got = Similarity.lshTopK(emb, "vec_id", "embedding", queryVec,
      bits = 8, k = 5).collect()
    assert(got.nonEmpty && got.length <= 5)
    // the query itself (vec 0) is in its own bucket -> cos 1.0 first
    assert(got.head.getLong(0) == 0L && got.head.getDouble(1) > 0.999999)
  }
}
