package graft

import org.apache.spark.sql.functions._

import graft.ops.{IvfPqSharedIndex, IvfPqSharedPackedIndex, PqIndex,
  PqPackedIndex, Similarity}

/** Bit-parity of the tight-loop quantization kernels against the
  * relational (oracle-replayable) quantizer steps: same argmax/argmin,
  * same IEEE op sequences, same NaN and tie disciplines — so the packed
  * production indexes are interchangeable with the gate-checked
  * relational ones, code-for-code and probe-for-probe.
  */
class QuantKernelsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val queryVec: Seq[Float] = emb.where($"vec_id" === 0L)
    .select($"embedding").head().getSeq[Float](0)

  test("assignFast matches relational assign, degenerate vectors included") {
    // a zero-norm vector exercises the NaN→−∞ discipline on the kernel
    // side (relational: nanvl(cosine, −∞))
    val withZero = emb.select($"vec_id", $"embedding")
      .unionByName(Seq((999999L, Seq.fill(64)(0.0f)))
        .toDF("vec_id", "embedding"))
    val centroids = Similarity.ivfSpreadSeedCentroids(
      withZero, "vec_id", "embedding", 16).cache()
    val rel = Similarity.assign(withZero, "vec_id", "embedding", centroids)
    val fast = Similarity.assignFast(withZero, "vec_id", "embedding",
      centroids)
    assert(rel.exceptAll(fast).isEmpty && fast.exceptAll(rel).isEmpty)
  }

  test("kernel PQ encode matches relational pqEncode on trained codebooks") {
    val cb = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8,
      dims = 64, ksub = 16, iters = 2).cache()
    val rel = Similarity.pqEncode(emb, "vec_id", "embedding", cb, 8, 64)
    val fast = Similarity.pqEncodeFast(emb, "vec_id", "embedding", cb, 8, 64)
    assert(rel.schema.map(f => (f.name, f.dataType)) ===
      fast.schema.map(f => (f.name, f.dataType)))
    assert(rel.exceptAll(fast).isEmpty && fast.exceptAll(rel).isEmpty)
  }

  test("packed ADC probe is bit-identical to the relational pqTopK") {
    val m = 8
    val cb = Similarity.pqTrain(emb, "vec_id", "embedding", m, dims = 64,
      ksub = 16, iters = 2).cache()
    val relCodes = Similarity.pqEncode(emb, "vec_id", "embedding", cb, m, 64)
    val rel = Similarity.pqTopK(relCodes, cb, queryVec, m, k = 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val packed = Similarity.pqEncodePacked(emb, "vec_id", "embedding",
      cb, m, 64)
    val fast = Similarity.pqTopKPackedD(packed,
      Similarity.collectCodebooks(cb, m), queryVec.map(_.toDouble), k = 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rel.toSeq == fast.toSeq)
  }

  test("packed trained PQ index equals the relational trained index") {
    val rel = PqIndex.buildTrained(emb, "vec_id", "embedding", m = 8,
      dims = 64, ksub = 16, iters = 2, trainLimit = Some(500))
    val packed = PqPackedIndex.buildTrained(emb, "vec_id", "embedding",
      m = 8, dims = 64, ksub = 16, iters = 2, trainLimit = Some(500))
    val a = rel.probe(queryVec, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = packed.probe(queryVec, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq == b.toSeq)
  }

  test("packed shared IVFADC equals the relational shared index") {
    val rel = IvfPqSharedIndex.buildTrained(emb, "vec_id", "embedding",
      kc = 8, m = 8, dims = 64, ksub = 16, iters = 2,
      trainLimit = Some(500))
    val packed = IvfPqSharedPackedIndex.buildTrained(emb, "vec_id",
      "embedding", kc = 8, m = 8, dims = 64, ksub = 16, iters = 2,
      trainLimit = Some(500))
    // identical quantizers (same training path)...
    assert(rel.codebooks.exceptAll(packed.codebooks).isEmpty)
    assert(rel.centroids.exceptAll(packed.centroids).isEmpty)
    // ...identical codes (packed explodes to the relational layout)...
    val packedExploded = packed.codes.select($"vec_id", $"centroid_id",
      posexplode($"codes").as(Seq("sub", "code")))
    assert(rel.codes.exceptAll(packedExploded).isEmpty &&
      packedExploded.exceptAll(rel.codes).isEmpty)
    // ...identical probes, adist bits included, at several nprobe
    for (np <- Seq(2, 4, 8)) {
      val a = rel.probe(queryVec, k = 20, nprobe = np)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val b = packed.probe(queryVec, k = 20, nprobe = np)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(a.toSeq == b.toSeq, s"nprobe=$np")
    }
  }

  test("semDedup kernelAssign produces the identical kept set") {
    val centroids = Similarity.ivfSpreadSeedCentroids(
      emb, "vec_id", "embedding", 16).cache()
    val rel = Similarity.semDedup(emb, "vec_id", "embedding", centroids,
      threshold = 0.9)
    val fast = Similarity.semDedup(emb, "vec_id", "embedding", centroids,
      threshold = 0.9, kernelAssign = true)
    assert(rel.exceptAll(fast).isEmpty && fast.exceptAll(rel).isEmpty)
  }

  test("packed index round-trips through the catalog and frozen-codebook " +
      "ingest matches a full re-encode") {
    val root = tmpDir("pqpacked")
    val cat = new graft.catalog.VersionedCatalog(root)
    val low = emb.where($"vec_id" % 7 =!= 0)
    val batch = emb.where($"vec_id" % 7 === 0)
    val idx = PqPackedIndex.buildTrained(low, "vec_id", "embedding",
      m = 8, dims = 64, ksub = 16, iters = 1)
    idx.save(cat, "pq")
    val loaded = PqPackedIndex.load(spark, cat, "pq")
    val grown = loaded.addVectors(batch, "vec_id", "embedding")
    // frozen-codebook increment == full re-encode under the same books
    val full = Similarity.pqEncodePacked(emb, "vec_id", "embedding",
      loaded.codebooks, 8, 64)
    assert(grown.codes.exceptAll(full).isEmpty &&
      full.exceptAll(grown.codes).isEmpty)
    // duplicate ingest fails fast
    intercept[IllegalArgumentException] {
      grown.addVectors(batch, "vec_id", "embedding").codes.count()
    }
  }
}
