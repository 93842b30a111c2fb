package graft

import org.apache.spark.sql.functions._

import graft.ops.QualityModel

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"
  private lazy val docs = Tables.documents(spark, sf)

  test("training trajectory is partition-order-free and deterministic " +
      "(exact fixed-point gradient sums)") {
    val feats = QualityModel.features(docs).cache()
    val w1 = QualityModel.train(feats.repartition(7), iters = 4)
    val w2 = QualityModel.train(feats.coalesce(1), iters = 4)
    val w3 = QualityModel.train(feats.repartition(13), iters = 4)
    // bit-identical, not approximately equal: the fixed-point discipline
    // makes the distributed sum independent of partitioning, which is
    // what lets the unrolled SQL oracle replay training exactly
    assert(w1.toSeq == w2.toSeq && w2.toSeq == w3.toSeq,
      s"${w1.toSeq} vs ${w2.toSeq} vs ${w3.toSeq}")
    assert(QualityModel.train(feats, iters = 4).toSeq == w1.toSeq)
    feats.unpersist()
    ()
  }

  test("the trained classifier learns the quality heuristic: balanced " +
      "labels, >= 90% agreement at the gate configuration") {
    val feats = QualityModel.features(docs).persist()
    val posFrac = feats.agg(avg($"y")).head().getDouble(0)
    assert(posFrac > 0.2 && posFrac < 0.8,
      s"degenerate label balance $posFrac — threshold no longer splits " +
        "the fixture")
    val w = QualityModel.train(feats) // gate defaults: 16 rounds, lr 2.0
    val scored = QualityModel.score(feats, w)
    // score_fx > 2^23 <=> probability > 0.5
    val agree = scored
      .select((($"score_fx" > (1L << 23)) === ($"label" === 1.0))
        .cast("int").as("ok"))
      .agg(avg($"ok")).head().getDouble(0)
    info(f"label-1 fraction $posFrac%.3f, agreement $agree%.3f, " +
      s"w=${w.map(x => f"$x%.3f").mkString(",")}")
    assert(agree >= 0.90, f"agreement $agree%.3f below 0.90")
    // more training never leaves the model below the gate configuration
    // by much — sanity that 16 rounds sit on the converged plateau
    val w32 = QualityModel.train(feats, iters = 32)
    val agree32 = QualityModel.score(feats, w32)
      .select((($"score_fx" > (1L << 23)) === ($"label" === 1.0))
        .cast("int").as("ok"))
      .agg(avg($"ok")).head().getDouble(0)
    assert(agree32 >= agree - 0.02, f"32-round $agree32%.3f collapsed")
    feats.unpersist()
    ()
  }

  test("persist/reopen: a frozen model scores NEW batches under its " +
      "training-time means (build-once, score-many)") {
    import graft.catalog.VersionedCatalog
    val trainDocs = docs.where($"doc_id" % 2 === 0)
    val newDocs = docs.where($"doc_id" % 2 =!= 0)
    val raw = QualityModel.rawFeatures(trainDocs)
    val means = QualityModel.featureMeans(raw)
    val feats = QualityModel.centerWith(raw, means).cache()
    val w = QualityModel.train(feats)
    val root = tmpDir("qmodel")
    QualityModel.save(new VersionedCatalog(root), "quality_model",
      w, means, spark)
    val (w2, m2) = QualityModel.load(spark, new VersionedCatalog(root),
      "quality_model")
    assert(w2.toSeq == w.toSeq && m2.toSeq == means.toSeq,
      "weights/means round-trip bit-exactly")
    val fresh = QualityModel.scoreWith(newDocs, w, means)
    val loaded = QualityModel.scoreWith(newDocs, w2, m2)
    assert(fresh.exceptAll(loaded).isEmpty && loaded.exceptAll(fresh).isEmpty)
    // the frozen means ARE part of the model: centering the new batch by
    // its own means instead would shift scores
    val selfCentered = QualityModel.score(
      QualityModel.features(newDocs), w)
    assert(fresh.exceptAll(selfCentered).count() > 0,
      "frozen-mean and self-mean scoring should differ on a shifted batch")
    feats.unpersist()
    ()
  }

  test("scoring is map-only and training aggregates partial map-side " +
      "(no row shuffle in the hot path)") {
    val feats = QualityModel.features(docs)
    val w = Array(0.1, 0.2, -0.3, 0.0, 0.4)
    val plan = QualityModel.score(feats, w).queryExecution.executedPlan
      .toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"scoring shuffles rows:\n$plan")
  }
}
