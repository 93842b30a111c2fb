package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** A TRAINED document-quality classifier — the learned filter stage of a
  * training-data curation pipeline (the role fastText/logistic models
  * play in web-corpus curation), expressed entirely as DataFrame
  * aggregation: full-batch gradient descent where each iteration is ONE
  * `agg` over the corpus (map-side partial sums, a (d+1)-element result
  * row on the driver) and scoring is map-only. Nothing but the weight
  * vector ever leaves the executors, so training cost is
  * O(iters · scan) at any corpus size.
  *
  * Exactness discipline (what makes the whole training TRAJECTORY
  * oracle-checkable bit-for-bit): the activation is the piecewise-linear
  * "hard sigmoid" clamp(z/4 + 1/2, 0, 1) — no transcendentals, so every
  * arithmetic step is an IEEE-754 correctly-rounded +,-,*,/ that any
  * compliant engine reproduces exactly — and per-row gradient
  * contributions are rounded to 2^-24 fixed point BEFORE the sum, which
  * then runs in BIGINT: the aggregate is independent of partition count
  * and row order (double summation would be neither), the same
  * discipline the engine's integer-cents revenue aggregates use.
  *
  * Features reuse the single-pass [[graft.functions.TextExprs]] stats
  * struct (one pass over each document, codegen'd); scale factors are
  * powers of two so the feature doubles are lossless rescalings of the
  * oracle-checked ts2 quality stats.
  */
object QualityModel {

  /** Fixed-point scale for gradient rounding: 2^24. */
  val Scale: Double = (1L << 24).toDouble

  val NumFeatures = 5 // intercept + 4 text stats

  /** clamp(z/4 + 1/2, 0, 1) — the transcendental-free sigmoid stand-in
    * (standard in quantized networks; exact in any IEEE engine).
    */
  def hardSigmoid(z: Column): Column =
    greatest(lit(0.0), least(lit(1.0), z * lit(0.25) + lit(0.5)))

  /** Deterministic RAW per-document features and heuristic label:
    * x1 = token count / 256, x2 = mean token length / 8 (power-of-two
    * scales — lossless), x3 = punctuation ratio, x4 = stopword ratio;
    * y = 1 when the ts2 quality heuristic exceeds 0.625 (an exact binary
    * constant near the corpus median — the fixture's scores live in
    * [0.60, 0.69], so 0.5 would label everything 1). The trained model
    * learns to reproduce (and smooth) the heuristic from raw stats — the
    * standard bootstrap for corpus-quality models when no human labels
    * exist.
    */
  def rawFeatures(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    // no spread: stats() is one pass of per-row counters (token counts,
    // ratios) — cheap enough that the exchange loses (r17 measured the
    // spread 1.31× normalized slower on ts23)
    docs
      .select(col(idCol), TextAnalysis.stats(col(textCol)).as("st"))
      .select(
        col(idCol),
        (TextAnalysis.tokenCountOf(col("st")).cast("double") / lit(256.0))
          .as("x1"),
        (TextAnalysis.meanTokenLenOf(col("st")) / lit(8.0)).as("x2"),
        TextAnalysis.punctRatioOf(col("st")).as("x3"),
        TextAnalysis.stopwordRatioOf(col("st")).as("x4"),
        when(TextAnalysis.qualityScoreOf(col("st")) > 0.625, lit(1.0))
          .otherwise(lit(0.0)).as("y"))

  /** Center each raw feature by its EXACT corpus mean (fixed-point
    * integer sums — partition-order-free, like the gradient) and scale
    * by 16 (power of two — lossless). Without this, the tiny raw class
    * signal hides under the intercept and full-batch GD stalls at the
    * majority class; with it the model reaches ~96% label agreement in
    * 16 rounds. One extra distributed agg, map-only after.
    */
  def features(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val raw = rawFeatures(docs, textCol, idCol)
    centerWith(raw, featureMeans(raw), idCol)
  }

  private def zOf(w: Array[Double]): Column =
    lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
      lit(w(3)) * col("x3") + lit(w(4)) * col("x4")

  /** One row-wise fixed-point gradient component: floor(c·2^24 + 1/2) as
    * BIGINT (floor keeps negative-value semantics identical in SQL).
    */
  private def fx(c: Column): Column =
    floor(c * lit(Scale) + lit(0.5)).cast("long")

  /** Full-batch gradient descent from w = 0: per iteration, one
    * distributed agg yields the exact integer gradient sums; the weight
    * update runs on the driver in the same op order the SQL oracle
    * unrolls. Returns the final weights.
    */
  def train(feats: DataFrame, iters: Int = 16, lr: Double = 2.0)
      : Array[Double] = {
    var w = Array.fill(NumFeatures)(0.0)
    for (_ <- 1 to iters) {
      val err = hardSigmoid(zOf(w)) - col("y")
      val r: Row = feats.agg(
        count(lit(1)).as("n"),
        sum(fx(err)).as("s0"),
        sum(fx(err * col("x1"))).as("s1"),
        sum(fx(err * col("x2"))).as("s2"),
        sum(fx(err * col("x3"))).as("s3"),
        sum(fx(err * col("x4"))).as("s4")).head()
      val n = r.getLong(0).toDouble
      w = Array.tabulate(NumFeatures)(j =>
        w(j) - lr * ((r.getLong(j + 1) / Scale) / n))
    }
    w
  }

  /** Map-only scoring with trained weights: score_fx is the hard-sigmoid
    * probability in 2^-24 fixed point (exact integers hash-compare across
    * engines; the double itself would too, but integers make the
    * contract obvious). Keeps the heuristic label alongside for
    * agreement audits.
    */
  def score(feats: DataFrame, w: Array[Double],
      idCol: String = "doc_id"): DataFrame =
    feats.select(
      col(idCol),
      fx(hardSigmoid(zOf(w))).as("score_fx"),
      col("y").as("label"))

  /** The gate composition: featurize → train `iters` rounds → score.
    * The featurized corpus is persisted so the `iters` training aggs and
    * the scoring pass share one stats scan; the returned DataFrame reads
    * that cache, so release follows the repo-wide convention for
    * persisted query internals — `spark.catalog.clearCache()` after the
    * result is materialized (the cache IS CacheManager-visible).
    */
  def trainScore(docs: DataFrame, textCol: String = "text",
      iters: Int = 16, lr: Double = 2.0,
      idCol: String = "doc_id"): DataFrame = {
    val feats = features(docs, textCol, idCol)
    feats.persist()
    score(feats, train(feats, iters, lr), idCol)
  }

  // ------------------------------------------------- persistence (train
  // once on a reference corpus, score many later batches — the same
  // build/probe split the ANN indexes use; the "model" is NumFeatures
  // weights plus the feature means frozen at training time, stored as
  // one catalog table row per coefficient)

  /** Persist trained weights + the training-corpus feature means. */
  def save(cat: graft.catalog.VersionedCatalog, name: String,
      w: Array[Double], means: Array[Double],
      spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    require(w.length == NumFeatures && means.length == NumFeatures - 1)
    val rows = w.zipWithIndex.map { case (v, j) => ("w", j, v) } ++
      means.zipWithIndex.map { case (v, j) => ("mean", j + 1, v) }
    cat.commit(Map(name -> rows.toSeq.toDF("kind", "idx", "value")))
    ()
  }

  /** Load (weights, means) saved by [[save]]. */
  def load(spark: org.apache.spark.sql.SparkSession,
      cat: graft.catalog.VersionedCatalog, name: String)
      : (Array[Double], Array[Double]) = {
    val rows = cat.read(spark, name).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    (Array.tabulate(NumFeatures)(j => rows(("w", j))),
      Array.tabulate(NumFeatures - 1)(j => rows(("mean", j + 1))))
  }

  /** The exact feature means [[features]] centers by — exposed so a
    * frozen model can re-create its training-time standardization on a
    * NEW batch (centering a new batch by ITS OWN means would shift every
    * score; the model's means are part of the model).
    */
  def featureMeans(raw: DataFrame): Array[Double] = {
    val r = raw.agg(
      count(lit(1)), sum(fx(col("x1"))), sum(fx(col("x2"))),
      sum(fx(col("x3"))), sum(fx(col("x4")))).head()
    val n = r.getLong(0).toDouble
    Array.tabulate(NumFeatures - 1)(j => (r.getLong(j + 1) / Scale) / n)
  }

  /** Center raw features with FROZEN means (a stored model's view of a
    * new batch).
    */
  def centerWith(raw: DataFrame, means: Array[Double],
      idCol: String = "doc_id"): DataFrame =
    raw.select(
      col(idCol),
      ((col("x1") - lit(means(0))) * lit(16.0)).as("x1"),
      ((col("x2") - lit(means(1))) * lit(16.0)).as("x2"),
      ((col("x3") - lit(means(2))) * lit(16.0)).as("x3"),
      ((col("x4") - lit(means(3))) * lit(16.0)).as("x4"),
      col("y"))

  /** Score a NEW batch under a frozen stored model: featurize, center by
    * the model's training-time means, apply its weights — map-only, no
    * training pass, exactly what the model would have scored at train
    * time (the streaming-admission shape: the stream's foreachBatch
    * calls this per micro-batch with the same frozen (w, means)).
    */
  def scoreWith(docs: DataFrame, w: Array[Double], means: Array[Double],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    score(centerWith(rawFeatures(docs, textCol, idCol), means, idCol),
      w, idCol)
}
