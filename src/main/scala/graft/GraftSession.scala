package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.VersionedCatalog
import graft.functions.{CharHashExpr, MinHashSigExpr, RepetitionExpr,
  ShingleHashExpr, SimHashExpr, SpatialCell, TextStatsExpr, VecDot,
  WinnowExpr}

/** SQL-facing session surface: exposes a catalog's tables as temp views so
  * `spark.sql("SELECT ... FROM DiaObject ...")` works against the current
  * snapshot, and registers the engine's custom expressions as SQL
  * functions (`spatial_cell(ra, dec, level)`, `vec_dot(a, b)`, and the
  * text-pipeline family: `char_hash(text)`, `simhash(text)`,
  * `shingle_hashes(text, n)`, `minhash_sig(hashes, numHashes)`,
  * `text_stats(text)`, `repetition_stats(text, n)`,
  * `winnow_fingerprints(text, k, w)`).
  *
  * Dotted catalog table names (internal.DiaObject) become underscored
  * view names (internal_DiaObject) — Spark temp views are single-part.
  */
object GraftSession {

  private def intArg(exprs: Seq[org.apache.spark.sql.catalyst.expressions
      .Expression], i: Int, name: String): Int =
    exprs.lift(i).map(_.eval().asInstanceOf[Number].intValue)
      .getOrElse(throw new IllegalArgumentException(
        s"$name: missing argument ${i + 1}"))

  /** Trailing string-literal arguments (e.g. a pattern list) —
    * rejected unless genuinely foldable STRING expressions (a column
    * reference would eval() against no row; a numeric literal would
    * silently stringify into a bogus pattern).
    */
  private def stringArgs(exprs: Seq[org.apache.spark.sql.catalyst
      .expressions.Expression], from: Int, name: String): Seq[String] = {
    val out = exprs.drop(from).map { e =>
      if (!e.foldable ||
          e.dataType != org.apache.spark.sql.types.StringType)
        throw new IllegalArgumentException(
          s"$name: pattern arguments must be string literals, got " +
            e.sql)
      Option(e.eval()).map(_.toString).getOrElse(
        throw new IllegalArgumentException(
          s"$name: pattern arguments must be non-null string literals"))
    }
    if (out.isEmpty) throw new IllegalArgumentException(
      s"$name: needs at least one pattern argument")
    out
  }

  // SQL numeric literals like 0.5 eval to Decimal, not Double
  private def probArgs(exprs: Seq[org.apache.spark.sql.catalyst.expressions
      .Expression], from: Int, name: String): Seq[Double] =
    exprs.drop(from).map(_.eval() match {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: java.lang.Number => n.doubleValue
      case other => throw new IllegalArgumentException(
        s"$name: probability literal expected, got $other")
    }).toSeq

  /** name -> expression builder for every engine SQL function — one
    * list, two consumers: [[registerFunctions]] (temp functions on an
    * existing session) and [[GraftExtensions]] (session-permanent
    * injection at builder time).
    */
  val functionBuilders: Seq[(String, Seq[org.apache.spark.sql.catalyst
      .expressions.Expression] => org.apache.spark.sql.catalyst
      .expressions.Expression)] = Seq(
    "spatial_cell" -> (exprs =>
      SpatialCell(exprs(0), exprs(1),
        exprs.lift(2).map(_.eval().asInstanceOf[Number].intValue)
          .getOrElse(SpatialCell.DefaultLevel))),
    "vec_dot" -> (exprs =>
      VecDot(exprs(0), exprs(1))),
    "char_hash" -> (exprs =>
      CharHashExpr(exprs(0))),
    "simhash" -> (exprs =>
      SimHashExpr(exprs(0))),
    "shingle_hashes" -> (exprs =>
      ShingleHashExpr(exprs(0), intArg(exprs, 1, "shingle_hashes"))),
    "minhash_sig" -> (exprs =>
      MinHashSigExpr(exprs(0), intArg(exprs, 1, "minhash_sig"))),
    "text_stats" -> (exprs =>
      TextStatsExpr(exprs(0),
        graft.ops.TextAnalysis.langLexicons.map(_._2))),
    "repetition_stats" -> (exprs =>
      RepetitionExpr(exprs(0), intArg(exprs, 1, "repetition_stats"))),
    "winnow_fingerprints" -> (exprs =>
      WinnowExpr(exprs(0), intArg(exprs, 1, "winnow_fingerprints"),
        intArg(exprs, 2, "winnow_fingerprints"))),
    "winnow_positions" -> (exprs =>
      graft.functions.WinnowPosExpr(exprs(0),
        intArg(exprs, 1, "winnow_positions"),
        intArg(exprs, 2, "winnow_positions"))),
    "cdc_chunks" -> (exprs =>
      graft.functions.CdcChunksExpr(exprs(0),
        intArg(exprs, 1, "cdc_chunks"),
        intArg(exprs, 2, "cdc_chunks"))),
    "cdc_chunks_clamped" -> (exprs =>
      graft.functions.CdcChunksClampedExpr(exprs(0),
        intArg(exprs, 1, "cdc_chunks_clamped"),
        intArg(exprs, 2, "cdc_chunks_clamped"),
        intArg(exprs, 3, "cdc_chunks_clamped"),
        intArg(exprs, 4, "cdc_chunks_clamped"))),
    "blocklist_hits" -> (exprs =>
      graft.functions.BlocklistHitsExpr(exprs(0),
        stringArgs(exprs, 1, "blocklist_hits"))),
    "blocklist_scrub" -> (exprs =>
      graft.functions.BlocklistScrubExpr(exprs(0),
        stringArgs(exprs, 1, "blocklist_scrub"))),
    "space_saving_topk" -> (exprs =>
      graft.functions.SpaceSavingTopK(exprs(0),
        intArg(exprs, 1, "space_saving_topk"),
        intArg(exprs, 2, "space_saving_topk")).toAggregateExpression()),
    "kll_quantiles" -> (exprs =>
      graft.functions.KllQuantiles(exprs(0),
        intArg(exprs, 1, "kll_quantiles"),
        probArgs(exprs, 2, "kll_quantiles")).toAggregateExpression()),
    "kll_sketch" -> (exprs =>
      graft.functions.KllSketchAgg(exprs(0),
        intArg(exprs, 1, "kll_sketch")).toAggregateExpression()),
    "kll_merge" -> (exprs =>
      graft.functions.KllMergeQuantiles(exprs(0),
        intArg(exprs, 1, "kll_merge"),
        probArgs(exprs, 2, "kll_merge")).toAggregateExpression()),
    "hll_sketch" -> (exprs =>
      graft.functions.HllSketchAgg(exprs(0),
        intArg(exprs, 1, "hll_sketch")).toAggregateExpression()),
    "hll_merge" -> (exprs =>
      graft.functions.HllMergeCount(exprs(0),
        intArg(exprs, 1, "hll_merge")).toAggregateExpression()),
    "cm_inner" -> (exprs =>
      graft.functions.CmInnerProduct(exprs(0), exprs(1),
        intArg(exprs, 2, "cm_inner"), intArg(exprs, 3, "cm_inner"))),
    "cm_sketch" -> (exprs =>
      graft.functions.CountMinSketchAgg(exprs(0),
        intArg(exprs, 1, "cm_sketch"), intArg(exprs, 2, "cm_sketch"),
        intArg(exprs, 3, "cm_sketch")).toAggregateExpression()),
    "cm_merge" -> (exprs =>
      graft.functions.CountMinMergeTopK(exprs(0),
        intArg(exprs, 1, "cm_merge"), intArg(exprs, 2, "cm_merge"),
        intArg(exprs, 3, "cm_merge"), intArg(exprs, 4, "cm_merge"))
        .toAggregateExpression()),
    "kmv_sketch" -> (exprs =>
      graft.functions.KmvSketchAgg(exprs(0),
        intArg(exprs, 1, "kmv_sketch")).toAggregateExpression()),
    "kmv_merge" -> (exprs =>
      graft.functions.KmvMergeAgg(exprs(0),
        intArg(exprs, 1, "kmv_merge")).toAggregateExpression()),
    "kmv_intersect" -> (exprs =>
      graft.functions.KmvIntersectEst(exprs(0), exprs(1))),
    "kmv_est" -> (exprs =>
      graft.functions.KmvEstimate(exprs(0))))

  def registerFunctions(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functionBuilders.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }

  /** Mount every table of `catalog` as a temp view over the CURRENT
    * snapshot (re-call after commits to advance the snapshot).
    */
  def mount(spark: SparkSession, catalog: VersionedCatalog): Seq[String] = {
    registerFunctions(spark)
    catalog.tables.toSeq.sorted.map { t =>
      val view = t.replace('.', '_')
      catalog.read(spark, t).createOrReplaceTempView(view)
      view
    }
  }

  def sql(spark: SparkSession, catalog: VersionedCatalog,
      query: String): DataFrame = {
    mount(spark, catalog)
    spark.sql(query)
  }
}
