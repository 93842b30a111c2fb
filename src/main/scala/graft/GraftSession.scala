package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.VersionedCatalog
import graft.functions.{SpatialCell, VecDot}

/** SQL-facing session surface: exposes a catalog's tables as temp views so
  * `spark.sql("SELECT ... FROM DiaObject ...")` works against the current
  * snapshot, and registers the engine's custom expressions as SQL
  * functions (`spatial_cell(ra, dec, level)`, `vec_dot(a, b)`).
  *
  * Dotted catalog table names (internal.DiaObject) become underscored
  * view names (internal_DiaObject) — Spark temp views are single-part.
  */
object GraftSession {

  def registerFunctions(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("spatial_cell", exprs =>
      SpatialCell(exprs(0), exprs(1),
        exprs.lift(2).map(_.eval().asInstanceOf[Number].intValue)
          .getOrElse(SpatialCell.DefaultLevel)), "scala_udf")
    registry.createOrReplaceTempFunction("vec_dot", exprs =>
      VecDot(exprs(0), exprs(1)), "scala_udf")
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
