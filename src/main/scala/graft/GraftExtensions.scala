package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Engine integration via the standard extension point: build the
  * session with `.withExtensions(new GraftExtensions)` — or ship
  * `spark.sql.extensions=graft.GraftExtensions` in spark-defaults — and
  * the engine's SQL functions ([[GraftSession.functionBuilders]]: the
  * spatial/text/vector expressions and every sketch summary pair) are
  * session-permanent, no per-session registration call, plus the
  * [[graft.plans.BinnedRangeJoinRule]] optimizer rule that turns
  * point-in-interval theta-joins into binned equi-joins when
  * `spark.graft.rangejoin.binwidth` is set.
  *
  * [[GraftSession.registerFunctions]] remains the path for sessions the
  * caller does not construct (notebooks, shells); both consume the same
  * builder list, so SQL behaves identically either way.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.BinnedRangeJoinRule())
    GraftSession.functionBuilders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftSession", name), builder))
    }
  }
}
