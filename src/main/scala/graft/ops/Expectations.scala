package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the validation gate a pipeline runs
  * before publishing a table (the generalization of the PPDB promote
  * path's J6 dangling-update abort): declare row-level rules, key
  * uniqueness and referential integrity, get back one small table of
  * (rule, n_violations) to alert or abort on.
  *
  * Cost model: ALL row-level rules and ALL uniqueness checks evaluate
  * in ONE scan — each rule is a conditional count inside the same
  * aggregate (violation = predicate false OR null, the SQL-constraint
  * convention), each unique key a count−countDistinct in the same
  * pass — so adding a rule costs an expression, not a scan.
  * Referential checks are per-parent left-anti probes (the only shape
  * that needs a second input); at scale the planner broadcasts the
  * parent's key projection when it fits.
  */
object Expectations {

  /** One-scan evaluation of row-level rules + unique-key rules.
    * Returns (rule, n_violations), one row per rule, in declaration
    * order.
    */
  def check(df: DataFrame, rowRules: Seq[(String, Column)],
      uniqueKeys: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(rowRules.nonEmpty || uniqueKeys.nonEmpty,
      "declare at least one expectation")
    val names = rowRules.map(_._1) ++ uniqueKeys.map(_._1)
    require(names.distinct.length == names.length,
      s"duplicate rule names: ${names.diff(names.distinct).distinct
        .mkString(", ")} — each rule needs a unique name")
    // internal aggregate aliases are INDEX-based (`rule_0`, `rule_1`, …)
    // so user-chosen rule names never enter column-name resolution — a
    // name holding a dot or stray backtick would parse as a nested-field
    // path (or fail outright); the user name travels only as literal DATA
    val rowAggs = rowRules.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(pred, 0L).otherwise(1L)).as(s"rule_$i")
    }
    val uniqAggs = uniqueKeys.zipWithIndex.map { case ((_, keys), i) =>
      (count(lit(1)) -
        count_distinct(struct(keys.map(col): _*)))
        .as(s"rule_${rowRules.length + i}")
    }
    val agged = df.agg((rowAggs ++ uniqAggs).head,
      (rowAggs ++ uniqAggs).tail: _*)
    // 1-row aggregate → one output row per rule (explode of a literal
    // name/value pair array; no second scan)
    agged.select(explode(array(names.zipWithIndex.map { case (n, i) =>
        struct(lit(n).as("rule"),
          coalesce(col(s"rule_$i"), lit(0L)).as("n_violations")) }: _*))
        .as("e"))
      .select(col("e.rule").as("rule"),
        col("e.n_violations").as("n_violations"))
  }

  /** Referential integrity: child rows whose key has no match in the
    * parent (left-anti count; null keys count as violations only when
    * `nullIsViolation`). Returns the same (rule, n_violations) shape
    * so results union with [[check]].
    */
  def checkRef(child: DataFrame, childKeys: Seq[String],
      parent: DataFrame, parentKeys: Seq[String], name: String,
      nullIsViolation: Boolean = false): DataFrame = {
    require(childKeys.length == parentKeys.length && childKeys.nonEmpty,
      "key lists must align")
    val joinCond = childKeys.zip(parentKeys).map { case (c, p) =>
      child(c) === parent(p)
    }.reduce(_ && _)
    val dangling = child.join(parent, joinCond, "left_anti")
    val counted =
      if (nullIsViolation) dangling
      else dangling.where(childKeys.map(c => col(c).isNotNull)
        .reduce(_ && _))
    counted.agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"))
  }
}
