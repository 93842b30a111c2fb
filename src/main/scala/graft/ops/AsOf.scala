package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark has no native form of.
  *
  * Attaches to every left row the LATEST right row of the same key with
  * right time ≤ left time (rows with no earlier right match keep nulls).
  * The naive formulation is a range join (`l.t >= r.t` non-equi → a
  * per-key cross product); this one is the scalable union-window form:
  *
  *  1. tag both sides and union them (right rows sort before left rows
  *     at equal time, so same-instant right rows are visible);
  *  2. one window per key ordered by (time, side, tiebreak) carries the
  *     last non-null right payload forward (`last(..., ignoreNulls)`);
  *  3. keep the left rows.
  *
  * Cost: ONE shuffle on the key + a per-key sort — the same bound as any
  * keyed window, no quadratic blowup however dense the right side. The
  * PPDB analogue is validity-interval lookup (DiaObject version in force
  * at a source's observation time); the training-pipeline analogue is
  * "latest model/config/label state at sample time".
  */
object AsOf {

  /** @param keys       equi-join key columns (present on both sides)
    * @param leftTime   left event-time column (orderable; epoch numbers)
    * @param rightTime  right event-time column (same type as leftTime)
    * @param leftTie    unique-per-(key, time) left tiebreak column
    * @param rightTie   unique-per-(key, time) right tiebreak column
    * @param valueCols  right columns to attach (names must not collide
    *                   with left columns)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, leftTie: String,
      rightTie: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(valueCols.intersect(leftCols).isEmpty,
      s"value columns ${valueCols.intersect(leftCols)} collide with left")
    val rSchema = right.schema

    val l2 = valueCols.foldLeft(
      left.withColumn("__t", col(leftTime))
        .withColumn("__tb", col(leftTie))
        .withColumn("__side", lit(1))) { (df, c) =>
      df.withColumn(s"__v_$c", lit(null).cast(rSchema(c).dataType))
    }
    val lSchema = left.schema
    val r2Base = right.select(
      (keys.map(col) :+
        col(rightTime).as("__t") :+
        col(rightTie).as("__tb") :+
        lit(0).as("__side")) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    // left-only columns ride as typed nulls on right rows
    val r2 = leftCols.filterNot(keys.contains).foldLeft(r2Base) { (df, c) =>
      df.withColumn(c, lit(null).cast(lSchema(c).dataType))
    }
    val ordered = leftCols ++ valueCols.map(c => s"__v_$c") ++
      Seq("__t", "__tb", "__side")
    val unioned = l2.select(ordered.map(col): _*)
      .unionByName(r2.select(ordered.map(col): _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    attached.where(col("__side") === 1)
      .select((leftCols ++ valueCols).map(col): _*)
  }
}
