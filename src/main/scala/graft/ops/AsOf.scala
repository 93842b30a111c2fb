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

    // equi-join semantics: NULL keys never match. Null-key left rows
    // bypass the window (they'd otherwise group together and match
    // null-key right rows) and come back with null payloads; null-key
    // right rows are unmatchable and are dropped.
    val anyKeyNull = keys.map(col(_).isNull).reduce(_ || _)
    val lOk = left.where(!anyKeyNull)
    val lNullKeys = left.where(anyKeyNull)
    val rOk = right.where(
      keys.map(col(_).isNotNull).reduce(_ && _))

    // the right payload rides as ONE struct so the carried columns stay
    // atomic: per-column last(ignoreNulls) would mix columns from
    // different right rows whenever the latest row holds a null
    val payload = struct(valueCols.map(col): _*)
    val payloadType = rOk.select(payload).schema.head.dataType

    val l2 = lOk.withColumn("__t", col(leftTime))
      .withColumn("__tb", col(leftTie))
      .withColumn("__side", lit(1))
      .withColumn("__v", lit(null).cast(payloadType))
    val lSchema = left.schema
    val r2Base = rOk.select(
      keys.map(col) :+
        col(rightTime).as("__t") :+
        col(rightTie).as("__tb") :+
        lit(0).as("__side") :+
        payload.as("__v"): _*)
    // left-only columns ride as typed nulls on right rows
    val r2 = leftCols.filterNot(keys.contains).foldLeft(r2Base) { (df, c) =>
      df.withColumn(c, lit(null).cast(lSchema(c).dataType))
    }
    val ordered = leftCols ++ Seq("__v", "__t", "__tb", "__side")
    val unioned = l2.select(ordered.map(col): _*)
      .unionByName(r2.select(ordered.map(col): _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__last", last(col("__v"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col("__last").getField(c).as(c)): _*)
    val nullPayloadType = payloadType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    matched.unionByName(
      valueCols.foldLeft(lNullKeys) { (df, c) =>
        df.withColumn(c, lit(null).cast(nullPayloadType(c).dataType))
      }.select((leftCols ++ valueCols).map(col): _*))
  }
}
