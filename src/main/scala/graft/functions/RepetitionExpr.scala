package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word n-gram repetition statistics — the raw counts behind
  * Gopher-style repetition quality filters (fraction of duplicate
  * n-grams, fraction of tokens claimed by the most frequent n-gram).
  *
  * Semantics (kept oracle-reproducible, same tokenization as the shingle
  * family): words = split on a single space keeping empties; grams =
  * every consecutive `n`-word window joined with a space (NOT distinct —
  * frequency is the point). Output struct:
  *
  *  - n_grams    = max(len(words) - n + 1, 0)   total n-grams
  *  - n_distinct = number of distinct gram strings
  *  - top_count  = occurrences of the most frequent gram (0 when no grams)
  *
  * One row-local hash map per row; no shuffle, no explode — at 100 TB
  * this runs as a map-only projection inside whole-stage codegen, versus
  * the explode + two-level groupBy the naive formulation needs.
  */
case class RepetitionExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = new StructType()
    .add("n_grams", LongType, nullable = false)
    .add("n_distinct", LongType, nullable = false)
    .add("top_count", LongType, nullable = false)
  override def prettyName: String = "repetition_stats"

  /** codegen entry point (instance rides along as a reference object). */
  def compute(s: UTF8String): InternalRow =
    nullSafeEval(s).asInstanceOf[InternalRow]

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repetitionExpr", this,
      classOf[RepetitionExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    val total = words.length - n + 1
    if (total <= 0) return InternalRow(0L, 0L, 0L)
    val counts = new java.util.HashMap[String, Int](total * 2)
    var top = 0
    var i = 0
    if (n == 1) {
      while (i < total) {
        val c = counts.merge(words(i), 1, Integer.sum)
        if (c > top) top = c
        i += 1
      }
    } else {
      val sb = new java.lang.StringBuilder
      while (i < total) {
        sb.setLength(0)
        sb.append(words(i))
        var k = 1
        while (k < n) { sb.append(' ').append(words(i + k)); k += 1 }
        val c = counts.merge(sb.toString, 1, Integer.sum)
        if (c > top) top = c
        i += 1
      }
    }
    InternalRow(total.toLong, counts.size.toLong, top.toLong)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RepetitionExpr {
  def repetitionStats(text: Column, n: Int): Column =
    ColumnBridge.column(RepetitionExpr(ColumnBridge.expression(text), n))
}
