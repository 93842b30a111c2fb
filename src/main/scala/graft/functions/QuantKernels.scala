package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Tight-loop vector-quantization kernels for the production ANN paths.
  *
  * The oracle-gated quantizer steps are deliberately relational (explode
  * the corpus into (vector, codeword) pairs, broadcast-join the codebook,
  * argmin through a map-side-combining aggregate) so DuckDB can replay
  * them bit-for-bit. That shape pays n·ksub materialized rows per
  * subspace — at production codebook sizes (m=16, ksub=256) the encode of
  * a 60k-vector corpus becomes 245M scored rows through a shuffle, and
  * the arithmetic inside is a dozen FLOPs per row. These kernels compute
  * the SAME argmin/argmax (identical IEEE op sequence, identical NaN and
  * tie disciplines — parity is spec-pinned against the relational forms)
  * as one map-only projection: the collected codebook rides inside the
  * expression as plain JVM arrays, each input vector is decoded once, and
  * all m·ksub candidate scores happen in one JIT-compiled loop. No join,
  * no shuffle, no Catalyst literal tree (embedding m·ksub·sd doubles as
  * literals is what OOM'd plan compilation at production sizes).
  *
  * Scale shape: the codebook is index-sidecar sized (m·ksub·sd doubles,
  * ≤ a few MB) and serializes once per task — the executor-side cost is
  * exactly FAISS's: O(dims·ksub) per vector, embarrassingly parallel,
  * zero data movement. CodegenFallback is deliberate: the kernel body IS
  * the hot loop, so generated-vs-interpreted dispatch around it is noise,
  * and the projection sits alone between two codegen stages.
  */
object QuantKernels {

  /** Decode a numeric ArrayData to doubles once per row; float→double
    * widening is exact, so downstream products match the relational
    * VecDot (which widens per element) bit-for-bit.
    */
  private[graft] def toDoubles(a: ArrayData, t: DataType): Array[Double] = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    t match {
      case FloatType => while (i < n) { out(i) = a.getFloat(i).toDouble; i += 1 }
      case DoubleType => while (i < n) { out(i) = a.getDouble(i); i += 1 }
      case IntegerType => while (i < n) { out(i) = a.getInt(i).toDouble; i += 1 }
      case LongType => while (i < n) { out(i) = a.getLong(i).toDouble; i += 1 }
      case other =>
        throw new IllegalArgumentException(s"quant kernel over $other array")
    }
    out
  }

  /** Ordered dot product, ascending index from 0.0 — the VecDot fold. */
  private[graft] def dot(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Ordered self dot (|v|² as VecDot(v, v) computes it). */
  private[graft] def selfDot(v: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < v.length) { acc += v(i) * v(i); i += 1 }
    acc
  }

  /** Ordered dot of a subvector window [off, off+sd) of `v` against a
    * codeword — the `dot(slice(vec, off+1, sd), c)` arithmetic.
    */
  private[graft] def sliceDot(v: Array[Double], off: Int, sd: Int,
      c: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < sd && off + i < v.length && i < c.length) {
      acc += v(off + i) * c(i); i += 1
    }
    acc
  }

  /** "a sorts strictly before b" under Spark's double ordering (NaN
    * GREATEST): the argmin replace test.
    */
  private[graft] def ltNanGreatest(a: Double, b: Double): Boolean =
    a < b || (b != b && a == a)
}

/** Collected coarse-centroid table: ids ASCENDING (the tie-break order),
  * norms precomputed once. A plain holder class so plan strings show a
  * summary, not kc·dims doubles.
  */
final class CentroidsLocal(val ids: Array[Long],
    val vecs: Array[Array[Double]]) extends Serializable {
  require(ids.length == vecs.length && ids.nonEmpty, "empty centroid table")
  require(ids.indices.tail.forall(i => ids(i - 1) < ids(i)),
    "centroid ids must be strictly ascending")
  val norms: Array[Double] = vecs.map(v => math.sqrt(QuantKernels.selfDot(v)))
  override def toString: String = s"centroids(k=${ids.length})"
}

/** Collected PQ codebooks: per subspace, code ids ASCENDING with their
  * codewords and precomputed |c|² (the constant term of the argmin
  * score). Holder class for the same plan-string reason.
  */
final class CodebooksLocal(val ids: Array[Array[Long]],
    val vecs: Array[Array[Array[Double]]]) extends Serializable {
  require(ids.length == vecs.length && ids.nonEmpty, "empty codebooks")
  val m: Int = ids.length
  val ccs: Array[Array[Double]] = vecs.map(_.map(QuantKernels.selfDot))
  ids.zipWithIndex.foreach { case (sub, j) =>
    require(sub.nonEmpty, s"no codebook entries for subspace $j")
    require(sub.indices.tail.forall(i => sub(i - 1) < sub(i)),
      s"subspace $j code ids must be strictly ascending")
  }
  override def toString: String = s"codebooks(m=$m,ksub=${ids(0).length})"
}

/** Argmax-cosine cell id — the kernel twin of [[graft.ops.Similarity.assign]]:
  * sim = dot/(|v|·|c|) with NaN (zero-norm either side) mapped to −∞ so a
  * degenerate centroid never wins, ties to the LOWEST centroid id. One
  * map-only projection replaces the crossJoin + max-of-struct shuffle.
  */
case class NearestCentroidId(child: Expression, cents: CentroidsLocal)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"

  @transient private lazy val elemT =
    child.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(in: Any): Any = {
    val v = QuantKernels.toDoubles(in.asInstanceOf[ArrayData], elemT)
    val va = math.sqrt(QuantKernels.selfDot(v))
    var bestSim = Double.NegativeInfinity
    var bestId = cents.ids(0)
    var k = 0
    while (k < cents.ids.length) {
      val np = va * cents.norms(k)
      var sim = Double.NegativeInfinity
      if (np != 0.0) {
        val s0 = QuantKernels.dot(v, cents.vecs(k)) / np
        if (s0 == s0) sim = s0
      }
      if (sim > bestSim) { bestSim = sim; bestId = cents.ids(k) }
      k += 1
    }
    bestId
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** All m PQ codes of a vector in one pass — the kernel twin of
  * [[graft.ops.Similarity.pqEncode]]: per subspace j the code minimizing
  * |c|² − 2·v_j·c (the |v_j|² term is constant under the argmin), NaN
  * scores lose (Spark's NaN-greatest ordering), ties to the LOWEST code
  * id. Returns array<long> of length m in subspace order.
  */
case class PqCodes(child: Expression, cb: CodebooksLocal, sd: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_codes"

  @transient private lazy val elemT =
    child.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(in: Any): Any = {
    val v = QuantKernels.toDoubles(in.asInstanceOf[ArrayData], elemT)
    val out = new Array[Long](cb.m)
    var j = 0
    while (j < cb.m) {
      val off = j * sd
      val ids = cb.ids(j)
      val cws = cb.vecs(j)
      val ccs = cb.ccs(j)
      var bestScore = ccs(0) - 2.0 * QuantKernels.sliceDot(v, off, sd, cws(0))
      var bestCode = ids(0)
      var k = 1
      while (k < ids.length) {
        val score = ccs(k) - 2.0 * QuantKernels.sliceDot(v, off, sd, cws(k))
        if (QuantKernels.ltNanGreatest(score, bestScore)) {
          bestScore = score; bestCode = ids(k)
        }
        k += 1
      }
      out(j) = bestCode
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Per-subspace ADC lookup tables for one query: tabs(j) maps code id →
  * the query's squared-L2 contribution in subspace j, exactly the dj
  * values the relational distance table carries.
  */
final class AdcTablesLocal(val m: Int,
    val tabs: Array[scala.collection.mutable.LongMap[Double]])
    extends Serializable {
  require(tabs.length == m, "one table per subspace")
  override def toString: String = s"adc_tables(m=$m)"
}

/** ADC distance of a packed code row — the kernel twin of
  * [[graft.ops.Similarity.pqTopK]]'s pivoted-sum tail: m table lookups
  * summed in fixed subspace order (d0 + d1 + …, the same left fold as
  * the relational reduce). A code the tables don't cover (mismatched
  * index tables) yields NULL, mirroring the relational inner-join drop —
  * callers filter isNotNull exactly as the relational path filters its
  * null pivot columns.
  */
case class AdcDist(child: Expression, tabs: AdcTablesLocal)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_dist"

  override protected def nullSafeEval(in: Any): Any = {
    val codes = in.asInstanceOf[ArrayData]
    if (codes.numElements() != tabs.m) null
    else {
      var acc = 0.0
      var j = 0
      var missing = false
      while (j < tabs.m && !missing) {
        val t = tabs.tabs(j)
        val code = codes.getLong(j)
        if (!t.contains(code)) missing = true
        else acc = if (j == 0) t(code) else acc + t(code)
        j += 1
      }
      if (missing) null else acc
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Per-CELL ADC tables (shared-codebook IVFADC: the tables differ across
  * probed cells only through the query's per-cell residual).
  */
final class CellAdcTablesLocal(val m: Int,
    val cells: scala.collection.mutable.LongMap[Array[
      scala.collection.mutable.LongMap[Double]]]) extends Serializable {
  override def toString: String =
    s"cell_adc_tables(m=$m,nprobe=${cells.size})"
}

/** ADC distance under the probed cell's table — the kernel twin of
  * [[graft.ops.Similarity.ivfPqTopKShared]]'s tail. NULL for a cell
  * outside the probe set or a code outside the tables (the relational
  * inner-join drop); callers pre-filter to probed cells so the cell miss
  * is a guard, not the pruning mechanism.
  */
case class AdcDistCell(left: Expression, right: Expression,
    tabs: CellAdcTablesLocal) extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_dist_cell"

  override protected def nullSafeEval(cell: Any, codesIn: Any): Any = {
    val perCell = tabs.cells.getOrNull(cell.asInstanceOf[Long])
    if (perCell == null) null
    else {
      val codes = codesIn.asInstanceOf[ArrayData]
      if (codes.numElements() != tabs.m) null
      else {
        var acc = 0.0
        var j = 0
        var missing = false
        while (j < tabs.m && !missing) {
          val t = perCell(j)
          val code = codes.getLong(j)
          if (!t.contains(code)) missing = true
          else acc = if (j == 0) t(code) else acc + t(code)
          j += 1
        }
        if (missing) null else acc
      }
    }
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

object QuantKernelCols {
  def nearestCentroid(vec: Column, cents: CentroidsLocal): Column =
    ColumnBridge.column(
      NearestCentroidId(ColumnBridge.expression(vec), cents))

  def pqCodes(vec: Column, cb: CodebooksLocal, sd: Int): Column =
    ColumnBridge.column(PqCodes(ColumnBridge.expression(vec), cb, sd))

  def adcDist(codes: Column, tabs: AdcTablesLocal): Column =
    ColumnBridge.column(AdcDist(ColumnBridge.expression(codes), tabs))

  def adcDistCell(cell: Column, codes: Column,
      tabs: CellAdcTablesLocal): Column =
    ColumnBridge.column(AdcDistCell(ColumnBridge.expression(cell),
      ColumnBridge.expression(codes), tabs))
}
