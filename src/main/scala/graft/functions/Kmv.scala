package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** KMV / theta sketch (Bar-Yossef et al. "Counting distinct elements in a
  * data stream", RANDOM 2002; Dasgupta et al., "A framework for
  * estimating stream expression cardinalities" — the DataSketches theta
  * family): keep the k MINIMUM distinct 64-bit hash values of a column.
  * The piece of the summary-table family the others can't cover: HLL
  * registers union losslessly but CANNOT intersect — audience-overlap
  * questions ("how many users did BOTH") need the actual minimum-hash
  * SAMPLE, which is what a KMV sketch stores. Union = merge + keep k
  * smallest (associative/commutative/idempotent, so stored partials
  * re-merge freely like the other sketches); intersection = count common
  * hashes below both sketches' thresholds, scaled back up.
  *
  * Exactness discipline (what the oracle pins, same pattern as KLL's
  * distinct-bounded head and CM's capacity regime): while a sketch holds
  * FEWER than k hashes it IS its input's exact distinct hash set — theta
  * = 1, estimates and intersections are exact counts, bit-comparable to
  * a DuckDB COUNT(DISTINCT). Past k the estimator is (k−1)/theta with
  * relative error ≈ 1/√(k−2) (~1.6% at k = 4096; 8 bytes/entry, 32 KiB).
  *
  * The hash is [[Bloom.mix]] under a dedicated salt — deterministic,
  * so sketches built anywhere agree on which hashes are "the" minima.
  */
final class KmvBuf(val k: Int) {
  require(k >= 16 && k <= (1 << 20), s"k must be in [16, 2^20], got $k")
  // signed-comparable form (h ^ Long.MinValue): natural ordering == the
  // unsigned ordering of the raw hashes
  val set = new java.util.TreeSet[java.lang.Long]()

  def addHash(h: Long): Unit = {
    val s = h ^ Long.MinValue
    if (set.size < k) { set.add(s); () }
    else if (s < set.last()) {
      if (set.add(s)) { set.remove(set.last()); () }
    }
  }

  def add(item: Long): Unit = addHash(Bloom.mix(item, 0x27d4eb2f165667c5L))

  def mergeIn(o: KmvBuf): Unit = {
    val it = o.set.iterator()
    while (it.hasNext) {
      val s = it.next()
      if (set.size < k) { set.add(s); () }
      else if (s < set.last()) {
        if (set.add(s)) { set.remove(set.last()); () }
      } else return // o is sorted ascending: the rest can't qualify
    }
  }

  /** theta in (0, 1]: 1 while exact (fewer than k entries), else the
    * k-th smallest hash as a fraction of the 64-bit space.
    */
  def theta: Double =
    if (set.size < k) 1.0
    else Kmv.unsignedFrac(set.last() ^ Long.MinValue)

  /** Distinct estimate: exact count below k, else (k−1)/theta. */
  def estimate: Long =
    if (set.size < k) set.size.toLong
    else math.round((k - 1).toDouble / theta)

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * set.size)
    bb.putInt(k); bb.putInt(set.size)
    val it = set.iterator()
    while (it.hasNext) bb.putLong(it.next() ^ Long.MinValue) // raw hashes
    bb.array()
  }
}

object Kmv {
  /** Unsigned 64-bit value as a fraction of 2^64 (double precision). */
  def unsignedFrac(h: Long): Double =
    ((h >>> 1).toDouble * 2.0 + (h & 1L).toDouble) / 1.8446744073709552e19

  def fromBytes(bytes: Array[Byte], k: Int): KmvBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val storedK = bb.getInt
    require(storedK == k,
      s"stored KMV sketch has k=$storedK, expected $k — parameter mismatch")
    val n = bb.getInt
    require(bytes.length == 8 + 8 * n,
      s"KMV sketch is ${bytes.length} bytes, expected ${8 + 8 * n}")
    val buf = new KmvBuf(k)
    var i = 0
    while (i < n) { buf.addHash(bb.getLong); i += 1 }
    buf
  }

  /** Intersection-cardinality estimate of two serialized sketches:
    * common hashes below min(thetaA, thetaB), scaled by 1/thetaMin.
    * Exact (a plain set-intersection count) when both sides are exact.
    * Static so generated code can call it directly.
    */
  def intersectEst(a: Array[Byte], b: Array[Byte]): Long = {
    val (ka, kb) = (ByteBuffer.wrap(a).getInt, ByteBuffer.wrap(b).getInt)
    val ba = fromBytes(a, ka)
    val bb = fromBytes(b, kb)
    val thetaMin = math.min(ba.theta, bb.theta)
    val cut = if (thetaMin >= 1.0) None
      else Some(math.min(
        ba.set.last().longValue(), bb.set.last().longValue()))
    var common = 0L
    val it = ba.set.iterator()
    while (it.hasNext) {
      val s = it.next()
      if (cut.forall(s <= _) && bb.set.contains(s)) common += 1
    }
    if (thetaMin >= 1.0) common else math.round(common.toDouble / thetaMin)
  }

  /** Distinct estimate of one serialized sketch (exact below k). */
  def estimateOf(bytes: Array[Byte]): Long =
    fromBytes(bytes, ByteBuffer.wrap(bytes).getInt).estimate

  /** k-minimum-hash sketch of a BIGINT column (BINARY) — store it;
    * [[kmvMerge]] unions slices, [[kmvIntersect]] answers overlaps. */
  def kmvSketch(v: Column, k: Int = 4096): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(v), k).toAggregateExpression())

  /** Union stored sketches; struct<n_distinct, sketch>. */
  def kmvMerge(sk: Column, k: Int = 4096): Column =
    ColumnBridge.column(
      KmvMergeAgg(ColumnBridge.expression(sk), k).toAggregateExpression())

  /** Overlap estimate between two stored sketches (BIGINT). */
  def kmvIntersect(a: Column, b: Column): Column =
    ColumnBridge.column(KmvIntersectEst(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Distinct estimate of one stored sketch (BIGINT; exact below k). */
  def kmvEst(sk: Column): Column =
    ColumnBridge.column(KmvEstimate(ColumnBridge.expression(sk)))
}

/** `kmv_sketch(v, k)`: aggregate a BIGINT column into its k smallest
  * distinct hashes (BINARY).
  */
case class KmvSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuf] {
  require(k >= 16 && k <= (1 << 20), s"k must be in [16, 2^20], got $k")
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires a BIGINT input, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): KmvBuf = new KmvBuf(k)
  override def update(buf: KmvBuf, input: InternalRow): KmvBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }
  override def merge(buf: KmvBuf, other: KmvBuf): KmvBuf = {
    buf.mergeIn(other); buf
  }
  override def eval(buf: KmvBuf): Any = buf.toBytes
  override def serialize(buf: KmvBuf): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KmvBuf =
    Kmv.fromBytes(bytes, k)
  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `kmv_merge(sk, k)`: union stored sketches; reports
  * struct<n_distinct: bigint, sketch: binary> so a rollup can re-store
  * its own output at a coarser grain (the q15/a12 pattern).
  */
case class KmvMergeAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuf] {
  require(k >= 16 && k <= (1 << 20), s"k must be in [16, 2^20], got $k")
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_merge requires BINARY sketches, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_merge"
  override def dataType: DataType = StructType(Seq(
    StructField("n_distinct", LongType, nullable = false),
    StructField("sketch", BinaryType, nullable = false)))
  override def createAggregationBuffer(): KmvBuf = new KmvBuf(k)
  override def update(buf: KmvBuf, input: InternalRow): KmvBuf = {
    val v = child.eval(input)
    if (v != null) buf.mergeIn(Kmv.fromBytes(v.asInstanceOf[Array[Byte]], k))
    buf
  }
  override def merge(buf: KmvBuf, other: KmvBuf): KmvBuf = {
    buf.mergeIn(other); buf
  }
  override def eval(buf: KmvBuf): Any =
    InternalRow(buf.estimate, buf.toBytes)
  override def serialize(buf: KmvBuf): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KmvBuf =
    Kmv.fromBytes(bytes, k)
  override def withNewMutableAggBufferOffset(o: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `kmv_est(sk)`: distinct estimate of one stored sketch (exact while
  * the sketch holds fewer than k hashes). Codegen emits a static call.
  */
case class KmvEstimate(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_est"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_est requires a BINARY sketch, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(v: Any): Any =
    Kmv.estimateOf(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kmv.estimateOf($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `kmv_intersect(a, b)`: overlap-cardinality estimate between two
  * stored sketches. Codegen emits a static call — the set walk runs
  * compiled, no interpreted fallback.
  */
case class KmvIntersectEst(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_intersect"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_intersect requires two BINARY sketches, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kmv.intersectEst(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Kmv.intersectEst($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
