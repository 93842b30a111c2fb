package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Dense HyperLogLog (Flajolet, Fusy, Gandouet & Meunier, "HyperLogLog:
  * the analysis of a near-optimal cardinality estimation algorithm",
  * AofA 2007) with 2^p single-byte registers — the distinct-count member
  * of the STORABLE summary-table family next to KLL (quantiles), CM
  * (heavy hitters) and Bloom (membership). Spark's built-in
  * `approx_count_distinct` answers one query; these registers are a
  * VALUE you can keep: store one 2^p-byte array per (group, day) row
  * and count distinct over ANY slice later by register-max merging the
  * covered rows. Register max is associative, commutative and
  * idempotent, so the merged registers are BIT-IDENTICAL to a direct
  * build over the union under every partitioning and merge tree — the
  * property the spec pins — and re-merging overlapping slices cannot
  * double-count.
  *
  * Estimator: the standard alpha_m·m²/Σ2^(−reg) with linear-counting
  * small-range correction (E ≤ 2.5m with empty registers). 64-bit
  * splitmix hashes make the large-range correction moot. Standard error
  * ≈ 1.04/√m (~1.6% at p = 12 for 4 KiB per register set).
  */
final class HllBuf(val p: Int) {
  require(p >= 4 && p <= 18, s"precision p must be in [4, 18], got $p")
  val m: Int = 1 << p
  val regs = new Array[Byte](m)

  def add(item: Long): Unit = {
    val h = Bloom.mix(item, 0x8e44c5d9f13fd2a7L)
    val idx = (h >>> (64 - p)).toInt
    val rest = h << p
    // rank of the leftmost 1-bit in the remaining 64−p bits (1-based);
    // all-zero rest → maximum rank 64−p+1
    val rho = if (rest == 0L) 64 - p + 1
      else java.lang.Long.numberOfLeadingZeros(rest) + 1
    if (rho > regs(idx)) regs(idx) = rho.toByte
  }

  def mergeIn(o: HllBuf): Unit = {
    var i = 0
    while (i < m) { if (o.regs(i) > regs(i)) regs(i) = o.regs(i); i += 1 }
  }

  def estimate: Long = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * m.toDouble * m.toDouble / sum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else e
    math.round(corrected)
  }
}

/** `hll_sketch(v, p)`: aggregate a BIGINT column into the 2^p-byte HLL
  * register array (BINARY) — the stored half.
  */
case class HllSketchAgg(child: Expression, p: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllBuf] {
  require(p >= 4 && p <= 18, s"precision p must be in [4, 18], got $p")
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_sketch requires a BIGINT input, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): HllBuf = new HllBuf(p)
  override def update(buf: HllBuf, input: InternalRow): HllBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }
  override def merge(buf: HllBuf, other: HllBuf): HllBuf = {
    buf.mergeIn(other); buf
  }
  override def eval(buf: HllBuf): Any = buf.regs.clone()
  override def serialize(buf: HllBuf): Array[Byte] = buf.regs.clone()
  override def deserialize(bytes: Array[Byte]): HllBuf = {
    val buf = new HllBuf(p)
    require(bytes.length == buf.m,
      s"serialized HLL has ${bytes.length} registers, expected ${buf.m} " +
        "— precision mismatch")
    System.arraycopy(bytes, 0, buf.regs, 0, buf.m)
    buf
  }
  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `hll_merge(regs, p)`: register-max merge stored HLL register arrays
  * and report struct<n_distinct: bigint, regs: binary> — the estimate
  * plus the merged registers (so a rollup can itself be re-stored at a
  * coarser grain: day rows → month rows, lossless).
  */
case class HllMergeCount(child: Expression, p: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllBuf] {
  require(p >= 4 && p <= 18, s"precision p must be in [4, 18], got $p")
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_merge requires BINARY registers, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def prettyName: String = "hll_merge"
  override def dataType: DataType = StructType(Seq(
    StructField("n_distinct", LongType, nullable = false),
    StructField("regs", BinaryType, nullable = false)))
  override def createAggregationBuffer(): HllBuf = new HllBuf(p)
  override def update(buf: HllBuf, input: InternalRow): HllBuf = {
    val evd = child.eval(input)
    if (evd != null) {
      val bytes = evd.asInstanceOf[Array[Byte]]
      require(bytes.length == buf.m,
        s"stored registers have ${bytes.length} bytes, expected ${buf.m} " +
          "— precision mismatch")
      var i = 0
      while (i < buf.m) {
        if (bytes(i) > buf.regs(i)) buf.regs(i) = bytes(i)
        i += 1
      }
    }
    buf
  }
  override def merge(buf: HllBuf, other: HllBuf): HllBuf = {
    buf.mergeIn(other); buf
  }
  override def eval(buf: HllBuf): Any =
    InternalRow(buf.estimate, buf.regs.clone())
  override def serialize(buf: HllBuf): Array[Byte] = buf.regs.clone()
  override def deserialize(bytes: Array[Byte]): HllBuf = {
    val buf = new HllBuf(p)
    require(bytes.length == buf.m,
      s"serialized HLL has ${bytes.length} registers, expected ${buf.m} " +
        "— precision mismatch")
    System.arraycopy(bytes, 0, buf.regs, 0, buf.m)
    buf
  }
  override def withNewMutableAggBufferOffset(o: Int): HllMergeCount =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeCount =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object Hll {
  /** 2^p-byte HLL register array of a BIGINT column (BINARY) — store it;
    * [[hllMerge]] counts distinct over any slice later. */
  def hllSketch(v: Column, p: Int = 12): Column =
    ColumnBridge.column(
      HllSketchAgg(ColumnBridge.expression(v), p).toAggregateExpression())

  /** Merge stored register arrays; struct<n_distinct, regs>. */
  def hllMerge(regs: Column, p: Int = 12): Column =
    ColumnBridge.column(
      HllMergeCount(ColumnBridge.expression(regs), p).toAggregateExpression())
}
