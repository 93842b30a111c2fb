package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Aggregation buffer: exact element count plus at most `cap` collected
  * elements (collection stops at the cap, the count never does).
  */
final class BoundedBuf(var n: Long, val elems: ArrayBuffer[Long])

/** Size-capped collect with an exact count — the skew-safe primitive for
  * frequency-capped dedup: `groupBy(key).agg(bounded_collect(v, cap))`
  * returns struct(df = exact group size, ds = the `cap` SMALLEST
  * collected values, sorted ascending). Memory per group is bounded by
  * `cap` at ANY corpus size (a mega-hot key costs cap longs, not its
  * full membership list), unlike collect_list, so doc-frequency capping
  * and bucket building fuse into ONE shuffle. Min-k (not first-k)
  * retention makes `ds` DETERMINISTIC at any df — independent of
  * partitioning and arrival order — so over-cap groups expose a
  * reproducible bounded sample (ds(0) is the group's exact minimum, the
  * canonical representative the sampled dedup variants pivot on), while
  * df ≤ cap groups still come out complete.
  */
case class BoundedCollectLong(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedBuf] {

  override def children: Seq[Expression] = Seq(child)
  // reject non-long inputs at analysis time — update() casts to Long and
  // would otherwise throw ClassCastException deep inside the aggregate
  // (AbstractDataType/ExpectsInputTypes are private[sql], so check here)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_collect requires a BIGINT input, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_collect"
  override def dataType: DataType = StructType(Seq(
    StructField("df", LongType, nullable = false),
    StructField("ds", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): BoundedBuf =
    new BoundedBuf(0L, new ArrayBuffer[Long](math.min(cap, 16)))

  /** Keep `v` iff it is among the `cap` smallest seen: below the cap just
    * append; at the cap replace the current maximum when `v` undercuts it.
    * Linear max-scan per displacing insert — caps here are O(10¹), and
    * for shuffled input the displacement probability decays as cap/seen,
    * so the amortized cost per element is ~O(1).
    */
  private def keepMinK(elems: ArrayBuffer[Long], v: Long): Unit =
    if (elems.length < cap) elems += v
    else {
      var mi = 0
      var i = 1
      while (i < elems.length) { if (elems(i) > elems(mi)) mi = i; i += 1 }
      if (v < elems(mi)) elems(mi) = v
    }

  override def update(buf: BoundedBuf, input: InternalRow): BoundedBuf = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1L
      keepMinK(buf.elems, v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: BoundedBuf, other: BoundedBuf): BoundedBuf = {
    buf.n += other.n
    var i = 0
    while (i < other.elems.length) {
      keepMinK(buf.elems, other.elems(i)); i += 1
    }
    buf
  }

  override def eval(buf: BoundedBuf): Any =
    InternalRow(buf.n,
      new GenericArrayData(buf.elems.toArray.sorted[Long]))

  override def serialize(buf: BoundedBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 + 8 * buf.elems.length)
    bb.putLong(buf.n).putInt(buf.elems.length)
    buf.elems.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val len = bb.getInt
    val elems = new ArrayBuffer[Long](len)
    var i = 0
    while (i < len) { elems += bb.getLong; i += 1 }
    new BoundedBuf(n, elems)
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedCollectLong =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedCollectLong =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BoundedCollect {
  /** struct(df, ds): exact group count + up to `cap` sorted values. */
  def boundedCollect(v: Column, cap: Int): Column =
    ColumnBridge.column(
      BoundedCollectLong(ColumnBridge.expression(v), cap)
        .toAggregateExpression())
}
