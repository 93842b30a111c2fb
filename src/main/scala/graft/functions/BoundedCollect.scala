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
final class BoundedBuf(var n: Long, val elems: ArrayBuffer[Long],
    var mx: Long = Long.MinValue)

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
      nullable = false),
    // exact group MAXIMUM — with ds(0) (the exact minimum) this gives
    // every over-cap bucket its exact value range for free, which the
    // chain variants use as per-shingle range-bucket bounds instead of
    // paying an eager whole-input min/max job (Long.MinValue only for
    // an empty group, which a groupBy can't produce)
    StructField("mx", LongType, nullable = false)))

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
      val l = v.asInstanceOf[Long]
      if (l > buf.mx) buf.mx = l
      keepMinK(buf.elems, l)
    }
    buf
  }

  override def merge(buf: BoundedBuf, other: BoundedBuf): BoundedBuf = {
    buf.n += other.n
    if (other.mx > buf.mx) buf.mx = other.mx
    var i = 0
    while (i < other.elems.length) {
      keepMinK(buf.elems, other.elems(i)); i += 1
    }
    buf
  }

  override def eval(buf: BoundedBuf): Any =
    InternalRow(buf.n,
      new GenericArrayData(buf.elems.toArray.sorted[Long]), buf.mx)

  override def serialize(buf: BoundedBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 + 4 + 8 * buf.elems.length)
    bb.putLong(buf.n).putLong(buf.mx).putInt(buf.elems.length)
    buf.elems.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val mx = bb.getLong
    val len = bb.getInt
    val elems = new ArrayBuffer[Long](len)
    var i = 0
    while (i < len) { elems += bb.getLong; i += 1 }
    new BoundedBuf(n, elems, mx)
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedCollectLong =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedCollectLong =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Buffer for the keyed variant: parallel min-k arrays of (key, payload). */
final class BoundedKeyedBuf(val keys: ArrayBuffer[Long],
    val pays: ArrayBuffer[Long])

/** [[BoundedCollectLong]] with a separate ORDER KEY: keeps the `cap`
  * (key, payload) pairs with the smallest (key, payload) lexicographic
  * order and returns the payloads sorted in that order. This is the
  * skew-safe per-group deterministic SAMPLER: `groupBy(g).agg(
  * bounded_collect_keyed(spreadKey(id), id, n))` reproduces exactly the
  * first n rows of `row_number() over (partition by g order by
  * spreadKey(id), id)` — the payload array's position IS the rank —
  * without the window's full-corpus sort-shuffle: partial aggregation
  * emits ONE row per group per map task (≤ cap pairs each), so the
  * shuffle is O(groups · tasks) records at any corpus size.
  */
case class BoundedCollectKeyedLong(key: Expression, payload: Expression,
    cap: Int, mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedKeyedBuf] {

  override def children: Seq[Expression] = Seq(key, payload)
  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == LongType && payload.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bounded_collect_keyed requires BIGINT (key, payload), got " +
        s"(${key.dataType.simpleString}, ${payload.dataType.simpleString})")
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_collect_keyed"
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): BoundedKeyedBuf =
    new BoundedKeyedBuf(new ArrayBuffer[Long](math.min(cap, 16)),
      new ArrayBuffer[Long](math.min(cap, 16)))

  @inline private def lt(k1: Long, p1: Long, k2: Long, p2: Long): Boolean =
    k1 < k2 || (k1 == k2 && p1 < p2)

  private def keep(buf: BoundedKeyedBuf, k: Long, p: Long): Unit =
    if (buf.keys.length < cap) { buf.keys += k; buf.pays += p }
    else {
      var mi = 0
      var i = 1
      while (i < buf.keys.length) {
        if (lt(buf.keys(mi), buf.pays(mi), buf.keys(i), buf.pays(i))) mi = i
        i += 1
      }
      if (lt(k, p, buf.keys(mi), buf.pays(mi))) {
        buf.keys(mi) = k; buf.pays(mi) = p
      }
    }

  override def update(buf: BoundedKeyedBuf, input: InternalRow)
      : BoundedKeyedBuf = {
    val k = key.eval(input)
    val p = payload.eval(input)
    if (k != null && p != null)
      keep(buf, k.asInstanceOf[Long], p.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedKeyedBuf, other: BoundedKeyedBuf)
      : BoundedKeyedBuf = {
    var i = 0
    while (i < other.keys.length) {
      keep(buf, other.keys(i), other.pays(i)); i += 1
    }
    buf
  }

  override def eval(buf: BoundedKeyedBuf): Any = {
    val order = buf.keys.indices.sortBy(i => (buf.keys(i), buf.pays(i)))
    new GenericArrayData(order.map(buf.pays(_)).toArray)
  }

  override def serialize(buf: BoundedKeyedBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.keys.length)
    bb.putInt(buf.keys.length)
    var i = 0
    while (i < buf.keys.length) {
      bb.putLong(buf.keys(i)); bb.putLong(buf.pays(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedKeyedBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val len = bb.getInt
    val keys = new ArrayBuffer[Long](len)
    val pays = new ArrayBuffer[Long](len)
    var i = 0
    while (i < len) { keys += bb.getLong; pays += bb.getLong; i += 1 }
    new BoundedKeyedBuf(keys, pays)
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedCollectKeyedLong =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedCollectKeyedLong =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), payload = newChildren(1))
}

object BoundedCollect {
  /** struct(df, ds): exact group count + up to `cap` sorted values. */
  def boundedCollect(v: Column, cap: Int): Column =
    ColumnBridge.column(
      BoundedCollectLong(ColumnBridge.expression(v), cap)
        .toAggregateExpression())

  /** The `cap` payloads with the smallest (key, payload) pairs, sorted in
    * that order — a partially-aggregating replacement for
    * `row_number() over (partition by g order by key, payload) <= cap`.
    */
  def boundedCollectKeyed(key: Column, payload: Column, cap: Int): Column =
    ColumnBridge.column(
      BoundedCollectKeyedLong(ColumnBridge.expression(key),
        ColumnBridge.expression(payload), cap)
        .toAggregateExpression())
}
