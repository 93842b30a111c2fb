package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Space-Saving counters: item → (count, err). `count` is an UPPER bound
  * on the item's true frequency; `count - err` a lower bound.
  */
final class SpaceSavingBuf(val counters: mutable.LongMap[(Long, Long)])

/** Space-Saving heavy hitters (Metwally et al., "Efficient computation of
  * frequent and top-k elements in data streams", ICDT 2005) as a native
  * `TypedImperativeAggregate` — the sketch answer to "top sources /
  * users / tokens by frequency" when the key cardinality is too large to
  * `groupBy(key)`: memory is O(capacity) per aggregation buffer
  * REGARDLESS of distinct keys, one pass, no shuffle of the raw keys.
  *
  * Semantics:
  *  - distinct(input) ≤ capacity (per partial buffer): EXACT counts,
  *    err = 0 — the oracle-gated regime.
  *  - otherwise: within ONE buffer the classic Space-Saving bounds hold
  *    (count upper-bounds truth, err bounds the inflation). Merge sums
  *    matching counters and prunes to the `capacity` largest, so across
  *    distributed merges the strict upper bound does not survive — an
  *    item evicted in one partial buffer loses that buffer's mass — but
  *    the mergeable-summaries envelope does: every estimate is within
  *    n/capacity of the true frequency, and items with frequency
  *    > 2n/capacity are guaranteed present (ICDT'12).
  *
  * Output: the `k` largest as array<struct<item,cnt,err>>, ordered by
  * (cnt DESC, item ASC) — a deterministic total order, so the exact
  * regime is reproducible in a SQL oracle.
  */
case class SpaceSavingTopK(child: Expression, capacity: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingBuf] {

  require(capacity > 0 && k > 0 && k <= capacity,
    s"need 0 < k <= capacity, got k=$k capacity=$capacity")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"space_saving_topk requires a BIGINT input, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def prettyName: String = "space_saving_topk"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): SpaceSavingBuf =
    new SpaceSavingBuf(new mutable.LongMap[(Long, Long)](
      math.min(capacity, 64)))

  override def update(buf: SpaceSavingBuf, input: InternalRow): SpaceSavingBuf = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[Long]
      val c = buf.counters
      c.get(item) match {
        case Some((cnt, err)) => c.update(item, (cnt + 1L, err))
        case None =>
          if (c.size < capacity) c.update(item, (1L, 0L))
          else {
            // evict the minimum-count counter (ties: smallest item, so the
            // whole aggregate stays deterministic) and inherit its count
            // as the newcomer's error bound. The min scan is O(capacity)
            // per eviction — fine for the few-hundred-counter capacities
            // this is used at; a count-bucket stream-summary would make
            // it O(1) if capacities grow to tens of thousands
            var minItem = Long.MinValue
            var minCnt = Long.MaxValue
            c.foreachEntry { (it, ce) =>
              if (ce._1 < minCnt || (ce._1 == minCnt && it < minItem)) {
                minItem = it; minCnt = ce._1
              }
            }
            c.remove(minItem)
            c.update(item, (minCnt + 1L, minCnt))
          }
      }
    }
    buf
  }

  override def merge(buf: SpaceSavingBuf, other: SpaceSavingBuf): SpaceSavingBuf = {
    val c = buf.counters
    other.counters.foreachEntry { (it, ce) =>
      c.get(it) match {
        case Some((cnt, err)) => c.update(it, (cnt + ce._1, err + ce._2))
        case None => c.update(it, ce)
      }
    }
    if (c.size > capacity) {
      // prune to the `capacity` largest (cnt DESC, item ASC)
      val kept = c.toArray.sortBy { case (it, (cnt, _)) => (-cnt, it) }
        .take(capacity)
      c.clear()
      kept.foreach { case (it, ce) => c.update(it, ce) }
    }
    buf
  }

  override def eval(buf: SpaceSavingBuf): Any = {
    val top = buf.counters.toArray
      .sortBy { case (it, (cnt, _)) => (-cnt, it) }
      .take(k)
      .map { case (it, (cnt, err)) => InternalRow(it, cnt, err) }
    new GenericArrayData(top.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: SpaceSavingBuf): Array[Byte] = {
    val n = buf.counters.size
    val bb = ByteBuffer.allocate(4 + 24 * n)
    bb.putInt(n)
    buf.counters.foreachEntry { (it, ce) =>
      bb.putLong(it).putLong(ce._1).putLong(ce._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val c = new mutable.LongMap[(Long, Long)](math.max(n, 1))
    var i = 0
    while (i < n) {
      val it = bb.getLong; val cnt = bb.getLong; val err = bb.getLong
      c.update(it, (cnt, err))
      i += 1
    }
    new SpaceSavingBuf(c)
  }

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SpaceSaving {
  /** Top-`k` heavy hitters of a BIGINT column with O(capacity) memory. */
  def spaceSavingTopK(v: Column, capacity: Int, k: Int): Column =
    ColumnBridge.column(
      SpaceSavingTopK(ColumnBridge.expression(v), capacity, k)
        .toAggregateExpression())
}
