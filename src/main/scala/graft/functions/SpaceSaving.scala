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

/** One count-bucket of the stream-summary: every item currently holding
  * `cnt` estimated occurrences, in a sorted set so min-extraction stays
  * deterministic (smallest item evicts first — same tie rule as a full
  * min scan). Buckets form a doubly-linked list in ascending `cnt`.
  */
private[functions] final class SsBucket(var cnt: Long) {
  val items = new java.util.TreeSet[java.lang.Long]()
  var prev: SsBucket = _
  var next: SsBucket = _
}

/** Space-Saving counters as a Metwally "stream-summary": item → node in a
  * count-bucket linked list, so increment, insert and min-eviction are
  * all O(log bucketSize) (the TreeSet that keeps eviction ties
  * deterministic), never an O(capacity) scan. `cnt` is an upper bound on
  * the item's true frequency within the merged streams; `cnt - err` a
  * lower bound (see merge augmentation in [[SpaceSavingTopK]]).
  *
  * `evicted` records whether this buffer ever dropped an item (update
  * eviction or merge pruning). A buffer that never evicted holds EXACT
  * counts and implies absent items truly have count 0 in its stream —
  * the property the merge augmentation keys on.
  */
final class SpaceSavingBuf(capacityHint: Int) {
  val err = new mutable.LongMap[Long](math.min(capacityHint, 64))
  private val nodes = new mutable.LongMap[SsBucket](math.min(capacityHint, 64))
  private var head: SsBucket = _ // min count
  var evicted: Boolean = false

  def size: Int = nodes.size
  def minCount: Long = if (head == null) 0L else head.cnt
  def contains(item: Long): Boolean = nodes.contains(item)
  def countOf(item: Long): Long = nodes(item).cnt

  def foreachCounter(f: (Long, Long, Long) => Unit): Unit = {
    var b = head
    while (b != null) {
      val it = b.items.iterator()
      while (it.hasNext) { val i = it.next().longValue(); f(i, b.cnt, err(i)) }
      b = b.next
    }
  }

  private def unlinkIfEmpty(b: SsBucket): Unit = if (b.items.isEmpty) {
    if (b.prev != null) b.prev.next = b.next else head = b.next
    if (b.next != null) b.next.prev = b.prev
  }

  /** Place `item` into the bucket with count `cnt`, creating it after
    * `after` (or at the head when `after` is null) if absent. Callers
    * guarantee the list position is correct — both call sites move an
    * item to `bucket.cnt + 1`, so the target is the immediate neighbor.
    */
  private def placeAfter(after: SsBucket, item: Long, cnt: Long): Unit = {
    val nxt = if (after == null) head else after.next
    val target =
      if (nxt != null && nxt.cnt == cnt) nxt
      else {
        val b = new SsBucket(cnt)
        b.prev = after; b.next = nxt
        if (after == null) head = b else after.next = b
        if (nxt != null) nxt.prev = b
        b
      }
    target.items.add(item)
    nodes.update(item, target)
  }

  /** Add a NEW item with the given count/err; list position found by
    * walking from the head — only used below capacity, where the new
    * count is 1 and the walk stops at the first bucket, i.e. O(1).
    */
  private def insertAscending(item: Long, cnt: Long, e: Long): Unit = {
    var after: SsBucket = null
    var cur = head
    while (cur != null && cur.cnt < cnt) { after = cur; cur = cur.next }
    placeAfter(after, item, cnt)
    err.update(item, e)
  }

  /** One occurrence of `item` with eviction at `capacity` — O(log
    * bucketSize), no capacity scan.
    */
  def add(item: Long, capacity: Int): Unit = nodes.get(item) match {
    case Some(b) =>
      b.items.remove(item)
      placeAfter(b, item, b.cnt + 1L)
      unlinkIfEmpty(b)
    case None =>
      if (nodes.size < capacity) insertAscending(item, 1L, 0L)
      else {
        // evict the minimum-count counter (ties: smallest item — the same
        // deterministic rule as the previous full-scan form) and inherit
        // its count as the newcomer's error bound
        val b = head
        val victim = b.items.first().longValue()
        b.items.remove(victim)
        nodes.remove(victim)
        err.remove(victim)
        evicted = true
        placeAfter(b, item, b.cnt + 1L)
        err.update(item, b.cnt)
        unlinkIfEmpty(b)
      }
  }

  /** Reset to exactly `entries` (item, cnt, err), which need NOT be
    * sorted. O(n log n) — merge/deserialize-time only, never per-row.
    */
  def rebuild(entries: Array[(Long, (Long, Long))]): Unit = {
    nodes.clear(); err.clear(); head = null
    val sorted = entries.sortBy { case (it, (cnt, _)) => (cnt, it) }
    var tail: SsBucket = null
    sorted.foreach { case (it, (cnt, e)) =>
      if (tail == null || tail.cnt != cnt) {
        val b = new SsBucket(cnt)
        b.prev = tail
        if (tail == null) head = b else tail.next = b
        tail = b
      }
      tail.items.add(it)
      nodes.update(it, tail)
      err.update(it, e)
    }
  }

  def toEntries: Array[(Long, (Long, Long))] = {
    val out = Array.newBuilder[(Long, (Long, Long))]
    out.sizeHint(nodes.size)
    foreachCounter((it, cnt, e) => out += ((it, (cnt, e))))
    out.result()
  }
}

/** Space-Saving heavy hitters (Metwally et al., "Efficient computation of
  * frequent and top-k elements in data streams", ICDT 2005) as a native
  * `TypedImperativeAggregate` — the sketch answer to "top sources /
  * users / tokens by frequency" when the key cardinality is too large to
  * `groupBy(key)`: memory is O(capacity) per aggregation buffer
  * REGARDLESS of distinct keys, one pass, no shuffle of the raw keys.
  * The buffer is Metwally's stream-summary (count-bucket linked list), so
  * the per-row cost past saturation is O(log bucketSize), not an
  * O(capacity) min scan.
  *
  * Semantics:
  *  - distinct(input) ≤ capacity (per partial buffer): EXACT counts,
  *    err = 0 — the oracle-gated regime. (No buffer ever evicts, so the
  *    merge augmentation below is a no-op and exactness survives merge.)
  *  - otherwise: the classic Space-Saving bounds hold PER MERGED RESULT,
  *    not just per partial buffer: merge sums matching counters and, for
  *    an item present in only one side, adds the other side's minimum
  *    counter to BOTH cnt and err when that other side has evicted (its
  *    unseen mass for the item is at most its min counter; a side that
  *    never evicted contributes exactly 0). Pruning back to `capacity`
  *    keeps the largest counters, whose min becomes the new absent-item
  *    bound. So `cnt` stays a true upper bound and `cnt - err` a true
  *    lower bound across arbitrary distributed merges, and the
  *    mergeable-summaries envelope (estimate within n/capacity of truth,
  *    items with frequency > 2n/capacity guaranteed present — ICDT'12)
  *    holds as before, with slightly looser point estimates.
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
    new SpaceSavingBuf(capacity)

  override def update(buf: SpaceSavingBuf, input: InternalRow): SpaceSavingBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long], capacity)
    buf
  }

  override def merge(buf: SpaceSavingBuf, other: SpaceSavingBuf): SpaceSavingBuf = {
    // absent-item mass bounds, taken BEFORE any mutation: a side that
    // has evicted may have seen an absent item up to its min counter
    // times; a side that never evicted has seen it exactly 0 times
    val bufAbsent = if (buf.evicted) buf.minCount else 0L
    val otherAbsent = if (other.evicted) other.minCount else 0L
    val merged = new mutable.LongMap[(Long, Long)](buf.size + other.size)
    buf.foreachCounter { (it, cnt, e) =>
      if (other.contains(it)) merged.update(it, (cnt, e))
      else merged.update(it, (cnt + otherAbsent, e + otherAbsent))
    }
    other.foreachCounter { (it, cnt, e) =>
      merged.get(it) match {
        case Some((c0, e0)) => merged.update(it, (c0 + cnt, e0 + e))
        case None => merged.update(it, (cnt + bufAbsent, e + bufAbsent))
      }
    }
    var entries = merged.toArray
    val pruned = entries.length > capacity
    if (pruned) {
      // keep the `capacity` largest (cnt DESC, item ASC); the surviving
      // minimum then bounds every pruned item's count, so the buffer's
      // absent-item invariant is preserved
      entries = entries.sortBy { case (it, (cnt, _)) => (-cnt, it) }
        .take(capacity)
    }
    buf.rebuild(entries)
    buf.evicted = buf.evicted || other.evicted || pruned
    buf
  }

  override def eval(buf: SpaceSavingBuf): Any = {
    val top = buf.toEntries
      .sortBy { case (it, (cnt, _)) => (-cnt, it) }
      .take(k)
      .map { case (it, (cnt, err)) => InternalRow(it, cnt, err) }
    new GenericArrayData(top.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: SpaceSavingBuf): Array[Byte] = {
    val n = buf.size
    val bb = ByteBuffer.allocate(5 + 24 * n)
    bb.putInt(n)
    bb.put(if (buf.evicted) 1.toByte else 0.toByte)
    buf.foreachCounter((it, cnt, e) => bb.putLong(it).putLong(cnt).putLong(e))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val ev = bb.get() == 1.toByte
    val entries = new Array[(Long, (Long, Long))](n)
    var i = 0
    while (i < n) {
      entries(i) = (bb.getLong, (bb.getLong, bb.getLong))
      i += 1
    }
    val buf = new SpaceSavingBuf(math.max(n, 1))
    buf.rebuild(entries)
    buf.evicted = ev
    buf
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
