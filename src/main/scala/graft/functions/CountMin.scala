package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Count-Min sketch + tracked candidate set: `depth` hash rows ×
  * `width` counters (a LINEAR sketch — distributed merge is elementwise
  * addition, no information loss), plus up to `capacity` candidate items
  * whose estimates feed the top-k. The two structures split the roles
  * Space-Saving fuses: the sketch never forgets mass (an evicted
  * candidate that reappears re-reads its full estimate), while the
  * candidate set bounds what eval must rank.
  *
  * Row hashes are salted splitmix64 finalizers; `width` is forced to a
  * power of two so the cell index is a mask, and the whole structure is
  * deterministic — same data, same sketch, any partitioning.
  */
final class CmBuf(val depth: Int, val width: Int) {
  require(Integer.bitCount(width) == 1, s"width $width must be a power of 2")
  val counts = new Array[Long](depth * width)
  var total = 0L
  /** tracked candidates (item → present); estimates always re-read */
  val cand = new mutable.LongMap[Unit]()

  private def cell(row: Int, item: Long): Int = {
    // splitmix64 finalizer over item ⊕ row-salt
    var z = item ^ (0x9e3779b97f4a7c15L * (row + 1))
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= z >>> 31
    row * width + (z & (width - 1)).toInt
  }

  def add(item: Long, inc: Long): Unit = {
    var r = 0
    while (r < depth) { counts(cell(r, item)) += inc; r += 1 }
    total += inc
  }

  /** CM point estimate: min over rows — a true UPPER bound on the item's
    * frequency (each cell counts the item plus its colliders, never
    * less).
    */
  def estimate(item: Long): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = counts(cell(r, item))
      if (c < best) best = c
      r += 1
    }
    best
  }

  /** Keep the candidate set bounded: amortized prune to the `capacity`
    * largest estimates (estimate DESC, item ASC) once it doubles.
    */
  def pruneCandidates(capacity: Int): Unit =
    if (cand.size > capacity) {
      val kept = cand.keys.toArray
        .map(it => (it, estimate(it)))
        .sortBy { case (it, est) => (-est, it) }
        .take(capacity)
      cand.clear()
      kept.foreach { case (it, _) => cand.update(it, ()) }
    }
}

object CmBuf {
  /** Wire/storage form — shared by the shuffle serde AND the persisted
    * sketch-table column ([[CountMinSketchAgg]]). */
  def toBytes(buf: CmBuf): Array[Byte] = {
    val n = buf.cand.size
    val bb = ByteBuffer.allocate(8 + 8 * buf.counts.length + 4 + 8 * n)
    bb.putLong(buf.total)
    buf.counts.foreach(bb.putLong)
    bb.putInt(n)
    buf.cand.foreachKey(bb.putLong(_))
    bb.array()
  }

  def fromBytes(bytes: Array[Byte], depth: Int, width: Int): CmBuf = {
    // A sketch serialized with different depth/width would silently
    // misparse into garbage counts — reject structurally up front.
    val headerLen = 8 + 8 * depth * width + 4
    require(bytes.length >= headerLen,
      s"count-min sketch is ${bytes.length} bytes; a d=$depth w=$width " +
        s"sketch needs at least $headerLen — depth/width mismatch")
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CmBuf(depth, width)
    buf.total = bb.getLong
    var i = 0
    while (i < buf.counts.length) { buf.counts(i) = bb.getLong; i += 1 }
    var n = bb.getInt
    require(n >= 0 && bytes.length == headerLen + 8L * n,
      s"count-min sketch is ${bytes.length} bytes; a d=$depth w=$width " +
        s"sketch with $n candidates needs ${headerLen + 8L * n} — " +
        "depth/width mismatch")
    while (n > 0) { buf.cand.update(bb.getLong, ()); n -= 1 }
    buf
  }
}

/** Count-Min heavy hitters (Cormode & Muthukrishnan, "An improved data
  * stream summary: the count-min sketch and its applications", J.
  * Algorithms 2005) as a native `TypedImperativeAggregate` — the
  * SKETCH-TWIN of [[SpaceSavingTopK]] with the opposite bias: CM
  * estimates only OVER-count (est ≥ true always; est ≤ true + e·N/width
  * per row with probability ≥ 1 − e^(−depth) — the (ε, δ) contract with
  * ε = e/width, δ = e^(−depth)), where Space-Saving's cnt − err
  * under-bounds. Because the sketch is linear, merge = elementwise sum
  * and the bound telescopes over ANY merge tree with N = the merged
  * total — nothing like Space-Saving's absent-item augmentation is
  * needed.
  *
  * Memory is O(depth·width + capacity) per buffer regardless of distinct
  * keys; the raw keys never shuffle — only sketches do.
  *
  * Exact regime (the oracle-gated one): when every distinct input item
  * is tracked (distinct ≤ capacity) and no item collides with another in
  * all `depth` rows, every estimate is exact and the top-k equals the
  * plain GROUP BY answer. With 256 distinct keys in 4 × 4096 cells the
  * all-rows-collide probability per item is ~(1/16)^4 ≈ 1.5e-5 — and
  * the salted hashes make it a deterministic property of the fixture,
  * not a per-run coin flip.
  *
  * Output: the `k` largest as array<struct<item, cnt, err>> ordered by
  * (cnt DESC, item ASC); `cnt` is the CM estimate (upper bound), `err`
  * the e·N/width envelope — true count ∈ [cnt − err, cnt] with
  * probability ≥ 1 − e^(−depth), and ≥ cnt − err always holds in the
  * sense that cnt never under-counts.
  */
case class CountMinTopK(child: Expression, depth: Int, width: Int,
    capacity: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmBuf] {

  require(depth > 0 && width > 0 && Integer.bitCount(width) == 1,
    s"need depth > 0 and width a power of 2, got d=$depth w=$width")
  require(capacity > 0 && k > 0 && k <= capacity,
    s"need 0 < k <= capacity, got k=$k capacity=$capacity")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_min_topk requires a BIGINT input, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def prettyName: String = "count_min_topk"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): CmBuf = new CmBuf(depth, width)

  override def update(buf: CmBuf, input: InternalRow): CmBuf = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[Long]
      buf.add(item, 1L)
      buf.cand.update(item, ())
      if (buf.cand.size > 2 * capacity) buf.pruneCandidates(capacity)
    }
    buf
  }

  override def merge(buf: CmBuf, other: CmBuf): CmBuf = {
    // linear sketch: merged estimates == single-stream estimates exactly
    var i = 0
    while (i < buf.counts.length) {
      buf.counts(i) += other.counts(i); i += 1
    }
    buf.total += other.total
    other.cand.foreachKey(it => buf.cand.update(it, ()))
    if (buf.cand.size > 2 * capacity) buf.pruneCandidates(capacity)
    buf
  }

  override def eval(buf: CmBuf): Any = {
    // ceil(e·N/width): the ε·N envelope, integerized upward so it stays
    // a sound bound after rounding
    val errBound =
      math.ceil(math.E * buf.total.toDouble / width.toDouble).toLong
    val top = buf.cand.keys.toArray
      .map(it => (it, buf.estimate(it)))
      .sortBy { case (it, est) => (-est, it) }
      .take(k)
      .map { case (it, est) => InternalRow(it, est, errBound) }
    new GenericArrayData(top.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: CmBuf): Array[Byte] = CmBuf.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): CmBuf =
    CmBuf.fromBytes(bytes, depth, width)

  override def withNewMutableAggBufferOffset(o: Int): CountMinTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `cm_sketch(v, depth, width, capacity)`: aggregate a BIGINT column
  * into a SERIALIZED Count-Min sketch + candidate set (BINARY) — the
  * heavy-hitter half of the mergeable-summary pattern. Because CM is
  * LINEAR, stored partials merge with ZERO information loss under any
  * merge tree (cell-wise sums): heavy hitters over any slice of a
  * summary table are exactly what a direct sketch over that slice's
  * rows would report — a stronger guarantee than the KLL rollup's
  * zero-compaction condition.
  */
case class CountMinSketchAgg(child: Expression, depth: Int, width: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmBuf] {
  require(depth > 0 && width > 0 && Integer.bitCount(width) == 1,
    s"need depth > 0 and width a power of 2, got d=$depth w=$width")
  require(capacity > 0, s"need capacity > 0, got $capacity")
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cm_sketch requires a BIGINT input, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def prettyName: String = "cm_sketch"
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): CmBuf = new CmBuf(depth, width)
  override def update(buf: CmBuf, input: InternalRow): CmBuf = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[Long]
      buf.add(item, 1L)
      buf.cand.update(item, ())
      if (buf.cand.size > 2 * capacity) buf.pruneCandidates(capacity)
    }
    buf
  }
  override def merge(buf: CmBuf, other: CmBuf): CmBuf = {
    var i = 0
    while (i < buf.counts.length) { buf.counts(i) += other.counts(i); i += 1 }
    buf.total += other.total
    other.cand.foreachKey(it => buf.cand.update(it, ()))
    if (buf.cand.size > 2 * capacity) buf.pruneCandidates(capacity)
    buf
  }
  override def eval(buf: CmBuf): Any = CmBuf.toBytes(buf)
  override def serialize(buf: CmBuf): Array[Byte] = CmBuf.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): CmBuf =
    CmBuf.fromBytes(bytes, depth, width)
  override def withNewMutableAggBufferOffset(o: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `cm_merge(sketch, depth, width, capacity, k)`: merge SERIALIZED
  * Count-Min sketches (BINARY, from [[CountMinSketchAgg]]) and report
  * the top-`k` — the query half of the heavy-hitter summary table.
  * Output shape and bias identical to [[CountMinTopK]]; linearity makes
  * merged-partials == direct-over-the-slice exact (cell arrays sum),
  * with the candidate union subject to the same capacity prune.
  */
case class CountMinMergeTopK(child: Expression, depth: Int, width: Int,
    capacity: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmBuf] {
  require(depth > 0 && width > 0 && Integer.bitCount(width) == 1,
    s"need depth > 0 and width a power of 2, got d=$depth w=$width")
  require(capacity > 0 && k > 0 && k <= capacity,
    s"need 0 < k <= capacity, got k=$k capacity=$capacity")
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cm_merge requires a BINARY sketch input, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def prettyName: String = "cm_merge"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def createAggregationBuffer(): CmBuf = new CmBuf(depth, width)
  override def update(buf: CmBuf, input: InternalRow): CmBuf = {
    val v = child.eval(input)
    if (v != null) merge(buf,
      CmBuf.fromBytes(v.asInstanceOf[Array[Byte]], depth, width))
    else buf
  }
  override def merge(buf: CmBuf, other: CmBuf): CmBuf = {
    var i = 0
    while (i < buf.counts.length) { buf.counts(i) += other.counts(i); i += 1 }
    buf.total += other.total
    other.cand.foreachKey(it => buf.cand.update(it, ()))
    if (buf.cand.size > 2 * capacity) buf.pruneCandidates(capacity)
    buf
  }
  override def eval(buf: CmBuf): Any = {
    val errBound =
      math.ceil(math.E * buf.total.toDouble / width.toDouble).toLong
    val top = buf.cand.keys.toArray
      .map(it => (it, buf.estimate(it)))
      .sortBy { case (it, est) => (-est, it) }
      .take(k)
      .map { case (it, est) => InternalRow(it, est, errBound) }
    new GenericArrayData(top.asInstanceOf[Array[Any]])
  }
  override def serialize(buf: CmBuf): Array[Byte] = CmBuf.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): CmBuf =
    CmBuf.fromBytes(bytes, depth, width)
  override def withNewMutableAggBufferOffset(o: Int): CountMinMergeTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinMergeTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `cm_inner(sketchA, sketchB)`: the Cormode–Muthukrishnan inner-
  * product estimate — equi-join SIZE between two keyed datasets from
  * their stored CM sketches alone: per hash row, Σ_cell aCell·bCell;
  * the reported value is the MIN over rows, a true UPPER bound on
  * Σ_key fa(key)·fb(key) (a shared key lands in the same cell of both
  * sketches — the salted hash depends only on the key — so its product
  * survives every row; colliders only ADD). Exact whenever some row
  * maps the active keys of both sides to distinct cells. The classic
  * use: size a join before running it, from two sketch-table lookups,
  * no data scanned.
  */
case class CmInnerProduct(left: Expression, right: Expression,
    depth: Int, width: Int) extends BinaryExpression {
  require(depth >= 1 && Integer.bitCount(width) == 1,
    s"need depth >= 1 and power-of-2 width, got d=$depth w=$width")
  override def dataType: DataType = LongType
  override def prettyName: String = "cm_inner"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cm_inner requires two BINARY sketches, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CmInnerProduct.compute(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]], depth, width)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CmInnerProduct.compute($a, $b, $depth, $width)")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

object CmInnerProduct {
  def compute(a: Array[Byte], b: Array[Byte], depth: Int,
      width: Int): Long = {
    val ba = CmBuf.fromBytes(a, depth, width)
    val bb = CmBuf.fromBytes(b, depth, width)
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      // SATURATING accumulation: at corpus scale a row sum can exceed
      // Long range (width × (rows/width)² products); wrapping would
      // return a tiny/negative "upper bound" — clamping to MaxValue
      // keeps the estimate an honest upper bound instead
      var s = 0L
      var j = r * width
      val end = j + width
      while (j < end && s != Long.MaxValue) {
        val x = ba.counts(j)
        val y = bb.counts(j)
        if (x != 0L && y != 0L) {
          val p =
            if (x > Long.MaxValue / y) Long.MaxValue else x * y
          s = if (s > Long.MaxValue - p) Long.MaxValue else s + p
        }
        j += 1
      }
      if (s < best) best = s
      r += 1
    }
    best
  }
}

object CountMin {

  /** Join-size estimate between two stored sketches (see
    * [[CmInnerProduct]]). */
  def cmInner(a: Column, b: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(CmInnerProduct(ColumnBridge.expression(a),
      ColumnBridge.expression(b), depth, width))
  /** Top-`k` heavy hitters of a BIGINT column via a (depth × width)
    * Count-Min sketch with `capacity` tracked candidates.
    */
  def countMinTopK(v: Column, depth: Int, width: Int, capacity: Int,
      k: Int): Column =
    ColumnBridge.column(
      CountMinTopK(ColumnBridge.expression(v), depth, width, capacity, k)
        .toAggregateExpression())

  /** Serialized (depth × width) CM sketch + candidates (BINARY) — the
    * stored half of a heavy-hitter summary table. */
  def cmSketch(v: Column, depth: Int, width: Int, capacity: Int): Column =
    ColumnBridge.column(
      CountMinSketchAgg(ColumnBridge.expression(v), depth, width, capacity)
        .toAggregateExpression())

  /** Merge stored CM sketches and report the top-`k` (item, cnt, err). */
  def cmMerge(sketch: Column, depth: Int, width: Int, capacity: Int,
      k: Int): Column =
    ColumnBridge.column(
      CountMinMergeTopK(ColumnBridge.expression(sketch), depth, width,
        capacity, k).toAggregateExpression())
}
