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

/** Mergeable quantile sketch: a KLL/MRL compactor hierarchy (Karnin,
  * Lang & Liberty, "Optimal quantile approximation in streams", FOCS
  * 2016; Manku, Rajagopalan & Lindsay, SIGMOD 1998) fronted by an EXACT
  * distinct-counting head.
  *
  * Structure:
  *   - `head`: item → count map, exact while the buffer has seen at most
  *     `k` DISTINCT values. For discrete columns (quantities, prices in
  *     cents, ratings, bucketed scores) this regime is permanent and the
  *     sketch IS the exact weighted histogram — the analog of
  *     [[CountMinTopK]]'s tracked-candidate exact regime, but for
  *     order statistics.
  *   - `levels`: when distinct values exceed `k`, head counts spill into
  *     weight-2^l compactor buffers (each count binary-decomposed, so the
  *     spill itself is LOSSLESS); any buffer past `k` items sorts and
  *     promotes alternate elements to the next level. Each compaction at
  *     level l shifts any rank query by at most 2^l — the classic
  *     per-compaction bound — and the sketch ACCUMULATES that worst case
  *     in `errBound`, so every answer ships with its own certificate:
  *     the returned value's true rank is within ±err of the target rank.
  *
  * Merge concatenates heads/levels then re-compacts; the error
  * certificate telescopes over ANY merge tree (bounds add), and in the
  * zero-compaction regime the result is bit-identical to a single-stream
  * build under any partitioning — the property the oracle gate uses.
  * Memory is O(k · #levels) = O(k log(n/k)) regardless of input size;
  * only sketches shuffle, never rows.
  *
  * Quantile rule matches `quantile_disc`: the answer for probability p
  * is the item whose cumulative weight first reaches rank
  * max(1, ceil(p·n)) in sorted order (1-indexed) — verified against
  * DuckDB across sizes.
  */
final class KllBuf(val k: Int) {
  /** exact head: distinct item → count (lossless while size ≤ k) */
  val head = new mutable.LongMap[Long]()
  /** levels(l): items of weight 2^l awaiting compaction */
  val levels = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Long]]
  /** per-level alternation bit for the compaction selection */
  val parities = mutable.ArrayBuffer.empty[Boolean]
  var n = 0L
  /** accumulated worst-case rank error: Σ 2^l over performed compactions */
  var errBound = 0L

  private def levelBuf(l: Int): mutable.ArrayBuffer[Long] = {
    while (levels.size <= l) { levels += mutable.ArrayBuffer.empty; parities += false }
    levels(l)
  }

  /** weighted insert that does NOT bump n (merge uses it; add wraps it) */
  def insert(item: Long, w: Long): Unit = {
    head.update(item, head.getOrElse(item, 0L) + w)
    if (head.size > k) spillHead()
  }

  def add(item: Long, w: Long): Unit = { n += w; insert(item, w) }

  /** binary-decompose every head count into the weight hierarchy —
    * lossless: an item with count c lands once in each level of c's set
    * bits. Only the subsequent compactions introduce error.
    */
  private def spillHead(): Unit = {
    head.foreach { case (item, cnt) =>
      var c = cnt; var l = 0
      while (c != 0L) {
        if ((c & 1L) != 0L) levelBuf(l) += item
        c >>>= 1; l += 1
      }
    }
    head.clear()
    compactCascade()
  }

  private def compactCascade(): Unit = {
    var l = 0
    while (l < levels.size) { // levels may grow while compacting
      if (levels(l).size > k) compact(l)
      l += 1
    }
  }

  /** sort, promote alternate elements of an even prefix to level l+1
    * (an odd leftover — the max — stays put); rank error ≤ 2^l.
    */
  private def compact(l: Int): Unit = {
    val sorted = levels(l).toArray
    java.util.Arrays.sort(sorted)
    val odd = sorted.length & 1
    val start = if (parities(l)) 1 else 0
    parities(l) = !parities(l)
    val out = levelBuf(l + 1)
    var i = start
    while (i < sorted.length - odd) { out += sorted(i); i += 2 }
    levels(l).clear()
    if (odd == 1) levels(l) += sorted(sorted.length - 1)
    errBound += 1L << l
  }

  def mergeIn(o: KllBuf): Unit = {
    n += o.n
    errBound += o.errBound
    var l = 0
    while (l < o.levels.size) {
      if (o.levels(l).nonEmpty) levelBuf(l) ++= o.levels(l)
      l += 1
    }
    o.head.foreach { case (item, cnt) => insert(item, cnt) }
    compactCascade()
  }

  /** all retained (item, weight) pairs, item-sorted with weights summed */
  def weightedItems(): (Array[Long], Array[Long]) = {
    val acc = new mutable.LongMap[Long]()
    head.foreach { case (item, cnt) => acc.update(item, acc.getOrElse(item, 0L) + cnt) }
    var l = 0
    while (l < levels.size) {
      val w = 1L << l
      levels(l).foreach(item => acc.update(item, acc.getOrElse(item, 0L) + w))
      l += 1
    }
    val items = acc.keys.toArray
    java.util.Arrays.sort(items)
    (items, items.map(acc(_)))
  }

  /** quantile_disc: the item whose cumulative weight first reaches
    * rank max(1, ceil(p·n)); null-equivalent MinValue on empty input.
    */
  def quantiles(probs: Array[Double]): Array[Long] = {
    val (items, weights) = weightedItems()
    probs.map { p =>
      if (items.isEmpty) Long.MinValue
      else {
        val rank = math.max(1L, math.ceil(p * n.toDouble).toLong)
        var cum = 0L; var i = 0; var ans = items(items.length - 1)
        var found = false
        while (i < items.length && !found) {
          cum += weights(i)
          if (cum >= rank) { ans = items(i); found = true }
          i += 1
        }
        ans
      }
    }
  }
}

object KllBuf {
  /** Wire/storage form — shared by the shuffle serde AND the persisted
    * sketch-table column ([[KllSketchAgg]]): n, errBound, level count,
    * head (item, count) pairs as full longs (head counts are unbounded —
    * one hot value can dominate a 100 TB column), then per level a
    * parity byte + items.
    */
  def toBytes(buf: KllBuf): Array[Byte] = {
    val nLevels = buf.levels.size
    val levelBytes = buf.levels.map(b => 5 + 8 * b.size).sum
    val bb = ByteBuffer.allocate(8 + 8 + 4 + 8 + 16 * buf.head.size + levelBytes)
    bb.putLong(buf.n)
    bb.putLong(buf.errBound)
    bb.putInt(nLevels)
    bb.putLong(buf.head.size.toLong)
    buf.head.foreach { case (item, cnt) => bb.putLong(item); bb.putLong(cnt) }
    buf.levels.zip(buf.parities).foreach { case (b, par) =>
      bb.put(if (par) 1.toByte else 0.toByte)
      bb.putInt(b.size)
      b.foreach(bb.putLong)
    }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte], k: Int): KllBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KllBuf(k)
    buf.n = bb.getLong
    buf.errBound = bb.getLong
    val nLevels = bb.getInt
    var h = bb.getLong
    while (h > 0) {
      val item = bb.getLong; val cnt = bb.getLong
      buf.head.update(item, cnt); h -= 1
    }
    var l = 0
    while (l < nLevels) {
      val par = bb.get() == 1.toByte
      var sz = bb.getInt
      val dst = mutable.ArrayBuffer.empty[Long]
      while (sz > 0) { dst += bb.getLong; sz -= 1 }
      buf.levels += dst
      buf.parities += par
      l += 1
    }
    require(!bb.hasRemaining,
      s"${bb.remaining} trailing bytes after parsing the KLL sketch — " +
        "corrupt or foreign binary")
    buf
  }
}

/** `kll_quantiles(v, k, probs)`: quantile_disc-compatible quantiles of a
  * BIGINT column from one mergeable O(k·log(n/k)) sketch pass. Output
  * struct<qs: array<bigint>, err: bigint, n: bigint> — `err` is the
  * sketch's own accumulated worst-case rank-error certificate (0 ⇔ the
  * answer is exact; the oracle gate pins that regime, the spec pins the
  * certificate under forced compaction).
  */
case class KllQuantiles(child: Expression, k: Int, probs: Seq[Double],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuf] {

  require(k > 1, s"need capacity k > 1, got $k")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    s"probabilities must be within [0, 1], got $probs")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantiles requires a BIGINT input, got ${child.dataType.simpleString}")
  // null on an empty buffer (all-NULL group) — like quantile_disc
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantiles"
  override def dataType: DataType = StructType(Seq(
    StructField("qs", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("n", LongType, nullable = false)))

  override def createAggregationBuffer(): KllBuf = new KllBuf(k)

  override def update(buf: KllBuf, input: InternalRow): KllBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(buf: KllBuf, other: KllBuf): KllBuf = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: KllBuf): Any =
    if (buf.n == 0) null
    else InternalRow(new GenericArrayData(buf.quantiles(probs.toArray)),
      buf.errBound, buf.n)

  override def serialize(buf: KllBuf): Array[Byte] = KllBuf.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): KllBuf =
    KllBuf.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(o: Int): KllQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `kll_sketch(v, k)`: aggregate a BIGINT column into a SERIALIZED
  * sketch (BINARY) — the pre-aggregation half of the mergeable-summary
  * pattern (Agarwal et al., "Mergeable summaries", PODS 2012): store one
  * small sketch per (group, partition-unit) row in a summary table, and
  * answer quantile queries over ANY slice later by merging the covered
  * sketches ([[KllMergeQuantiles]]) — no row rescan, ever.
  */
case class KllSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuf] {
  require(k > 1, s"need capacity k > 1, got $k")
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_sketch requires a BIGINT input, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch"
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): KllBuf = new KllBuf(k)
  override def update(buf: KllBuf, input: InternalRow): KllBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long], 1L)
    buf
  }
  override def merge(buf: KllBuf, other: KllBuf): KllBuf = {
    buf.mergeIn(other); buf
  }
  override def eval(buf: KllBuf): Any = KllBuf.toBytes(buf)
  override def serialize(buf: KllBuf): Array[Byte] = KllBuf.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): KllBuf =
    KllBuf.fromBytes(bytes, k)
  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `kll_merge(sketch, k, probs)`: merge SERIALIZED sketches (BINARY,
  * from [[KllSketchAgg]]) and answer quantiles — the query half of the
  * mergeable-summary pattern. Output struct is identical to
  * [[KllQuantiles]]; merging stored partials answers EXACTLY what a
  * direct sketch over the union would (bit-identical while every
  * partial and the merged head stay in the zero-compaction regime —
  * the q15 gate; certified by `err` past it, since bounds telescope
  * over any merge tree).
  */
case class KllMergeQuantiles(child: Expression, k: Int, probs: Seq[Double],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuf] {
  require(k > 1, s"need capacity k > 1, got $k")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    s"probabilities must be within [0, 1], got $probs")
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_merge requires a BINARY sketch input, got ${child.dataType.simpleString}")
  // null on an empty buffer (no sketches / all-empty) — like quantile_disc
  override def nullable: Boolean = true
  override def prettyName: String = "kll_merge"
  override def dataType: DataType = StructType(Seq(
    StructField("qs", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("n", LongType, nullable = false)))
  override def createAggregationBuffer(): KllBuf = new KllBuf(k)
  override def update(buf: KllBuf, input: InternalRow): KllBuf = {
    val v = child.eval(input)
    if (v != null)
      buf.mergeIn(KllBuf.fromBytes(v.asInstanceOf[Array[Byte]], k))
    buf
  }
  override def merge(buf: KllBuf, other: KllBuf): KllBuf = {
    buf.mergeIn(other); buf
  }
  override def eval(buf: KllBuf): Any =
    if (buf.n == 0) null
    else InternalRow(new GenericArrayData(buf.quantiles(probs.toArray)),
      buf.errBound, buf.n)
  override def serialize(buf: KllBuf): Array[Byte] = KllBuf.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): KllBuf =
    KllBuf.fromBytes(bytes, k)
  override def withNewMutableAggBufferOffset(o: Int): KllMergeQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object Kll {
  /** Quantiles of a BIGINT column at `probs` from a capacity-`k`
    * mergeable sketch; struct<qs, err, n> (err = 0 ⇔ exact).
    */
  def kllQuantiles(v: Column, k: Int, probs: Seq[Double]): Column =
    ColumnBridge.column(
      KllQuantiles(ColumnBridge.expression(v), k, probs)
        .toAggregateExpression())

  /** Serialized capacity-`k` sketch of a BIGINT column (BINARY) — store
    * it; [[kllMerge]] answers later slices without rescanning rows.
    */
  def kllSketch(v: Column, k: Int): Column =
    ColumnBridge.column(
      KllSketchAgg(ColumnBridge.expression(v), k).toAggregateExpression())

  /** Merge stored sketches and answer quantiles; struct<qs, err, n>. */
  def kllMerge(sketch: Column, k: Int, probs: Seq[Double]): Column =
    ColumnBridge.column(
      KllMergeQuantiles(ColumnBridge.expression(sketch), k, probs)
        .toAggregateExpression())
}
