package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bloom filter over BIGINT keys as a word array: `numBits` bits
  * (power of two, ≥ 64) probed by `numHashes` double-hashed positions
  * h_i = h1 + i·h2 (Kirsch & Mitzenmacher, "Less hashing, same
  * performance", ESA 2006 — two splitmix64 finalizers index like k
  * independent hashes). The structure is linear over bitwise OR: any
  * merge tree yields the identical words, so the distributed build is
  * deterministic under every partitioning.
  *
  * No false negatives ever; false-positive rate ≈ (1 − e^(−k·n/m))^k
  * for n added keys in m bits with k probes.
  */
final class BloomBuf(val numBits: Int, val numHashes: Int) {
  require(numBits >= 64 && Integer.bitCount(numBits) == 1,
    s"numBits $numBits must be a power of 2 and >= 64")
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")
  val words = new Array[Long](numBits / 64)
  var nAdded = 0L

  def add(item: Long): Unit = {
    val h1 = Bloom.mix(item, 0x9e3779b97f4a7c15L)
    // force h2 odd: an even (or zero) stride collapses the k probe
    // positions onto few distinct bits in the power-of-2 table
    val h2 = Bloom.mix(item, 0xc2b2ae3d27d4eb4fL) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = ((h1 + i * h2) & (numBits - 1)).toInt
      words(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
    nAdded += 1
  }
}

object Bloom {
  /** splitmix64 finalizer over item ⊕ salt — the same mixer family the
    * CountMin/SpaceSaving sketches use.
    */
  def mix(item: Long, salt: Long): Long = {
    var z = item ^ salt
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Static probe shared by interpreted eval and generated code. */
  def contains(words: Array[Long], numBits: Int, numHashes: Int,
      item: Long): Boolean = {
    val h1 = mix(item, 0x9e3779b97f4a7c15L)
    val h2 = mix(item, 0xc2b2ae3d27d4eb4fL) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = ((h1 + i * h2) & (numBits - 1)).toInt
      if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Build a Bloom filter of a BIGINT column; returns the word array as
    * array<bigint> (numBits/64 words).
    */
  def bloomAgg(v: Column, numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(
      BloomAgg(ColumnBridge.expression(v), numBits, numHashes)
        .toAggregateExpression())

  /** Membership probe of a BIGINT column against built filter words —
    * a codegen-friendly scalar that keeps the prefilter inside
    * whole-stage codegen.
    */
  def mightContain(v: Column, words: Array[Long], numHashes: Int): Column =
    ColumnBridge.column(
      BloomMightContain(ColumnBridge.expression(v), words, numHashes))

  /** OR stored filter word arrays back into one filter (lossless). */
  def bloomMerge(words: Column, numBits: Int): Column =
    ColumnBridge.column(
      BloomMergeAgg(ColumnBridge.expression(words), numBits)
        .toAggregateExpression())
}

/** Bloom-filter build as a native aggregate: per-partition word arrays
  * OR together (linear — merge-order invariant), so only `numBits/8`
  * bytes per partial buffer ever shuffle regardless of key count.
  */
case class BloomAgg(child: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires a BIGINT input, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): BloomBuf =
    new BloomBuf(numBits, numHashes)

  override def update(buf: BloomBuf, input: InternalRow): BloomBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BloomBuf, other: BloomBuf): BloomBuf = {
    var i = 0
    while (i < buf.words.length) { buf.words(i) |= other.words(i); i += 1 }
    buf.nAdded += other.nAdded
    buf
  }

  override def eval(buf: BloomBuf): Any =
    new GenericArrayData(buf.words.map(w => w: Any))

  override def serialize(buf: BloomBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.words.length)
    bb.putLong(buf.nAdded)
    buf.words.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BloomBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new BloomBuf(numBits, numHashes)
    buf.nAdded = bb.getLong
    var i = 0
    while (i < buf.words.length) { buf.words(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `bloom_merge(words)`: OR stored Bloom word arrays (array<bigint>,
  * from [[BloomAgg]]) back into one filter — the membership member of
  * the summary-table family next to [[graft.functions.KllMergeQuantiles]]
  * (quantiles) and [[graft.functions.CountMinMergeTopK]] (heavy
  * hitters): store one small filter per (group, day) row — "ids seen
  * that day" — and probe ANY date range later by merging the covered
  * filters; bit-OR is lossless for Bloom (merged == direct over the
  * union, bit for bit), so the no-false-negative contract survives
  * storage and any merge tree. nAdded is unrecoverable from stored
  * words (and would double-count shared keys anyway) — the merged
  * buffer reports words only.
  */
case class BloomMergeAgg(child: Expression, numBits: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomBuf] {
  require(numBits >= 64 && Integer.bitCount(numBits) == 1,
    s"numBits $numBits must be a power of 2 and >= 64")
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_merge requires ARRAY<BIGINT> words, got ${other.simpleString}")
    }
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_merge"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // numHashes plays no role in OR-merging; 1 satisfies the buffer ctor
  override def createAggregationBuffer(): BloomBuf = new BloomBuf(numBits, 1)
  override def update(buf: BloomBuf, input: InternalRow): BloomBuf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == buf.words.length,
        s"stored filter has ${arr.numElements()} words, expected " +
          s"${buf.words.length} — numBits mismatch")
      var i = 0
      while (i < buf.words.length) {
        require(!arr.isNullAt(i),
          s"stored filter word $i is NULL — corrupt sketch row")
        buf.words(i) |= arr.getLong(i); i += 1
      }
    }
    buf
  }
  override def merge(buf: BloomBuf, other: BloomBuf): BloomBuf = {
    var i = 0
    while (i < buf.words.length) { buf.words(i) |= other.words(i); i += 1 }
    buf
  }
  override def eval(buf: BloomBuf): Any =
    new GenericArrayData(buf.words.map(w => w: Any))
  override def serialize(buf: BloomBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.words.length)
    bb.putLong(buf.nAdded)
    buf.words.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): BloomBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new BloomBuf(numBits, 1)
    buf.nAdded = bb.getLong
    var i = 0
    while (i < buf.words.length) { buf.words(i) = bb.getLong; i += 1 }
    buf
  }
  override def withNewMutableAggBufferOffset(o: Int): BloomMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `item ∈ bloom` probe over a driver-built word array. The words ride
  * into generated code as a reference object (not a literal), so a
  * megabit filter costs one task-side array reference, and the probe is
  * branch-per-hash inside whole-stage codegen.
  */
case class BloomMightContain(child: Expression, words: Array[Long],
    numHashes: Int) extends UnaryExpression {
  require(words.nonEmpty && Integer.bitCount(words.length) == 1,
    s"word count ${words.length} must be a power of 2")
  private val numBits = words.length * 64

  // Array fields make case-class equals/hashCode reference-based, which
  // defeats Catalyst canonicalization (semantically identical probes
  // never dedup). Compare the filter by content instead.
  override def equals(other: Any): Boolean = other match {
    case BloomMightContain(c, w, k) =>
      c == child && k == numHashes && java.util.Arrays.equals(w, words)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + numHashes) + java.util.Arrays.hashCode(words)

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires BIGINT, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(v: Any): Any =
    Bloom.contains(words, numBits, numHashes, v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Bloom.contains($ref, $numBits, $numHashes, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
