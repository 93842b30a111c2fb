package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matcher (Aho & Corasick 1975, CACM) — the
  * blocklist/phrase-scan primitive a curation pipeline needs at corpus
  * scale: ONE automaton pass over each document finds every occurrence
  * of every pattern in O(text + hits), where the naive per-pattern scan
  * (or a regexp alternation, which backtracks) pays O(text · patterns).
  * The automaton builds once driver-side from the literal pattern list
  * and ships to executors inside the expression (a reference object in
  * generated code — the same literal-embedded static-index discipline
  * as the ANN probes), so scanning is map-only and codegen'd.
  *
  * Match semantics: every (pattern, end-position) pair counts —
  * overlapping and nested occurrences included ("aaa" contains "aa"
  * twice; "spark" contains both "par" and "ark"). That is the exact
  * count a position-scan oracle reproduces, unlike non-overlapping
  * replace()-arithmetic.
  */
final class AcAutomaton(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "AcAutomaton needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "empty pattern matches everywhere")

  // trie over UTF-16 chars, built with boxed maps then FROZEN into
  // primitive parallel arrays — the scan loop pays a binary search over
  // a char[] per input character, never boxing or HashMap hashing (this
  // loop is what the O(text + hits) claim is about)
  private val (nodeChars, nodeNext, fail, out) = {
    val children =
      scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[Character, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var v = 0
      p.foreach { ch =>
        val nxt = children(v).get(ch)
        v = if (nxt != null) nxt.intValue()
        else {
          children += new java.util.HashMap[Character, Integer]()
          ends += Nil
          children(v).put(ch, children.size - 1)
          children.size - 1
        }
      }
      ends(v) = pi :: ends(v)
    }
    val n = children.size
    val failA = new Array[Int](n)
    val outA = new Array[Array[Int]](n)
    outA(0) = ends(0).toArray
    val queue = new java.util.ArrayDeque[Integer]()
    children(0).forEach { (_, c) =>
      failA(c) = 0
      queue.add(c)
    }
    while (!queue.isEmpty) {
      val v = queue.poll().intValue()
      // merged output: own terminals + everything the fail target emits
      outA(v) = (ends(v) ++ outA(failA(v)).toList).toArray
      children(v).forEach { (ch, c) =>
        var f = failA(v)
        while (f != 0 && children(f).get(ch) == null) f = failA(f)
        val t = children(f).get(ch)
        failA(c) = if (t != null && t.intValue() != c.intValue())
          t.intValue() else 0
        queue.add(c)
      }
    }
    val charsA = new Array[Array[Char]](n)
    val nextA = new Array[Array[Int]](n)
    var v = 0
    while (v < n) {
      val pairs = new Array[(Char, Int)](children(v).size)
      var i = 0
      children(v).forEach { (ch, c) => pairs(i) = (ch.charValue(), c); i += 1 }
      val sorted = pairs.sortBy(_._1)
      charsA(v) = sorted.map(_._1)
      nextA(v) = sorted.map(_._2)
      v += 1
    }
    (charsA, nextA, failA, outA)
  }

  /** goto(state, ch) or -1 — binary search over the node's sorted
    * children. */
  private def step(state: Int, ch: Char): Int = {
    val idx = java.util.Arrays.binarySearch(nodeChars(state), ch)
    if (idx >= 0) nodeNext(state)(idx) else -1
  }

  /** Per-pattern occurrence counts over one text (all match ends). */
  def countHits(text: String): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    var state = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      var t = step(state, ch)
      while (t < 0 && state != 0) {
        state = fail(state)
        t = step(state, ch)
      }
      state = if (t >= 0) t else 0
      val o = out(state)
      var j = 0
      while (j < o.length) {
        counts(o(j)) += 1L
        j += 1
      }
      i += 1
    }
    counts
  }

  def countHitsData(s: UTF8String): GenericArrayData =
    new GenericArrayData(countHits(s.toString))

  /** Scrub: delete every character covered by ANY pattern occurrence
    * (the union of all matched spans — overlapping matches merge
    * naturally through the cover mask) and rebuild the rest in order.
    */
  def scrub(text: String): String = {
    val covered = new Array[Boolean](text.length)
    var state = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      var t = step(state, ch)
      while (t < 0 && state != 0) {
        state = fail(state)
        t = step(state, ch)
      }
      state = if (t >= 0) t else 0
      val o = out(state)
      var j = 0
      while (j < o.length) {
        var s = i - patterns(o(j)).length + 1
        while (s <= i) { covered(s) = true; s += 1 }
        j += 1
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(text.length)
    i = 0
    while (i < text.length) {
      if (!covered(i)) sb.append(text.charAt(i))
      i += 1
    }
    sb.toString
  }

  def scrubU(s: UTF8String): UTF8String =
    UTF8String.fromString(scrub(s.toString))
}

/** array<long> of per-pattern occurrence counts (pattern order = the
  * constructor list) — one automaton pass per row, codegen'd.
  */
case class BlocklistHitsExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "blocklist_hits"

  @transient private lazy val automaton =
    new AcAutomaton(patterns.toArray)

  override protected def nullSafeEval(s: Any): Any =
    automaton.countHitsData(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ac.countHitsData($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** The scrubbed text: input minus the union of all matched spans —
  * same single automaton pass, codegen'd.
  */
case class BlocklistScrubExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "blocklist_scrub"

  @transient private lazy val automaton =
    new AcAutomaton(patterns.toArray)

  override protected def nullSafeEval(s: Any): Any =
    automaton.scrubU(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ac.scrubU($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
