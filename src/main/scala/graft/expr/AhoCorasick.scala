package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton over UTF-16 code units, built once
  * per plan on the driver and broadcast with the closure — the blocklist
  * scan a curation pipeline runs over every document (NSFW/PII/boilerplate
  * term lists commonly hold 10⁴–10⁶ entries; P separate `contains` scans
  * are O(P·n) per row, the automaton is O(n + matches) in ONE pass).
  *
  * Semantics: the set of DISTINCT patterns present as substrings (contains
  * semantics — the curation decision is "which blocked terms appear", not
  * an occurrence count), returned sorted for determinism, so a DuckDB
  * oracle can mirror the result with a per-pattern `contains` filter.
  *
  * Classic construction (Aho & Corasick 1975, CACM 18(6)): goto trie over
  * pattern code units, BFS failure links, output sets propagated through
  * failure chains — collapsed here to a per-node matched-pattern-id list
  * so the scan never walks failure chains for output.
  */
final class AcAutomaton(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "aho_corasick: empty pattern list")
  require(patterns.forall(_.nonEmpty), "aho_corasick: empty pattern")
  require(patterns.distinct.length == patterns.length, "aho_corasick: duplicate patterns")

  // trie over chars: goto maps per node; built eagerly, frozen into arrays
  private val gotoMaps = scala.collection.mutable.ArrayBuffer(
    new java.util.HashMap[Character, Integer]())
  private val outIds = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)

  patterns.zipWithIndex.foreach { case (p, pid) =>
    var node = 0
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      val nxt = gotoMaps(node).get(c)
      node = if (nxt != null) nxt.intValue()
      else {
        gotoMaps += new java.util.HashMap[Character, Integer]()
        outIds += Nil
        gotoMaps(node).put(c, gotoMaps.length - 1)
        gotoMaps.length - 1
      }
      i += 1
    }
    outIds(node) = pid :: outIds(node)
  }

  private val fail = new Array[Int](gotoMaps.length)
  locally { // BFS failure links; merge output sets down the failure chain
    val queue = new java.util.ArrayDeque[Integer]()
    gotoMaps(0).forEach((_, v) => { fail(v) = 0; queue.add(v) })
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      gotoMaps(u).forEach { (c, v) =>
        var f = fail(u)
        while (f != 0 && gotoMaps(f).get(c) == null) f = fail(f)
        val fv = gotoMaps(f).get(c)
        fail(v) = if (fv != null && fv != v) fv.intValue() else 0
        outIds(v) = outIds(v) ++ outIds(fail(v))
        queue.add(v)
      }
    }
  }
  private val gotoFrozen: Array[java.util.HashMap[Character, Integer]] = gotoMaps.toArray
  private val outFrozen: Array[Array[Int]] = outIds.map(_.toArray).toArray

  /** Distinct matched pattern ids, ascending. */
  def scan(s: String): Array[Int] = {
    val seen = new java.util.BitSet(patterns.length)
    var node = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      var n = node
      while (n != 0 && gotoFrozen(n).get(c) == null) n = fail(n)
      val nxt = gotoFrozen(n).get(c)
      node = if (nxt != null) nxt.intValue() else 0
      val out = outFrozen(node)
      var j = 0
      while (j < out.length) { seen.set(out(j)); j += 1 }
      i += 1
    }
    val res = new Array[Int](seen.cardinality())
    var b = seen.nextSetBit(0)
    var k = 0
    while (b >= 0) { res(k) = b; k += 1; b = seen.nextSetBit(b + 1) }
    res
  }
}

object AcAutomaton {
  /** Scan returning the matched pattern STRINGS sorted lexicographically
    * (determinism contract; ids follow insertion order, not sort order).
    */
  def matchSorted(ac: AcAutomaton, s: UTF8String)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val ids = ac.scan(s.toString)
    val strs = new Array[String](ids.length)
    var i = 0
    while (i < ids.length) { strs(i) = ac.patterns(ids(i)); i += 1 }
    java.util.Arrays.sort(strs, java.util.Comparator.naturalOrder[String]())
    val out = new Array[Any](strs.length)
    i = 0
    while (i < strs.length) { out(i) = UTF8String.fromString(strs(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `ac_match(text) → array<string>`: the sorted distinct blocklist patterns
  * occurring in `text` — one Aho–Corasick pass regardless of list size.
  */
case class AcMatch(child: Expression, patterns: Array[String]) extends UnaryExpression {

  // validate eagerly WITHOUT building (construction also runs on every
  // executor deserialization — a second trie build per JVM would double
  // init cost at large list sizes); the automaton itself builds lazily
  // once per JVM on first eval
  require(patterns.nonEmpty, "ac_match: empty pattern list")
  require(patterns.forall(_.nonEmpty), "ac_match: empty pattern")
  require(patterns.distinct.length == patterns.length, "ac_match: duplicate patterns")
  @transient private lazy val automaton = new AcAutomaton(patterns)

  override def prettyName: String = "ac_match"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName expects a string argument")

  override def nullSafeEval(v: Any): Any =
    AcAutomaton.matchSorted(automaton, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton, classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"graft.expr.AcAutomaton.matchSorted($acRef, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
