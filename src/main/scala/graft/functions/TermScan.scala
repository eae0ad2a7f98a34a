package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compact Aho-Corasick automaton (Aho & Corasick 1975): one pass
  * over the text counts ALL occurrences of every pattern
  * simultaneously — the single-scan replacement for k independent
  * substring scans in blocklist/contamination filtering.
  *
  * Node children are sorted parallel arrays probed by binary search
  * (alphabet-agnostic, cache-friendly); failure links are precomputed
  * BFS-style and the per-node output lists are pre-aggregated across
  * the suffix chain, so the scan loop never walks fail links for
  * output — worst case per char is the fail-walk amortized O(1).
  *
  * For patterns with no self-border (no proper prefix == suffix), the
  * total count equals the non-overlapping count that a
  * replace-and-measure scan produces — the oracle contract. */
final class AhoCorasick(val terms: Array[String]) extends Serializable {
  // trie build on growable structures, then frozen to parallel arrays
  private val (childChar, childNode, childOff, fail, outTerms, outOff) = {
    import scala.collection.mutable
    val kids = mutable.ArrayBuffer(mutable.TreeMap[Char, Int]())
    val ends = mutable.ArrayBuffer(List.empty[Int])
    terms.zipWithIndex.foreach { case (t, ti) =>
      require(t.nonEmpty, "empty blocklist term")
      var st = 0
      t.foreach { c =>
        st = kids(st).getOrElseUpdate(c, {
          kids += mutable.TreeMap[Char, Int]()
          ends += Nil
          kids.size - 1
        })
      }
      ends(st) ::= ti
    }
    val n = kids.size
    val failA = new Array[Int](n)
    // BFS failure links + suffix-chain output aggregation
    val order = mutable.ArrayBuffer[Int]()
    val queue = mutable.Queue[Int]()
    kids(0).values.foreach { c => failA(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      order += u
      kids(u).foreach { case (ch, v) =>
        var f = failA(u)
        while (f != 0 && !kids(f).contains(ch)) f = failA(f)
        failA(v) = if (kids(f).contains(ch) && kids(f)(ch) != v) kids(f)(ch) else 0
        queue += v
      }
    }
    order.foreach(u => ends(u) = ends(u) ++ ends(failA(u))) // BFS order: fail is shallower
    val off = new Array[Int](n + 1)
    (0 until n).foreach(i => off(i + 1) = off(i) + kids(i).size)
    val cc = new Array[Char](off(n)); val cn = new Array[Int](off(n))
    (0 until n).foreach { i =>
      kids(i).zipWithIndex.foreach { case ((ch, v), j) =>
        cc(off(i) + j) = ch; cn(off(i) + j) = v
      }
    }
    val oOff = new Array[Int](n + 1)
    (0 until n).foreach(i => oOff(i + 1) = oOff(i) + ends(i).size)
    val oT = new Array[Int](oOff(n))
    (0 until n).foreach { i =>
      ends(i).zipWithIndex.foreach { case (t, j) => oT(oOff(i) + j) = t }
    }
    (cc, cn, off, failA, oT, oOff)
  }

  private def step(state: Int, c: Char): Int = {
    var st = state
    while (true) {
      val lo = childOff(st); val hi = childOff(st + 1)
      var a = lo; var b = hi - 1
      while (a <= b) {
        val m = (a + b) >>> 1
        if (childChar(m) == c) return childNode(m)
        else if (childChar(m) < c) a = m + 1 else b = m - 1
      }
      if (st == 0) return 0
      st = fail(st)
    }
    0
  }

  /** Per-term occurrence counts over `s`. */
  def scan(s: String): Array[Long] = {
    val counts = new Array[Long](terms.length)
    var st = 0
    var i = 0
    while (i < s.length) {
      st = step(st, s.charAt(i))
      var o = outOff(st)
      while (o < outOff(st + 1)) { counts(outTerms(o)) += 1; o += 1 }
      i += 1
    }
    counts
  }
}

/** `term_scan(text)` — array<bigint> of per-term occurrence counts
  * from one fused Aho-Corasick pass. The term list is a JVM
  * constructor parameter (the TileMaskExpr precedent), so this is
  * Column-API-only — noted in GraftExtensions. */
final case class TermScanExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val automaton = new AhoCorasick(terms.toArray)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "term_scan"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(automaton.scan(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("ahoCorasick", automaton,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($ac.scan($c.toString()));")
  }

  override protected def withNewChildInternal(newChild: Expression): TermScanExpr =
    copy(child = newChild)
}

object TermScanExpr {
  def termScan(text: Column, terms: Seq[String]): Column =
    ExpressionUtils.column(TermScanExpr(ExpressionUtils.expression(text), terms))
}
