package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick automaton over a fixed phrase dictionary (Aho &
  * Corasick 1975). Built ONCE per plan (transient lazy — each executor
  * reconstructs from the serialized phrase list), then every row is a
  * single left-to-right scan: O(|text|) amortized via fail links,
  * INDEPENDENT of dictionary size. The scale rationale: a
  * thousand-phrase blocklist as a regex alternation de-optimizes into
  * per-phrase backtracking, and a `contains` loop is
  * O(|text|·|phrases|); the automaton is the standard fix.
  */
private[functions] final class AcAutomaton(val phrases: Array[String]) {
  private val children =
    scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
  private val outSets =
    scala.collection.mutable.ArrayBuffer(Set.empty[Int])

  for ((p, pi) <- phrases.zipWithIndex if p.nonEmpty) {
    var v = 0
    for (ch <- p) {
      v = children(v).getOrElseUpdate(ch, {
        children += scala.collection.mutable.Map.empty
        outSets += Set.empty
        children.length - 1
      })
    }
    outSets(v) += pi
  }

  private val fail = new Array[Int](children.length)
  locally {
    val q = scala.collection.mutable.Queue.empty[Int]
    for ((_, c) <- children(0)) { fail(c) = 0; q += c }
    while (q.nonEmpty) {
      val v = q.dequeue()
      for ((ch, c) <- children(v)) {
        var f = fail(v)
        while (f != 0 && !children(f).contains(ch)) f = fail(f)
        val t = children(f).getOrElse(ch, 0)
        fail(c) = if (t == c) 0 else t
        outSets(c) = outSets(c) ++ outSets(fail(c))
        q += c
      }
    }
  }

  private val outArr: Array[Array[Int]] = outSets.map(_.toArray).toArray

  /** Distinct matched phrases, lexicographically sorted (the order the
    * DuckDB oracle's list_sort produces).
    */
  def search(s: String): Array[String] = {
    var v = 0
    val hits = new java.util.BitSet(phrases.length)
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      while (v != 0 && !children(v).contains(ch)) v = fail(v)
      v = children(v).getOrElse(ch, 0)
      val o = outArr(v)
      var k = 0
      while (k < o.length) { hits.set(o(k)); k += 1 }
      i += 1
    }
    val res = scala.collection.mutable.ArrayBuffer.empty[String]
    var b = hits.nextSetBit(0)
    while (b >= 0) { res += phrases(b); b = hits.nextSetBit(b + 1) }
    res.sorted.toArray
  }
}

/** Per-EXECUTOR automaton cache, identity-keyed on the broadcast
  * phrase array: a Broadcast value is ONE object per executor, so
  * every task of every stage using the same dictionary shares one
  * automaton build instead of rebuilding per deserialized expression
  * instance (= per task). Weak keys + weak values: an entry lives
  * only while the broadcast block itself does — once ContextCleaner
  * reaps the dictionary, the automaton is collectable too.
  */
private[functions] object AcAutomatons {
  // SOFT references, not weak: a weak value dies at the first GC after
  // the stage's tasks finish, so every later stage would pay the full
  // automaton rebuild (and serialize concurrent tasks behind the
  // synchronized build) — soft values survive until memory pressure,
  // which matches the "lives while the dictionary block does" intent
  private val cache = new java.util.WeakHashMap[
    Array[String], java.lang.ref.SoftReference[AcAutomaton]]()
  def get(phrases: Array[String]): AcAutomaton = cache.synchronized {
    Option(cache.get(phrases)).flatMap(r => Option(r.get())).getOrElse {
      val ac = new AcAutomaton(phrases)
      cache.put(phrases, new java.lang.ref.SoftReference(ac))
      ac
    }
  }
}

/** ac_matches(text) → array<string>: the DISTINCT dictionary phrases
  * occurring in `text` as substrings, lexicographically sorted. Empty
  * phrases are ignored; matching is case-sensitive (normalize
  * upstream). Pure narrow map — no join, no shuffle. The dictionary
  * rides a Broadcast (one block per executor), never the serialized
  * expression (= every task binary): a production blocklist of 10⁵–10⁶
  * phrases is tens of MB, and the expression-field form would ship it
  * per task AND rebuild the automaton per task — [[AcAutomatons]]
  * builds it once per executor per dictionary.
  */
case class AhoCorasickMatches(child: Expression,
                              phrases: Broadcast[Array[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ac_matches"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ac_matches expects string, got ${t.simpleString}")
  }

  @transient private lazy val ac = AcAutomatons.get(phrases.value)

  def matchesFor(t: UTF8String): ArrayData =
    new GenericArrayData(
      ac.search(t.toString).map(UTF8String.fromString(_): Any))

  override def nullSafeEval(x: Any): Any =
    matchesFor(x.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // automaton walk lives in compiled Scala; codegen routes the call
      val ref = ctx.addReferenceObj("acMatcher", this,
        classOf[AhoCorasickMatches].getName)
      s"${ev.value} = $ref.matchesFor($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): AhoCorasickMatches = copy(child = newChild)
}

object MultiPattern {
  /** ac_matches(text, dictionary) — distinct matched phrases, sorted.
    * The broadcast cache keys on the caller's `phrases` instance when
    * it is IMMUTABLE (the common case — repeated calls with the same
    * Seq share one dictionary block AND get equal expressions, same
    * Broadcast reference, preserving subexpression/exchange reuse);
    * a MUTABLE Seq is snapshotted first, because a WeakHashMap key
    * whose content (and so hashCode) mutates after insertion strands
    * its entry in the stale hash bucket — unfindable and unevictable
    * until the caller drops the Seq. The snapshot costs the mutable
    * caller cross-call sharing (a fresh key per call lives only until
    * the next GC), never correctness: the `sameElements` guard makes
    * any content mismatch re-broadcast. */
  def acMatches(text: Column, phrases: Seq[String]): Column = {
    val snap: Seq[String] = phrases match {
      case v: scala.collection.immutable.Seq[String] => v
      case other => other.toVector
    }
    GraftBridge.column(AhoCorasickMatches(
      GraftBridge.expression(text),
      KernelBroadcasts.byKey(snap, snap.toArray)(
        b => b.length == snap.length && b.sameElements(snap))))
  }
}
