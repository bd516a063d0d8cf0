package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick automaton over UTF-8 BYTES, built once on the driver
  * and shipped per plan as a reference object (the
  * [[StringSetContainsExpr]] mechanism).
  *
  * Why an automaton: the multi-phrase scan — "which of these 10k
  * blocklist/taxonomy phrases appear in this document?" — is
  * O(text × phrases) as a `contains` loop and catastrophically worse
  * as a 10k-alternative regex; Aho–Corasick (1975) walks the text
  * ONCE, O(bytes + matches), independent of dictionary size. Byte-
  * level matching equals substring-contains semantics exactly: a
  * valid UTF-8 phrase appearing as a byte substring of valid UTF-8
  * text is always character-aligned (UTF-8 self-synchronization —
  * lead bytes never look like continuation bytes).
  *
  * Matching is byte-exact and case-sensitive: normalize/lowercase
  * upstream ([[graft.functions.text.normalizeUnicode]], `lower`) —
  * folding belongs to the pipeline, not the automaton.
  *
  * Build: standard trie + BFS failure links, with each state's output
  * set closed over its failure chain at build time, so match-time
  * never walks fail links to collect outputs. Transitions live in one
  * open-addressed long→int table keyed by `(state << 8) | byte` —
  * no per-state 256-entry arrays (a 10k-phrase dictionary would cost
  * ~200 MB dense; the table stays proportional to total trie edges).
  */
final class AhoCorasick(rawPhrases: Array[String]) extends Serializable {
  require(rawPhrases.nonEmpty, "Aho-Corasick needs at least one phrase")
  require(rawPhrases.forall(_.nonEmpty), "empty phrases match everywhere; drop them upstream")

  /** Distinct phrases in lexicographic (binary UTF-8) order — the
    * emission order of every match array, so downstream hashing and
    * external replays see one canonical layout. Binary UTF-8, not
    * Java's UTF-16 `String` order: the two diverge for supplementary-
    * plane phrases (surrogate code units sort below U+E000..U+FFFF),
    * and external engines compare bytes.
    */
  val phrases: Array[String] = rawPhrases.distinct
    .sortBy(p => UTF8String.fromString(p))(
      Ordering.comparatorToOrdering(java.util.Comparator.naturalOrder[UTF8String]()))

  @transient private lazy val utf8Phrases: Array[UTF8String] =
    phrases.map(UTF8String.fromString)

  // --- trie + failure links, built eagerly at construction ---
  // edgesKey/edgesVal: open-addressed hash table, key = (state<<8)|byte+1
  // (0 marks an empty slot), value = target state. fail/out per state.
  private val (edgesKey, edgesVal, fail, out) = build()

  private def build(): (Array[Long], Array[Int], Array[Int], Array[Array[Int]]) = {
    val byteSeqs = phrases.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // pass 1: count trie nodes with a temporary java map
    val tmp = new java.util.HashMap[Long, Int]()
    var nStates = 1
    byteSeqs.foreach { bs =>
      var s = 0
      bs.foreach { b =>
        val k = (s.toLong << 8) | (b & 0xffL)
        if (tmp.containsKey(k)) s = tmp.get(k)
        else { tmp.put(k, nStates); s = nStates; nStates += 1 }
      }
    }
    // open-addressed table sized to load factor <= 0.5
    var cap = java.lang.Long.highestOneBit(math.max(16L, tmp.size.toLong * 2L)).toInt
    if (cap < tmp.size * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val vals = new Array[Int](cap)
    def put(k: Long, v: Int): Unit = {
      var i = (java.lang.Long.hashCode(k * 0x9e3779b97f4a7c15L) & (cap - 1))
      while (keys(i) != 0L) i = (i + 1) & (cap - 1)
      keys(i) = k; vals(i) = v
    }
    val it = tmp.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); put(e.getKey + 1L, e.getValue) }

    def get(state: Int, b: Byte): Int = {
      val k = ((state.toLong << 8) | (b & 0xffL)) + 1L
      var i = (java.lang.Long.hashCode(k * 0x9e3779b97f4a7c15L) & (cap - 1))
      while (keys(i) != 0L) {
        if (keys(i) == k) return vals(i)
        i = (i + 1) & (cap - 1)
      }
      -1
    }

    // phrase terminal states
    val ownOut = Array.fill(nStates)(List.empty[Int])
    byteSeqs.zipWithIndex.foreach { case (bs, pi) =>
      var s = 0
      bs.foreach { b => s = get(s, b) }
      ownOut(s) = pi :: ownOut(s)
    }
    // BFS failure links + output closure
    val failArr = new Array[Int](nStates)
    val outArr = new Array[Array[Int]](nStates)
    val childBytes = Array.fill(nStates)(List.empty[Byte])
    val it2 = tmp.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      val parent = (e.getKey >>> 8).toInt
      childBytes(parent) = (e.getKey & 0xffL).toByte :: childBytes(parent)
    }
    val queue = new java.util.ArrayDeque[Int]()
    outArr(0) = ownOut(0).toArray
    childBytes(0).foreach { b =>
      val c = get(0, b)
      failArr(c) = 0
      queue.add(c)
    }
    while (!queue.isEmpty) {
      val u = queue.poll()
      val fOut = outArr(failArr(u))
      outArr(u) =
        if (ownOut(u).isEmpty) fOut
        else (ownOut(u) ++ fOut).toArray
      childBytes(u).foreach { b =>
        val c = get(u, b)
        var f = failArr(u)
        var t = get(f, b)
        while (t < 0 && f != 0) { f = failArr(f); t = get(f, b) }
        failArr(c) = if (t >= 0 && t != c) t else 0
        queue.add(c)
      }
    }
    (keys, vals, failArr, outArr)
  }

  private def lookup(state: Int, b: Byte): Int = {
    val cap = edgesKey.length
    val k = ((state.toLong << 8) | (b & 0xffL)) + 1L
    var i = (java.lang.Long.hashCode(k * 0x9e3779b97f4a7c15L) & (cap - 1))
    while (edgesKey(i) != 0L) {
      if (edgesKey(i) == k) return edgesVal(i)
      i = (i + 1) & (cap - 1)
    }
    -1
  }

  /** Distinct matched phrases, lexicographic order, as Catalyst array
    * data — called from both interpreted eval and generated code.
    */
  def findMatches(text: UTF8String): ArrayData = {
    val n = text.numBytes()
    var state = 0
    var hits: java.util.BitSet = null
    var i = 0
    while (i < n) {
      val b = text.getByte(i)
      var t = lookup(state, b)
      while (t < 0 && state != 0) { state = fail(state); t = lookup(state, b) }
      state = if (t >= 0) t else 0
      val o = out(state)
      if (o != null && o.nonEmpty) {
        if (hits == null) hits = new java.util.BitSet(phrases.length)
        var j = 0
        while (j < o.length) { hits.set(o(j)); j += 1 }
      }
      i += 1
    }
    if (hits == null) new GenericArrayData(Array.empty[Any])
    else {
      val res = new Array[Any](hits.cardinality())
      var k = 0
      var pi = hits.nextSetBit(0)
      while (pi >= 0) { // phrase ids are already in lexicographic order
        res(k) = utf8Phrases(pi); k += 1
        pi = hits.nextSetBit(pi + 1)
      }
      new GenericArrayData(res)
    }
  }
}

/** One-pass multi-phrase tagger: `array<string>` of the DISTINCT
  * dictionary phrases appearing in the input (byte substring match),
  * in lexicographic order. The blocklist / taxonomy-routing scan at
  * corpus scale: one automaton walk per document regardless of
  * dictionary size, fully inside whole-stage codegen, zero shuffle.
  *
  * Deliberately NOT SQL-registered (the NearestCentroidsExpr policy):
  * the dictionary is a runtime-built object SQL text cannot carry —
  * use [[graft.functions.text.matchPhrases]].
  */
case class MultiPhraseMatchExpr(child: Expression, phraseList: Seq[String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_match_phrases requires a string child, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_match_phrases"

  @transient private lazy val ac = new AhoCorasick(phraseList.toArray)

  override def nullSafeEval(v: Any): Any = ac.findMatches(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftAhoCorasick", ac, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $acRef.findMatches($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPhraseMatchExpr =
    copy(child = newChild)
}
