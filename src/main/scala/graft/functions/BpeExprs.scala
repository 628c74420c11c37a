package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A compiled BPE merges table: pair → rank lookup plus a bounded per-JVM
  * word→tokens memo (real corpora repeat words heavily — GPT-2's reference
  * implementation memoizes the same way). Serializable so Catalyst can ship
  * it to executors as a codegen reference object; the lookup structures are
  * transient and rebuilt lazily after deserialization.
  */
final class BpeTable(val merges: Array[(String, String)]) extends Serializable {
  require(merges.nonEmpty, "empty merges table")

  /** "left right" → rank. Symbols never contain whitespace (words are
    * pre-tokenized on \s+), so the single-space separator is unambiguous —
    * and it matches the merges-file line format byte for byte.
    */
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.put(merges(i)._1 + " " + merges(i)._2, i)
      i += 1
    }
    m
  }

  @transient private lazy val wordCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  def tokenizeWord(w: String): Array[String] = {
    val cached = wordCache.get(w)
    if (cached != null) return cached
    val res = tokenizeWordGreedy(w)
    // bound the memo: corpus vocabularies repeat, adversarial inputs don't
    if (wordCache.size < 65536) wordCache.put(w, res)
    res
  }

  private def charSyms(w: String): scala.collection.mutable.ArrayBuffer[String] = {
    // split by CODE POINT (not UTF-16 char) to match engines that treat
    // strings as unicode scalar sequences (DuckDB's substring semantics)
    val syms = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      syms += w.substring(i, i + n)
      i += n
    }
    syms
  }

  /** Standard (GPT-2) greedy BPE: repeatedly find the lowest-ranked adjacent
    * pair and merge ALL its occurrences left-to-right non-overlapping.
    */
  def tokenizeWordGreedy(w: String): Array[String] = {
    var syms = charSyms(w)
    while (true) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) return syms.toArray
      val (l, r) = merges(best)
      val m = l + r
      val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
      var j = 0
      while (j < syms.length) {
        if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
          out += m; j += 2
        } else {
          out += syms(j); j += 1
        }
      }
      syms = out
    }
    throw new IllegalStateException("unreachable")
  }

  /** Stepwise form: merge only the LEFTMOST occurrence of the best pair per
    * iteration — the shape a SQL engine replays as a recursive CTE (one
    * list-splice per step). For a VALID merges file (every multi-character
    * constituent is produced by an earlier merge — true of any learned
    * merges file by construction, checked for ours by BpeSpec) this is
    * equivalent to [[tokenizeWordGreedy]]: a merge of pair P only creates
    * new pairs involving P's merged symbol, whose ranks are all above P's,
    * so the remaining occurrences of P stay the best and are merged
    * left-to-right exactly as the batch form would. BpeSpec pins the two
    * forms identical over the test corpus vocabulary and fuzzed words.
    */
  def tokenizeWordStepwise(w: String): Array[String] = {
    var syms = charSyms(w)
    while (true) {
      var best = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < best) { best = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) return syms.toArray
      syms(bestIdx) = syms(bestIdx) + syms(bestIdx + 1)
      syms.remove(bestIdx + 1)
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Real merges-file byte-pair-encoding tokenization as native expressions.
  *
  * The reference counts tokens with real subword tokenizers; a whitespace
  * approximation under-counts on real text, and the error propagates into
  * every token-budget consumer (chunking windows, packing budgets). These
  * expressions run the standard greedy BPE merge loop (GPT-2 semantics:
  * lowest-ranked adjacent pair first, all occurrences per round) against a
  * merges table broadcast with the plan — a pure NARROW per-row map, no
  * shuffle, linear in corpus bytes at 100 TB.
  *
  * Pre-tokenization is the pipeline's whitespace split (`\s+` after trim,
  * empties dropped); each word is then merged independently from its code
  * points. The merges table rides along as a foldable string in the plan
  * (a merges file is ~1-100 KB — negligible next to the plan itself), so
  * the expression is self-contained and the compiled table is shared via a
  * codegen reference object.
  */
object BpeOps {

  /** Parse GPT-2 style merges-file content: one "left right" pair per line,
    * rank = line order; blank lines and `#...` header lines skipped.
    */
  def parseMerges(content: String): Array[(String, String)] =
    content.linesIterator
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sp = l.split(" ")
        require(sp.length == 2 && sp(0).nonEmpty && sp(1).nonEmpty,
          s"malformed merges line: '$l' (want 'left right')")
        (sp(0), sp(1))
      }
      .toArray

  /** The built-in merges fixture (src/main/resources/graft/bpe/
    * merges-default.txt): 58 merges hand-derived for the test corpus
    * vocabulary, valid in the BPE sense (constituents produced before use).
    * Deployments pass their real learned merges file instead.
    */
  lazy val defaultMergesContent: String = {
    val in = getClass.getResourceAsStream("/graft/bpe/merges-default.txt")
    require(in != null, "missing resource graft/bpe/merges-default.txt")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  lazy val defaultMerges: Array[(String, String)] = parseMerges(defaultMergesContent)

  /** Compiled tables keyed by merges content — one per distinct merges file
    * per JVM, shared across expression instances and their word memos.
    */
  private val tableCache =
    new java.util.concurrent.ConcurrentHashMap[String, BpeTable]()

  def table(mergesContent: String): BpeTable =
    tableCache.computeIfAbsent(mergesContent, c => new BpeTable(parseMerges(c)))

  private val ws = java.util.regex.Pattern.compile("\\s+")

  private def words(text: UTF8String): Array[String] =
    ws.split(text.trim.toString, -1).filter(_.nonEmpty)

  /** Dev/test instrumentation: volatile-gated eval counters so a spec can
    * pin how many times the merge loop really runs per row under codegen
    * (the CSE-single-evaluation proof — a silent per-reference or
    * per-window re-evaluation is invisible to the oracle and expensive at
    * scale). Off by default; cost when off is one volatile read per call,
    * dwarfed by the merge loop itself. local-mode only by design: the
    * counters are per-JVM.
    */
  @volatile var countEvals: Boolean = false
  private val evalCounter = new java.util.concurrent.atomic.LongAdder
  def evalCount: Long = evalCounter.sum()
  def resetEvalCount(): Unit = evalCounter.reset()

  /** All BPE tokens of the text, word by word, document order. */
  def tokenize(text: UTF8String, table: BpeTable): ArrayData = {
    if (countEvals) evalCounter.increment()
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef]()
    for (w <- words(text); t <- table.tokenizeWord(w))
      out += UTF8String.fromString(t)
    new GenericArrayData(out.toArray)
  }

  /** Token count only — the budget form: no array materialization. */
  def tokenCount(text: UTF8String, table: BpeTable): Long = {
    if (countEvals) evalCounter.increment()
    var n = 0L
    for (w <- words(text)) n += table.tokenizeWord(w).length
    n
  }
}

private[functions] trait BpeExpr extends BinaryExpression {
  def text: Expression
  def merges: Expression
  override def left: Expression = text
  override def right: Expression = merges

  override def checkInputDataTypes(): TypeCheckResult = {
    val textOk = text.dataType == StringType || text.dataType == NullType
    val mergesOk = merges.dataType == StringType && merges.foldable &&
      merges.eval() != null
    if (textOk && mergesOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string text, foldable non-null string merges), " +
        s"got ${text.dataType.catalogString}, ${merges.dataType.catalogString}")
  }

  @transient protected lazy val table: BpeTable =
    BpeOps.table(merges.eval().asInstanceOf[UTF8String].toString)

  protected def helper: String // static method on BpeOps

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.BpeOps.$helper($t, $tableRef);")
  }
}

/** `bpe_tokens(text, merges)` → array<string> of BPE tokens (greedy
  * merges-file BPE per whitespace word, document order).
  */
case class BpeTokens(text: Expression, merges: Expression) extends BpeExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"
  override protected def helper: String = "tokenize"
  override protected def nullSafeEval(t: Any, unused: Any): Any =
    BpeOps.tokenize(t.asInstanceOf[UTF8String], table)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BpeTokens = copy(text = newLeft, merges = newRight)
}

/** `bpe_token_count(text, merges)` → bigint BPE token count — the form
  * token-budget consumers (packing) use: no token array materialized.
  */
case class BpeTokenCount(text: Expression, merges: Expression) extends BpeExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"
  override protected def helper: String = "tokenCount"
  override protected def nullSafeEval(t: Any, unused: Any): Any =
    BpeOps.tokenCount(t.asInstanceOf[UTF8String], table)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BpeTokenCount = copy(text = newLeft, merges = newRight)
}
