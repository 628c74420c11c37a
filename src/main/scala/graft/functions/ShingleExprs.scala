package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word n-gram shingling.
  *
  * The composable form (`transform(sequence(...), i => array_join(slice(
  * tokens, i+1, n)))` + `array_distinct`) runs on Catalyst's interpreted
  * higher-order-function path and re-evaluates the `split` of the whole
  * document once per lambda element — measured ~3 s for 5k docs at sf0.1,
  * which made the shingle pass dominate the entire Jaccard pipeline. These
  * expressions tokenize ONCE per row and emit the distinct shingles (or
  * their xxhash64 keys) in a single pass, with the loop in a static helper
  * the generated code calls, so the projection stays inside whole-stage
  * codegen.
  *
  * Semantics are pinned to the composable reference by PropertySpec:
  *  - tokens = `split(trim(text), "\\s+")` — Spark's space-only trim and
  *    Java-regex split with limit -1 (trailing empties kept, exactly like
  *    Spark's `split`);
  *  - shingles = n-token windows joined with one space, deduped keeping
  *    FIRST occurrence (array_distinct order);
  *  - hashes = Spark's `xxhash64(shingle)` (seed 42) per distinct shingle
  *    string — duplicates from (theoretical) hash collisions of distinct
  *    shingles are kept, matching hash-after-distinct.
  */
object ShingleOps {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  private def distinctShingles(text: UTF8String, n: Int): java.util.LinkedHashSet[String] = {
    val toks = ws.split(text.trim.toString, -1)
    val out = new java.util.LinkedHashSet[String]()
    val m = toks.length - n
    if (m < 0) return out
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out.add(sb.toString)
      i += 1
    }
    out
  }

  /** Distinct shingle strings, first-occurrence order. */
  def shingleStrings(text: UTF8String, n: Int): ArrayData = {
    val seen = distinctShingles(text, n)
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = UTF8String.fromString(it.next())
      k += 1
    }
    new GenericArrayData(out)
  }

  /** xxhash64 of EVERY shingle position (duplicates kept, document order) —
    * the span-statistics form: position i of the result is the key of the
    * n-gram starting at token i, so `posexplode` recovers (position, key)
    * without materializing the gram strings. Same tokenization and hashing
    * as the distinct form.
    */
  def shingleHashesAll(text: UTF8String, n: Int): ArrayData = {
    val toks = ws.split(text.trim.toString, -1)
    val m = toks.length - n
    if (m < 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** xxhash64 (seed 42, Spark's `xxhash64`) of each distinct shingle. */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val seen = distinctShingles(text, n)
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = XxHash64Function.hash(
        UTF8String.fromString(it.next()), StringType, 42L)
      k += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] trait ShingleExpr extends BinaryExpression {
  def text: Expression
  def n: Expression
  override def left: Expression = text
  override def right: Expression = n

  override def checkInputDataTypes(): TypeCheckResult = {
    val textOk = text.dataType == StringType || text.dataType == NullType
    val nOk = n.dataType == IntegerType && n.foldable && (n.eval() match {
      case i: Integer => i > 0
      case _ => false
    })
    if (textOk && nOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string text, foldable int n > 0), got " +
        s"${text.dataType.catalogString}, ${n.dataType.catalogString}")
  }

  @transient protected lazy val nVal: Int = n.eval().asInstanceOf[Int]

  protected def helper: String // static method name on ShingleOps

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.ShingleOps.$helper($t, $nVal);")
}

/** `shingles(text, n)` → array<string> of distinct word n-grams. */
case class Shingles(text: Expression, n: Expression) extends ShingleExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"
  override protected def nullSafeEval(t: Any, unused: Any): Any =
    ShingleOps.shingleStrings(t.asInstanceOf[UTF8String], nVal)
  override protected def helper: String = "shingleStrings"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Shingles = copy(text = newLeft, n = newRight)
}

/** `shingle_hashes(text, n)` → array<bigint> of xxhash64'd distinct
  * n-grams — the join-key form: the shuffle moves 8-byte keys and the
  * shingle strings never leave the row they were built in.
  */
case class ShingleHashes(text: Expression, n: Expression) extends ShingleExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(t: Any, unused: Any): Any =
    ShingleOps.shingleHashes(t.asInstanceOf[UTF8String], nVal)
  override protected def helper: String = "shingleHashes"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ShingleHashes = copy(text = newLeft, n = newRight)
}

/** `shingle_hashes_all(text, n)` → array<bigint> of xxhash64'd n-grams at
  * EVERY position (duplicates kept, document order) — the form duplicated-
  * span statistics need, where position identity matters and within-doc
  * repeats must count.
  */
case class ShingleHashesAll(text: Expression, n: Expression) extends ShingleExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes_all"
  override protected def nullSafeEval(t: Any, unused: Any): Any =
    ShingleOps.shingleHashesAll(t.asInstanceOf[UTF8String], nVal)
  override protected def helper: String = "shingleHashesAll"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ShingleHashesAll = copy(text = newLeft, n = newRight)
}
