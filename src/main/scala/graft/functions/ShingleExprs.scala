package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, XxHash64Function}
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

  /** Whole MinHash signature in ONE pass over the document: component i is
    * the lexicographic MIN over the document's shingles of the lowercase-hex
    * md5 of `"$i:" + shingle` — bit-identical to exploding distinct
    * shingles and aggregating `min(md5(concat("$i:", shingle)))` per
    * component, because (a) MIN is duplicate-insensitive, so the distinct
    * step is unnecessary, and (b) unsigned byte-wise comparison of the raw
    * 16-byte digest equals string comparison of its lowercase hex encoding
    * (each byte maps to two hex chars monotonically). Returns null when the
    * document has no shingle (fewer than n tokens) — the aggregate form
    * drops such docs from the signature matrix, so callers filter nulls.
    *
    * Scale shape: this turns the signature stage from
    * explode(corpus × ~10² shingle rows) → exchange → 16-way string-min
    * hash aggregate into a pure NARROW map — no shuffle, no per-component
    * UTF8String/concat allocation (one thread-local digest, two reused
    * 16-byte buffers per component). The md5 count (numHashes per distinct
    * shingle) is inherent to the algorithm and unchanged.
    */
  def minhashSignature(text: UTF8String, n: Int, numHashes: Int): ArrayData = {
    val seen = distinctShingles(text, n)
    if (seen.isEmpty) return null
    val md = localMd5.get()
    val prefixes = minhashPrefixes(numHashes)
    val mins = new Array[Array[Byte]](numHashes)
    val tmp = new Array[Byte](16)
    val it = seen.iterator()
    while (it.hasNext) {
      val sBytes = it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < numHashes) {
        md.reset()
        md.update(prefixes(i))
        md.update(sBytes)
        md.digest(tmp, 0, 16)
        if (mins(i) == null) mins(i) = tmp.clone()
        else if (java.util.Arrays.compareUnsigned(tmp, mins(i)) < 0)
          System.arraycopy(tmp, 0, mins(i), 0, 16)
        i += 1
      }
    }
    val hex = "0123456789abcdef".toCharArray
    val out = new Array[AnyRef](numHashes)
    var i = 0
    while (i < numHashes) {
      val chars = new Array[Byte](32)
      var j = 0
      while (j < 16) {
        chars(2 * j) = hex((mins(i)(j) >> 4) & 0xf).toByte
        chars(2 * j + 1) = hex(mins(i)(j) & 0xf).toByte
        j += 1
      }
      out(i) = UTF8String.fromBytes(chars)
      i += 1
    }
    new GenericArrayData(out)
  }

  private val localMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** `"0:".."k-1:"` prefix bytes, cached per numHashes (always tiny). */
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def minhashPrefixes(numHashes: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(numHashes, k =>
      Array.tabulate(k)(i =>
        s"$i:".getBytes(java.nio.charset.StandardCharsets.UTF_8)))

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

/** `minhash_signature(text, n, numHashes)` → array<string> (nullable):
  * element i is `min(md5('i:' || shingle))` over the document's distinct
  * word n-grams, null when the document has fewer than n tokens. See
  * [[ShingleOps.minhashSignature]] for the equivalence argument with the
  * explode + 16-way-min aggregate form it replaces.
  */
case class MinhashSignature(text: Expression, n: Expression,
    numHashes: Expression) extends TernaryExpression {
  override def first: Expression = text
  override def second: Expression = n
  override def third: Expression = numHashes
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = {
    def fold(e: Expression): Boolean =
      e.dataType == IntegerType && e.foldable && (e.eval() match {
        case i: Integer => i > 0
        case _ => false
      })
    if ((text.dataType == StringType || text.dataType == NullType) &&
        fold(n) && fold(numHashes)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string text, foldable int n > 0, foldable " +
        s"int numHashes > 0), got ${text.dataType.catalogString}, " +
        s"${n.dataType.catalogString}, ${numHashes.dataType.catalogString}")
  }

  @transient private lazy val nVal: Int = n.eval().asInstanceOf[Int]
  @transient private lazy val kVal: Int = numHashes.eval().asInstanceOf[Int]

  override protected def nullSafeEval(t: Any, unused1: Any, unused2: Any): Any =
    ShingleOps.minhashSignature(t.asInstanceOf[UTF8String], nVal, kVal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _, _) => s"""
      ${ev.value} = graft.functions.ShingleOps.minhashSignature($t, $nVal, $kVal);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): MinhashSignature =
    copy(text = newFirst, n = newSecond, numHashes = newThird)
}
