package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two embedding arrays
  * (array&lt;float&gt; or array&lt;double&gt;).
  *
  * The composable form — `aggregate(zip_with(a, b, *), ...)` (Similarity
  * .cosine) — materializes an intermediate product array per row and walks
  * it again to fold; at ANN scan scale (corpus x queries rows) that's the
  * hot loop. This expression fuses dot(a,b), |a| and |b| into ONE pass with
  * zero allocation, and participates in whole-stage codegen via
  * [[doGenCode]] — the "custom Catalyst Expression beats UDF" path for
  * operators Spark can't express efficiently (the reference's equivalent
  * lever is its WASM/native UDFs, `crates/datafusion-udfs-wasm`).
  *
  * Semantics match Similarity.cosine exactly: sequential fold in array
  * order, products in double precision, NaN for zero-norm inputs.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def elementType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case NullType => true // NULL literal: null-safe eval yields null
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xFloat = elementType(left) == FloatType
    val yFloat = elementType(right) == FloatType
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = if (xFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // a NullType child never reaches the non-null branch, but the branch
      // must still compile — emit a dead constant assignment for that case
      if (left.dataType == NullType || right.dataType == NullType) {
        s"${ev.value} = 0.0;"
      } else genLoop(ctx, ev, a, b)
    })

  private def genLoop(ctx: CodegenContext, ev: ExprCode,
      a: String, b: String): String = {
      def get(arr: String, e: Expression, i: String): String =
        if (elementType(e) == FloatType) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = ${get(a, left, i)};
         |  double $yi = ${get(b, right, i)};
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd squared L2 distance over two numeric arrays — the
  * distance kernel of product quantization ([[graft.operators.Quantize]]):
  * the composable `aggregate(zip_with(a, b, ...))` form allocates an
  * intermediate array per (row × centroid) and folds it interpreted,
  * which dominates the PQ fit/assign passes (measured 3× the whole
  * query). One fused pass, zero allocation, same null/length semantics
  * as [[CosineSimilarity]].
  */
case class SquaredL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq"

  private def elementType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case NullType => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xFloat = elementType(left) == FloatType
    val yFloat = elementType(right) == FloatType
    var acc = 0.0; var i = 0
    while (i < n) {
      val xi = if (xFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yFloat) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xi - yi
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      if (left.dataType == NullType || right.dataType == NullType) {
        s"${ev.value} = 0.0;"
      } else {
        def get(arr: String, e: Expression, i: String): String =
          if (elementType(e) == FloatType) s"(double) $arr.getFloat($i)"
          else s"$arr.getDouble($i)"
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val i = ctx.freshName("i")
        val d = ctx.freshName("d")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $d = ${get(a, left, i)} - ${get(b, right, i)};
           |  $acc += $d * $d;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredL2 =
    copy(left = newLeft, right = newRight)
}

/** Registration of native expressions into the session function registry
  * (the programmatic equivalent of a `SparkSessionExtensions.injectFunction`
  * hook, usable on an already-built session).
  */
object NativeFunctions {
  /** Idempotent per session: re-registering an existing temp function makes
    * SimpleFunctionRegistry log a replacement warning per call site, so skip
    * names the session registry already has.
    */
  def register(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    def registerOnce(name: String,
        builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    registerOnce("cosine_sim",
      exprs => CosineSimilarity(exprs.head, exprs(1)))
    registerOnce("l2_sq",
      exprs => SquaredL2(exprs.head, exprs(1)))
    registerOnce("hyperplane_bits",
      exprs => HyperplaneBits(exprs.head, exprs(1), exprs(2)))
    registerOnce("shingles",
      exprs => Shingles(exprs.head, exprs(1)))
    registerOnce("shingle_hashes",
      exprs => ShingleHashes(exprs.head, exprs(1)))
    registerOnce("shingle_hashes_all",
      exprs => ShingleHashesAll(exprs.head, exprs(1)))
    registerOnce("minhash_signature",
      exprs => MinhashSignature(exprs.head, exprs(1), exprs(2)))
    registerOnce("bpe_tokens",
      exprs => BpeTokens(exprs.head, exprs(1)))
    registerOnce("bpe_token_count",
      exprs => BpeTokenCount(exprs.head, exprs(1)))
  }
}
