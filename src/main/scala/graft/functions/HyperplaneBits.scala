package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd sign-random-projection signature: the '0'/'1' bit
  * string of `sign(vec · plane_p)` for every hyperplane p.
  *
  * The composable form (one `aggregate(zip_with(...))` per plane,
  * `Similarity.hyperplaneSignature`) materializes P intermediate product
  * arrays per row and walks each twice; at corpus scale the signature pass
  * IS the LSH build cost. This fuses all planes into one pass over the
  * vector with zero per-row allocation beyond the output string, inside
  * whole-stage codegen — same "native Expression beats UDF" lever as
  * [[CosineSimilarity]].
  *
  * Children: (vector, flattened plane matrix as a foldable array<double>
  * literal laid out plane-major, number of planes as a foldable int).
  * Semantics match the composable form exactly: per plane, a sequential
  * index-order fold of `v_i * s_{p,i}` in double precision; bit '1' iff
  * the dot is >= 0.
  */
case class HyperplaneBits(vec: Expression, planesFlat: Expression,
    numPlanes: Expression) extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = planesFlat
  override def third: Expression = numPlanes

  override def dataType: DataType = StringType
  override def prettyName: String = "hyperplane_bits"

  private def vecIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case NullType => true
      case _ => false
    }
    val planesOk = (planesFlat.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }) && planesFlat.foldable
    val nOk = numPlanes.dataType == IntegerType && numPlanes.foldable &&
      (numPlanes.eval() match {
        case n: Integer => n > 0
        case _ => false
      })
    if (vecOk && planesOk && nOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double> vec, foldable " +
        s"array<double> planes, foldable int numPlanes > 0), got " +
        s"${vec.dataType.catalogString}, ${planesFlat.dataType.catalogString}, " +
        s"${numPlanes.dataType.catalogString}")
  }

  // the plane matrix is a literal: extract it once, not per row
  @transient private lazy val planes: Array[Double] =
    planesFlat.eval().asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val nPlanes: Int =
    numPlanes.eval().asInstanceOf[Int]
  @transient private lazy val dim: Int = planes.length / nPlanes

  private def compute(v: ArrayData): UTF8String = {
    val isFloat = vecIsFloat
    // a silent partial dot would diverge from the composable form (which
    // null-pads via zip_with) — refuse mismatched vectors in both paths
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"hyperplane_bits: vector length ${v.numElements()} != plane dim $dim")
    val n = dim
    val out = new Array[Byte](nPlanes)
    var p = 0
    while (p < nPlanes) {
      val base = p * dim
      var dot = 0.0
      var i = 0
      while (i < n) {
        val vi = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += vi * planes(base + i)
        i += 1
      }
      out(p) = if (dot >= 0) '1' else '0'
      p += 1
    }
    UTF8String.fromBytes(out)
  }

  override def nullSafeEval(v: Any, pl: Any, np: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      if (vec.dataType == NullType) s"${ev.value} = UTF8String.EMPTY_UTF8;"
      else {
        val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
        val get =
          if (vecIsFloat) (i: String) => s"(double) $v.getFloat($i)"
          else (i: String) => s"$v.getDouble($i)"
        val n = ctx.freshName("n")
        val out = ctx.freshName("out")
        val p = ctx.freshName("p")
        val base = ctx.freshName("base")
        val dot = ctx.freshName("dot")
        val i = ctx.freshName("i")
        s"""
           |if ($v.numElements() != $dim) {
           |  throw new IllegalArgumentException(
           |    "hyperplane_bits: vector length " + $v.numElements() +
           |    " != plane dim " + $dim);
           |}
           |int $n = $dim;
           |byte[] $out = new byte[$nPlanes];
           |for (int $p = 0; $p < $nPlanes; $p++) {
           |  int $base = $p * $dim;
           |  double $dot = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $dot += ${get(i)} * $planesRef[$base + $i];
           |  }
           |  $out[$p] = $dot >= 0 ? (byte) '1' : (byte) '0';
           |}
           |${ev.value} = UTF8String.fromBytes($out);
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): HyperplaneBits =
    copy(vec = newFirst, planesFlat = newSecond, numPlanes = newThird)
}
