package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen elementwise product `a[i] * b[i]` over two `array<double>`
  * columns — the link-prediction edge-feature interaction (`model.py:76`,
  * SURVEY.md §7.4: LR over the Hadamard of endpoint embeddings), sitting
  * on the training feature build and the trained-head serving path. The
  * `zip_with` formulation evaluates its lambda interpreted per element;
  * this is a primitive loop emitting one `UnsafeArrayData` per row inside
  * whole-stage codegen.
  *
  * CONTRACT (dense arrays — same scope as [[DotProduct]]): no null
  * elements; a null element contributes 0.0 here where zip_with would
  * produce a null element. A LENGTH MISMATCH THROWS: this op is the
  * default public interaction on the training/serving feature path, so a
  * width bug upstream must surface as an error, not be silently truncated
  * (zip_with would null-pad to the longer array — also a silent mask).
  * Null top-level inputs → null.
  */
case class Hadamard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_hadamard"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got $l and $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: array length mismatch " +
          s"(${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else x.getDouble(i)
      val yv = if (y.isNullAt(i)) 0.0 else y.getDouble(i)
      out(i) = xv * yv
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_hadamard: array length mismatch (" + $x.numElements() +
         |    " vs " + $y.numElements() + ")");
         |}
         |int $n = $x.numElements();
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $x.isNullAt($i) ? 0.0 : $x.getDouble($i);
         |  double $yv = $y.isNullAt($i) ? 0.0 : $y.getDouble($i);
         |  $out[$i] = $xv * $yv;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hadamard =
    copy(left = newLeft, right = newRight)
}
