package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen dot product over two `array<double>` columns — the
  * custom-Expression tier of the extension ladder (SURVEY.md §2.9): the
  * rowwise dot (F9, `model.py:76`) sits on every scoring/similarity hot
  * path, and the `zip_with` + `aggregate` formulation evaluates its
  * lambdas interpreted with a per-element call round trip. This compiles
  * to a tight primitive loop inside whole-stage codegen.
  *
  * CONTRACT (dense arrays): the engine's embedding/feature arrays contain
  * no null elements, and the equivalence with the HOF formulation
  * (`ArrayOps.dotHof`, asserted by ArrayOpsSpec) holds only for such
  * inputs. On the shared domain: double accumulation left-to-right
  * (deterministic), null top-level inputs → null, lengths truncated to
  * the shorter array. Outside it the formulations intentionally differ —
  * this expression skips null ELEMENTS (a branch-light total loop), while
  * the HOF form propagates them to a null result. Callers cast
  * `array<float>` inputs to `array<double>` (exact) — see `ArrayOps.dot`.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

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
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $sum += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
