package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused codegen cosine similarity: dot, ‖a‖² and ‖b‖² accumulate in ONE
  * pass over the arrays, where the Column-level composition
  * (`dot(a,b) / (sqrt(dot(a,a))·sqrt(dot(b,b)))`) walks the arrays three
  * times. Semantics on DENSE arrays (the scoped contract — see the
  * DotProduct scaladoc): 0 when either vector is all-zero, null inputs →
  * null, lengths truncated to the shorter array. Null ELEMENTS contribute
  * 0 to all three accumulators (outside the contract; the composed HOF
  * form would propagate null instead). Numerically identical to the
  * composed form on the shared dense domain (same left-to-right double
  * accumulation per accumulator).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

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
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else x.getDouble(i)
      val yv = if (y.isNullAt(i)) 0.0 else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    // norms must cover the FULL arrays to match ‖a‖·‖b‖ when lengths differ
    i = n
    while (i < x.numElements()) {
      val xv = if (x.isNullAt(i)) 0.0 else x.getDouble(i); na += xv * xv; i += 1
    }
    i = n
    while (i < y.numElements()) {
      val yv = if (y.isNullAt(i)) 0.0 else y.getDouble(i); nb += yv * yv; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $x.isNullAt($i) ? 0.0 : $x.getDouble($i);
         |  double $yv = $y.isNullAt($i) ? 0.0 : $y.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |for (int $i = $n; $i < $x.numElements(); $i++) {
         |  double $xv = $x.isNullAt($i) ? 0.0 : $x.getDouble($i); $na += $xv * $xv;
         |}
         |for (int $i = $n; $i < $y.numElements(); $i++) {
         |  double $yv = $y.isNullAt($i) ? 0.0 : $y.getDouble($i); $nb += $yv * $yv;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
         |  : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
