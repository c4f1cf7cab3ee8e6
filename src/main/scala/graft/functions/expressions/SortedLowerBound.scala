package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Count of elements in a SORTED `array<long>` strictly below `v` — the
  * histogram-bucket index of `v` for an explicit ascending boundary list,
  * by binary search inside whole-stage codegen.
  *
  * Exists for [[graft.ext.Stats.quantilesDiscSelect]]: its per-pass bucket
  * assignment `size(filter(cuts, c -> c < v))` evaluates the lambda
  * INTERPRETED and linearly, making per-row cost O(fanout) and thereby
  * capping useful fanout (~64); binary search is O(log fanout), which lets
  * the selection run wide (default 1024) and finish in ~6 passes over the
  * full 2⁶⁴ bit domain instead of ~11.
  *
  * CONTRACT: `cuts` is ascending and free of nulls and duplicates (the
  * driver builds it with `.distinct.filter` — see the call site); the
  * result for an unsorted array is unspecified. Null inputs → null.
  */
case class SortedLowerBound(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_sorted_lower_bound"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, bigint), got $l and $r")
    }

  override def nullSafeEval(cutsAny: Any, vAny: Any): Any = {
    val cuts = cutsAny.asInstanceOf[ArrayData]
    val v = vAny.asInstanceOf[Long]
    var lo = 0
    var hi = cuts.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts.getLong(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cuts, v) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $cuts.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($cuts.getLong($mid) < $v) $lo = $mid + 1; else $hi = $mid;
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLowerBound =
    copy(left = newLeft, right = newRight)
}
