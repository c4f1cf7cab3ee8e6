package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-isomorphic long image of a double: the IEEE-754 bit pattern with
  * the standard sign fold `bits XOR ((bits >> 63) AND Long.MaxValue)` —
  * signed-long order of the image equals the double sort order (−∞ … −0.0
  * just below +0.0 … +∞, NaN greatest, matching Spark's ordering). The
  * map is a bijection, so a selected image converts back to exactly the
  * original value (`Double.longBitsToDouble` after the inverse fold).
  *
  * Exists for [[graft.ext.Stats.quantilesDiscSelect]]: distributed exact
  * selection needs integer interval arithmetic over the value domain, and
  * this puts float/double columns into that domain without rounding. */
case class DoubleSortableBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_double_sortable_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double argument, got $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val bits = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
    bits ^ ((bits >> 63) & Long.MaxValue)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"""(java.lang.Double.doubleToLongBits($v) ^
         | ((java.lang.Double.doubleToLongBits($v) >> 63) & Long.MAX_VALUE))"""
        .stripMargin.replace("\n", ""))

  override protected def withNewChildInternal(
      newChild: Expression): DoubleSortableBits = copy(child = newChild)
}
