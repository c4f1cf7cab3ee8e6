package graft.functions

import graft.functions.expressions.DotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hookpoint: registers the engine's custom
  * expressions as SQL functions, so `spark.sql("SELECT graft_dot(a, b)")`
  * works alongside the Column API. Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)` on the session builder —
  * [[register]] is the imperative alternative for sessions built
  * elsewhere (e.g. a test harness handing us its own SparkSession).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
  }
}

object GraftExtensions {
  private val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_dot(arrayA, arrayB)")
      DotProduct(children.head, children(1))
    })

  /** Imperatively register the functions on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      dotFunction._1, dotFunction._2, dotFunction._3)
}
