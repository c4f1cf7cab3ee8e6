package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoder

/** Array-column math built from codegen'd built-ins (`zip_with`, `aggregate`,
  * `transform`, `exp`) — no Scala UDFs on the hot path (SURVEY.md §2.9).
  *
  * The reference does these on dense torch tensors: rowwise dot
  * `model.py:76` (F9), sigmoid `model.py:79` (F10), feature concat
  * `convert_to_graph.py:32` (U3).
  */
object ArrayOps {

  /** Rowwise dot product of two array columns with double accumulation,
    * left-to-right (deterministic): F9, `model.py:76`. Backed by the
    * codegen [[graft.functions.expressions.DotProduct]] Expression — a
    * primitive loop in whole-stage codegen instead of interpreted
    * `zip_with`/`aggregate` lambdas. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge
    GraftExpressionBridge.column(expressions.DotProduct(
      GraftExpressionBridge.expression(a.cast("array<double>")),
      GraftExpressionBridge.expression(b.cast("array<double>"))))
  }

  /** The pure-builtin formulation of [[dot]] (kept as the semantic
    * reference; the spec asserts equivalence with the codegen path).
    * The equivalence contract is scoped to DENSE arrays (no null
    * elements): a null element here propagates to a null result
    * (`null * x → null` under zip_with), whereas the codegen [[dot]]
    * skips the pair — see the DotProduct scaladoc. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity; 0 when either vector is all-zero. Fused codegen
    * expression — one pass over the arrays for all three accumulators
    * instead of the three passes the composed form costs. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge
    GraftExpressionBridge.column(expressions.CosineSimilarity(
      GraftExpressionBridge.expression(a.cast("array<double>")),
      GraftExpressionBridge.expression(b.cast("array<double>"))))
  }

  /** Composed-form cosine (kept as the semantic reference for the spec). */
  def cosineComposed(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = sqrt(normSq(a))
    val nb = sqrt(normSq(b))
    when(na === 0 || nb === 0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** Logistic sigmoid — Spark has `exp` but no builtin sigmoid (F10,
    * `model.py:79`). */
  def sigmoid(c: Column): Column = lit(1.0) / (lit(1.0) + exp(-c))

  /** L2-normalise an array column (zero vectors pass through unchanged).
    * Frozen structural embeddings (degree propagation) are unbounded, so
    * dot scores saturate sigmoid at 1.0 and the ranking collapses to the
    * tiebreak; normalising makes dot ≡ cosine and keeps scores in a
    * discriminative range. */
  def l2normalize(a: Column): Column = {
    val n = sqrt(normSq(a))
    when(n === 0, a).otherwise(transform(a, x => x / n))
  }

  /** Elementwise sum of two equal-length arrays. */
  def vecAdd(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)

  /** Elementwise (Hadamard) product — the link-prediction edge feature
    * (SURVEY.md §7.4: LR over Hadamard of endpoint embeddings). Codegen
    * primitive loop; per-element values are the same IEEE multiplies as
    * the HOF form on dense arrays (ArrayOpsSpec), so hash-exact consumers
    * (q43) are unaffected. */
  def hadamard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge
    GraftExpressionBridge.column(expressions.Hadamard(
      GraftExpressionBridge.expression(a.cast("array<double>")),
      GraftExpressionBridge.expression(b.cast("array<double>"))))
  }

  /** The pure-builtin formulation of [[hadamard]] (semantic reference;
    * ArrayOpsSpec asserts parity on dense arrays). */
  def hadamardHof(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x * y)

  /** Scale an array column by a scalar column. */
  def vecScale(a: Column, s: Column): Column = transform(a, x => x * s)

  /** Fused propagation combine `(a[i] + b[i]) / (1 + nTypes)` — the
    * cross-type round update (A7/G12) as a codegen primitive loop instead
    * of an interpreted `zip_with` lambda. Dense-array contract; see
    * [[graft.functions.expressions.VecCombine]]. */
  def combineMean(a: Column, b: Column, nTypes: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge
    GraftExpressionBridge.column(expressions.VecCombine(
      GraftExpressionBridge.expression(a.cast("array<double>")),
      GraftExpressionBridge.expression(b.cast("array<double>")),
      GraftExpressionBridge.expression(nTypes.cast("long"))))
  }

  /** The pure-builtin formulation of [[combineMean]] (semantic reference;
    * ArrayOpsSpec asserts equivalence on dense arrays). */
  def combineMeanHof(a: Column, b: Column, nTypes: Column): Column =
    zip_with(a, b, (x, y) => (x + y) / (lit(1L) + nTypes))

  private implicit val vecEnc: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()

  /** Elementwise-sum aggregation over `array<double>` — the neighbor
    * aggregation primitive (A7, `model.py:92-94`, `to_hetero(aggr='sum')`).
    * A mutable-buffer `Aggregator` keeps per-group state O(dim) instead of
    * `collect_list`'s O(group size) (SURVEY.md §4.1, §7.3). Nulls are
    * skipped; an all-null/empty group yields null. Addition order within a
    * group is partition-dependent — callers needing hash-exact results must
    * aggregate integer-valued features (SURVEY.md §7.4 hard part 2).
    */
  val vecSumAgg: UserDefinedFunction = udaf(
    new Aggregator[Array[Double], Array[Double], Array[Double]] {
      def zero: Array[Double] = Array.empty
      def reduce(buf: Array[Double], v: Array[Double]): Array[Double] =
        if (v == null) buf
        else if (buf.isEmpty) v.clone()
        else { var i = 0; while (i < buf.length) { buf(i) += v(i); i += 1 }; buf }
      def merge(a: Array[Double], b: Array[Double]): Array[Double] =
        if (a.isEmpty) b else reduce(a, b)
      def finish(buf: Array[Double]): Array[Double] =
        if (buf.isEmpty) null else buf
      def bufferEncoder: Encoder[Array[Double]] = vecEnc
      def outputEncoder: Encoder[Array[Double]] = vecEnc
    })

  private implicit val vecLongEnc: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  /** [[vecSumAgg]] over `array<bigint>` — LONG element sums stay exact at
    * any group size (a double accumulator loses integer exactness past
    * 2⁵³, which a 100 TB corpus × 10⁶-scaled features reaches), making
    * integer fixed-point centroid/mean updates hash-exact. Same O(dim)
    * buffer and null/empty contract as the double form. */
  val vecSumLongAgg: UserDefinedFunction = udaf(
    new Aggregator[Array[Long], Array[Long], Array[Long]] {
      def zero: Array[Long] = Array.empty
      def reduce(buf: Array[Long], v: Array[Long]): Array[Long] =
        if (v == null) buf
        else if (buf.isEmpty) v.clone()
        else { var i = 0; while (i < buf.length) { buf(i) += v(i); i += 1 }; buf }
      def merge(a: Array[Long], b: Array[Long]): Array[Long] =
        if (a.isEmpty) b else reduce(a, b)
      def finish(buf: Array[Long]): Array[Long] =
        if (buf.isEmpty) null else buf
      def bufferEncoder: Encoder[Array[Long]] = vecLongEnc
      def outputEncoder: Encoder[Array[Long]] = vecLongEnc
    })
}
