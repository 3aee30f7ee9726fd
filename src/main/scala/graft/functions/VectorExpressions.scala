package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector hot path.
  *
  * [[CosineSimilarity]] computes cosine(a, b) over two `array<float>`
  * columns in ONE fused primitive loop with full whole-stage codegen — no
  * lambda-function interpretation, no per-element boxing, no Decimal
  * allocation. This is the 100 TB kernel; the order-independent decimal
  * variant ([[Similarity.cosineExact]]) exists only for cross-engine
  * oracle reproducibility.
  *
  * Null/shape semantics: null if either side is null; 0.0 when lengths
  * differ or either norm is zero (defensive — embedding tables should be
  * fixed-dimension).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects two array<float> arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    CosineSimilarity.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.CosineSimilarity.compute($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Shared primitive kernel (called from both interpreted and generated
    * code): one pass, three accumulators, no allocation.
    */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    if (n != y.numElements()) return 0.0
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** Column API. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSimilarity(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Register as SQL function `cosine_similarity` (same arity error
    * behavior as the [[graft.GraftExtensions]] registration — a raw
    * `exprs(1)` would surface wrong arity as IndexOutOfBounds from
    * inside the registry).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"cosine_similarity(a, b) takes 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs(0), exprs(1))
      },
      "built-in")
}
