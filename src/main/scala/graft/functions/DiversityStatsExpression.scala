package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Single-pass lexical-diversity statistics over a token array:
  * `struct<w, d, c2>` = (non-null token count, distinct-token count, sum of
  * squared per-token occurrence counts). From these the two standard
  * diversity measures are single exact divisions: type-token ratio `d/w`
  * and the Gini–Simpson index `(w² − c2)/w²` — the probability two tokens
  * drawn without replacement differ. Both stay engine-exact (one correctly
  * rounded division of exact integers), unlike Shannon entropy whose
  * per-engine libm `log` bits differ.
  *
  * The relational formulation explodes one row per token and aggregates
  * twice on (doc_id, token) — a shuffle of the whole tokenized corpus.
  * Every statistic is a per-document property, so this computes all three
  * in one fused loop per row (hash map of token counts; `c2` maintained
  * incrementally as `c2 += 2c − 1` when a token's count reaches `c`) and
  * nothing but 3 longs per document ever leaves the map side. Exact
  * integers — bit-identical to the exploded form, which the spec asserts
  * on the real corpus.
  *
  * Null elements are skipped entirely (tokenizers never emit them; the
  * oracle token lists are null-free).
  */
case class DiversityStats(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("w", LongType, nullable = false),
    StructField("d", LongType, nullable = false),
    StructField("c2", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"diversity_stats expects array<string>, got ${other.sql}")
  }

  override def prettyName: String = "diversity_stats"

  override def nullSafeEval(input: Any): Any =
    DiversityStats.compute(input.asInstanceOf[ArrayData])

  // real codegen (static-helper call) keeps the projection inside
  // whole-stage codegen — CodegenFallback would break the stage
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DiversityStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DiversityStats =
    copy(child = newChild)
}

object DiversityStats {
  def apply(tokens: Column): Column =
    GraftSqlBridge.column(DiversityStats(GraftSqlBridge.expression(tokens)))

  /** The fused statistics loop — called from both eval and generated code
    * (the Scala object compiles to a static forwarder).
    */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var w = 0L
    var c2 = 0L
    val counts = new java.util.HashMap[String, Array[Long]](Math.max(16, n * 2))
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        w += 1
        val c = counts.computeIfAbsent(t.toString, _ => new Array[Long](1))
        c(0) += 1
        c2 += 2 * c(0) - 1 // c² − (c−1)²
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](w, counts.size.toLong, c2))
  }
}
