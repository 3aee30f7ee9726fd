package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass dims-bucketed codepoint histogram: character at position
  * `i` (1-based) accumulates its codepoint into dim `(i-1) % dims` — the
  * fake-decode feature layout of [[graft.ops.Multimodal]] computed
  * without materializing a per-character array.
  *
  * Replaces `posexplode(transform(sequence(1, length(text)), i ->
  * ascii(substr(text, i, 1)))) … groupBy(doc, pos % dims) … sum` — one
  * array allocation + explode + aggregate per character — with one fused
  * loop per row, emitting `min(dims, length)` sums directly.
  * Bit-identical to the exploded form for all BMP text (the spec checks
  * ASCII, Latin-1, and CJK): both count code points there. OFF the BMP
  * they intentionally diverge — `length`/`substr` count UTF-16 units, so
  * the exploded form splits a surrogate pair into two garbage units,
  * while this loop counts the real code point once (the more correct
  * reading; the fixture corpus is ASCII either way). Same
  * dims-with-no-characters omission for short texts (the array is
  * truncated, so `posexplode` yields exactly the dims the exploded
  * formulation produced). Integer sums — order-free, exact.
  */
case class ByteHistogram(child: Expression, dims: Int)
    extends UnaryExpression {

  require(dims >= 1, "dims must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"byte_histogram expects a string column, got ${child.dataType.sql}")

  override def prettyName: String = "byte_histogram"

  override def nullSafeEval(input: Any): Any =
    ByteHistogram.compute(input.asInstanceOf[UTF8String], dims)

  // real codegen (static-helper call) so the surrounding projection stays
  // inside whole-stage codegen — CodegenFallback would break the stage
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ByteHistogram.compute($c, $dims)")

  override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
    copy(child = newChild)
}

object ByteHistogram {
  def apply(text: Column, dims: Int = 8): Column =
    GraftSqlBridge.column(ByteHistogram(GraftSqlBridge.expression(text), dims))

  /** The fused histogram loop — called from both eval and generated code
    * (the Scala object compiles to a static forwarder).
    */
  def compute(input: UTF8String, dims: Int): ArrayData = {
    val s = input.toString
    val sums = new Array[Long](dims)
    var i = 0  // UTF-16 char index
    var cp = 0 // codepoint position
    while (i < s.length) {
      val c = s.codePointAt(i)
      sums(cp % dims) += c
      i += Character.charCount(c)
      cp += 1
    }
    // dims beyond the text length never saw a character; the exploded
    // formulation emits no row for them, so truncate rather than pad
    new GenericArrayData(if (cp >= dims) sums else sums.take(cp))
  }
}
