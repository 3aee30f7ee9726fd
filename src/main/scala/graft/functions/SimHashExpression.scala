package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass SimHash over a text column: whitespace tokens, ONE md5 per
  * token, bit b votes on hex nibble b (`< '8'` → +1 else −1), signature
  * bit b set when the vote sum is positive. Pure map-side — replaces the
  * token×bit explode + two groupBys in the DataFrame formulation with
  * zero shuffles, bit-identical output (same digests, same vote rule).
  *
  * Bits 32–63 vote on the nibbles of a SECOND digest, `md5("x" + token)`
  * (oracle mirror: `substr(md5(tok) || md5('x' || tok), b+1, 1)`), so a
  * 64-bit signature still costs a constant number of digests per token.
  * For `bits <= 32` output is bit-identical to previous rounds.
  */
case class SimHashSignature(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 64, "bit votes derive from two md5s: max 64 hex nibbles")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash expects a string column, got ${child.dataType.sql}")

  override def prettyName: String = "simhash"

  override def nullSafeEval(input: Any): Any =
    SimHashSignature.compute(input.asInstanceOf[UTF8String], bits)

  // real codegen (static-helper call) keeps the projection inside
  // whole-stage codegen — CodegenFallback would break the stage
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashSignature.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSignature =
    copy(child = newChild)
}

object SimHashSignature {
  def apply(text: Column, bits: Int = 16): Column =
    GraftSqlBridge.column(SimHashSignature(GraftSqlBridge.expression(text), bits))

  /** The fused vote loop — called from both eval and generated code. */
  def compute(input: UTF8String, bits: Int): Long = {
    val text = input.toString
    val toks = Tokenize.tokens(text)
    val votes = new Array[Int](bits)
    val md = Md5Pool.get()
    var i = 0
    while (i < toks.length) {
      md.reset()
      val hex = MinHashSignature.toHex(
        md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      val hex2 = if (bits <= 32) null else {
        md.reset()
        MinHashSignature.toHex(
          md.digest(("x" + toks(i)).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }
      var b = 0
      while (b < bits) {
        val c = if (b < 32) hex.charAt(b) else hex2.charAt(b - 32)
        if (c < '8') votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
