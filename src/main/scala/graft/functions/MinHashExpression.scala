package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature over a text column: whitespace-normalized
  * word `shingleSize`-shingles, ONE md5 per shingle, the k hash functions
  * are disjoint 8-hex-char slices of the digest, and the per-function
  * minimum is tracked inline. Returns `array<string>` of k slices (null
  * when the document has fewer than `shingleSize` tokens).
  *
  * This replaces the explode→groupBy formulation in [[graft.ops.Dedup]]
  * for the signature step: a pure map-side expression — no generator, no
  * shuffle, no 50-100 intermediate rows per document. Bit-identical output
  * to the exploded form (same tokenization, same digests, same
  * lexicographic mins), so the DuckDB oracles are unchanged.
  *
  * Codegen emits a static-helper call (the digest work itself cannot be
  * improved by codegen, but a real doGenCode keeps the surrounding
  * projection inside whole-stage codegen, which CodegenFallback would
  * break out of).
  */
case class MinHashSignature(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression {

  require(numHashes >= 1 && numHashes <= 4, "1..4 x 32-bit slices of one md5")
  require(shingleSize >= 1, s"shingleSize must be >= 1, got $shingleSize")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // NOT inherited from the child: a doc with fewer than `shingleSize`
  // tokens yields null even when the input column is non-nullable
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects a string column, got ${child.dataType.sql}")

  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[UTF8String], numHashes, shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.MinHashSignature.compute(
      |  $c, $numHashes, $shingleSize);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Per-thread MD5 instance shared by the hashing expressions: a
  * per-ROW `MessageDigest.getInstance` pays a synchronized JCA provider
  * lookup plus an allocation on the corpus-scan hot path. Callers must
  * `reset()` before each digest (both loops already do).
  */
private[functions] object Md5Pool {
  private val tl = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  def get(): java.security.MessageDigest = { val m = tl.get(); m.reset(); m }
}

object MinHashSignature {
  private val hexDigits = "0123456789abcdef".toCharArray

  /** The fused signature loop — called from both eval and generated code.
    * Returns null when the document has fewer than `shingleSize` tokens.
    */
  def compute(input: UTF8String, numHashes: Int, shingleSize: Int): ArrayData = {
    val text = input.toString
    val toks = Tokenize.tokens(text)
    if (toks.length < shingleSize) return null
    val md = Md5Pool.get()
    val mins = Array.fill[String](numHashes)(null)
    var i = 0
    while (i + shingleSize <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < shingleSize) { sb.append(' ').append(toks(i + j)); j += 1 }
      md.reset()
      val digest = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = toHex(digest)
      var h = 0
      while (h < numHashes) {
        val slice = hex.substring(h * 8, h * 8 + 8)
        if (mins(h) == null || slice.compareTo(mins(h)) < 0) mins(h) = slice
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_)))
  }

  private[functions] def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(2 * i) = hexDigits(b >>> 4)
      out(2 * i + 1) = hexDigits(b & 0xf)
      i += 1
    }
    new String(out)
  }

  def apply(text: Column, numHashes: Int = 4, shingleSize: Int = 3): Column =
    GraftSqlBridge.column(
      MinHashSignature(GraftSqlBridge.expression(text), numHashes, shingleSize))
}
