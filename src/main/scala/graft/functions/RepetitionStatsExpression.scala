package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass repetition statistics over a token array:
  * `struct<w, d, maxc, nbg>` = (token count, distinct-token count, highest
  * single-bigram occurrence count, total bigram occurrences — w-1 for a
  * null-free array; null elements break the bigram chain and count
  * toward neither).
  *
  * The relational formulation of the Gopher repetition filters explodes
  * one row per bigram and aggregates twice on (doc_id, bigram) — a
  * shuffle whose volume is the whole tokenized corpus. Every statistic is
  * a per-document property, so this computes all four in one fused loop
  * per row (hash map of bigram counts, set of distinct tokens) and
  * nothing but 4 longs per document ever leaves the map side. Exact
  * integer outputs — bit-identical to the exploded form, which the spec
  * asserts on the real corpus.
  *
  * State per row is bounded by that row's token count (the map holds at
  * most w-1 entries), the per-document analogue of a bucket-local join —
  * no document's statistics ever depend on another's.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("w", LongType, nullable = false),
    StructField("d", LongType, nullable = false),
    StructField("maxc", LongType, nullable = false),
    StructField("nbg", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects array<string>, got ${other.sql}")
  }

  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[ArrayData])

  // real codegen (static-helper call) keeps the projection inside
  // whole-stage codegen — CodegenFallback would break the stage
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RepetitionStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  def apply(tokens: Column): Column =
    GraftSqlBridge.column(RepetitionStats(GraftSqlBridge.expression(tokens)))

  /** The fused statistics loop — called from both eval and generated code
    * (the Scala object compiles to a static forwarder).
    */
  def compute(arr: ArrayData): InternalRow = {
    val w = arr.numElements()
    val distinct = new java.util.HashSet[UTF8String](Math.max(16, w * 2))
    var maxc = 0L
    var nbg = 0L // actual bigram count: w-1 minus chain breaks at nulls
    if (w > 0) {
      // token strings materialized once; bigram keys join on a space,
      // unambiguous because tokens never contain whitespace
      val counts = new java.util.HashMap[String, Array[Long]](Math.max(16, w * 2))
      var prev: String = null
      var i = 0
      while (i < w) {
        val t = arr.getUTF8String(i)
        if (t == null) prev = null // null element: breaks the bigram chain
        else {
          distinct.add(t)
          val s = t.toString
          if (prev != null) {
            val c = counts.computeIfAbsent(prev + " " + s, _ => new Array[Long](1))
            c(0) += 1
            nbg += 1
            if (c(0) > maxc) maxc = c(0)
          }
          prev = s
        }
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](w.toLong, distinct.size.toLong, maxc, nbg))
  }
}
