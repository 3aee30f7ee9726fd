package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min frequency sketch (Cormode/Muthukrishnan, "An improved data
  * stream summary: the count-min sketch and its applications", J.
  * Algorithms 2005) as a native aggregate: `depth` hash rows of `width`
  * counters; a value increments one counter per row; the point estimate
  * is the minimum over rows. Never underestimates; overestimates by more
  * than `e/width · N` with probability at most `e^-depth`.
  *
  * Scale shape: the buffer is a fixed `depth × width` long array per
  * partial — independent of input size — so a 100 TB scan moves only
  * `numPartitions × depth × width` longs to the single merge point, the
  * same bounded-state story as [[BottomKDistinct]]. Hashes are splitmix64
  * with per-row seeds: deterministic and engine-reproducible.
  *
  * The sketch is returned as `array<bigint>` laid out
  * `[depth, width, counters…]` so [[CountMinEstimate]] can re-derive the
  * hash rows when probing.
  */
case class CountMinSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, "depth must be in [1, 16]")
  require(width >= 2, "width must be >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_min_sketch_agg expects a bigint column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CountMin.add(buf, depth, width, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Long](2 + buf.length)
    out(0) = depth.toLong
    out(1) = width.toLong
    System.arraycopy(buf, 0, out, 2, buf.length)
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinSketchAgg =
    copy(child = newChild)
}

object CountMinSketchAgg {
  /** Aggregate Column: the count-min sketch of `c` (bigint) as
    * `array<bigint>` `[depth, width, counters…]`.
    */
  def apply(c: Column, depth: Int, width: Int): Column =
    GraftSqlBridge.column(
      CountMinSketchAgg(GraftSqlBridge.expression(c), depth, width)
        .toAggregateExpression())
}

/** Point-estimate probe of a [[CountMinSketchAgg]] sketch: the minimum
  * counter across hash rows for `key` — the CMS upper-biased frequency
  * estimate. Null sketch or key → null.
  */
case class CountMinEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "count_min_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"count_min_estimate expects (array<bigint>, bigint), got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(sketch: Any, key: Any): Any =
    CountMin.estimate(sketch.asInstanceOf[ArrayData], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, k) =>
      s"${ev.value} = graft.functions.CountMin.estimate($s, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)
}

object CountMinEstimate {
  /** Column API: estimated frequency of `key` in `sketch`. */
  def apply(sketch: Column, key: Column): Column =
    GraftSqlBridge.column(CountMinEstimate(
      GraftSqlBridge.expression(sketch), GraftSqlBridge.expression(key)))
}

object CountMin {
  /** splitmix64 — the standard 64-bit finalizer; per-row seeds make the
    * `depth` hash functions pairwise independent enough for CMS bounds.
    */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def bucket(key: Long, row: Int, width: Int): Int = {
    val h = mix(key ^ (row.toLong * 0xA24BAED4963EE407L))
    // floorMod: h can be negative
    ((h % width + width) % width).toInt
  }

  def add(buf: Array[Long], depth: Int, width: Int, key: Long): Unit = {
    var d = 0
    while (d < depth) { buf(d * width + bucket(key, d, width)) += 1; d += 1 }
  }

  /** Called from both interpreted and generated code. */
  def estimate(sketch: ArrayData, key: Long): Long = {
    val depth = sketch.getLong(0).toInt
    val width = sketch.getLong(1).toInt
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = sketch.getLong(2 + d * width + bucket(key, d, width))
      if (c < best) best = c
      d += 1
    }
    best
  }

  /** Plain-array twin of [[estimate]] for driver-side sketch consumers
    * (same `[depth, width, counters…]` layout).
    */
  def estimate(sketch: Array[Long], key: Long): Long =
    estimate(new org.apache.spark.sql.catalyst.util.GenericArrayData(sketch), key)
}
