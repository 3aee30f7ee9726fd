package graft

import graft.functions.{BottomKDistinct, ByteHistogram, CosineSimilarity,
  CountMinEstimate, CountMinSketchAgg, MinHashSignature, RepetitionStats,
  SimHashSignature, SparkTypeOf, Sum128}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Spark session extensions for the graft engine: registers the native
  * functions so plain `spark.sql` users get them without touching the
  * Scala API.
  *
  * Activate with either:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *   // or, config-only (e.g. spark-submit):
  *   --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * This is the full extension surface the engine needs: no custom
  * analyzer/optimizer rules or planner strategies are required — every
  * operator lowers to Catalyst built-ins plus these expressions
  * (SURVEY §4's conclusion, held through round 1).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(
        classOf[CosineSimilarity].getCanonicalName, null, "cosine_similarity"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    extensions.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(
        classOf[MinHashSignature].getCanonicalName, null, "minhash_signature"),
      (children: Seq[Expression]) => MinHashSignature(children.head,
        numHashes = intArg(children, 1, 4), shingleSize = intArg(children, 2, 3))))
    extensions.injectFunction((
      new FunctionIdentifier("simhash"),
      new ExpressionInfo(
        classOf[SimHashSignature].getCanonicalName, null, "simhash"),
      (children: Seq[Expression]) => SimHashSignature(children.head,
        bits = intArg(children, 1, 16))))
    extensions.injectFunction((
      new FunctionIdentifier("byte_histogram"),
      new ExpressionInfo(
        classOf[ByteHistogram].getCanonicalName, null, "byte_histogram"),
      (children: Seq[Expression]) => ByteHistogram(children.head,
        dims = intArg(children, 1, 8))))
    extensions.injectFunction((
      new FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(
        classOf[RepetitionStats].getCanonicalName, null, "repetition_stats"),
      (children: Seq[Expression]) => RepetitionStats(children.head)))
    extensions.injectFunction((
      new FunctionIdentifier("type_of"),
      new ExpressionInfo(
        classOf[SparkTypeOf].getCanonicalName, null, "type_of"),
      (children: Seq[Expression]) => SparkTypeOf(children.head)))
    // aggregates: the analyzer wraps a returned AggregateFunction in an
    // AggregateExpression, exactly as for built-in registry entries
    extensions.injectFunction((
      new FunctionIdentifier("bottom_k_distinct"),
      new ExpressionInfo(
        classOf[BottomKDistinct].getCanonicalName, null, "bottom_k_distinct"),
      (children: Seq[Expression]) => BottomKDistinct(children.head,
        k = intArg(children, 1, 64))))
    extensions.injectFunction((
      new FunctionIdentifier("sum128"),
      new ExpressionInfo(
        classOf[Sum128].getCanonicalName, null, "sum128"),
      (children: Seq[Expression]) => Sum128(children.head,
        scale = intArg(children, 1, 4))))
    extensions.injectFunction((
      new FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(
        classOf[CountMinSketchAgg].getCanonicalName, null, "cms_sketch"),
      (children: Seq[Expression]) => CountMinSketchAgg(children.head,
        depth = intArg(children, 1, 4), width = intArg(children, 2, 2048))))
    extensions.injectFunction((
      new FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(
        classOf[CountMinEstimate].getCanonicalName, null, "cms_estimate"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"cms_estimate(sketch, key) takes 2 arguments, got ${children.length}")
        CountMinEstimate(children(0), children(1))
      }))
  }

  /** Optional integer-literal argument (e.g. `simhash(text, 16)`). */
  private def intArg(children: Seq[Expression], i: Int, default: Int): Int =
    if (children.length <= i) default
    else children(i) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"argument ${i + 1} must be an integer literal, got $other")
    }
}
