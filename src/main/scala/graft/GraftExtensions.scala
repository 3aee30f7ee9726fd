package graft

import graft.functions.{BottomKDistinct, ByteHistogram, CosineSimilarity,
  CountMinEstimate, CountMinSketchAgg, DiversityStats, MinHashSignature,
  NormalizeText, RepetitionStats, SimHashSignature, SparkTypeOf, Sum128}
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

  /** Uniform arity guard: every builder below indexes `children`, so a
    * wrong argument count must surface as a clear message, never an
    * IndexOutOfBoundsException from inside the registry.
    */
  private def arity(name: String, usage: String, min: Int, max: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      if (children.length < min || children.length > max)
        throw new IllegalArgumentException(
          s"$name($usage) takes ${if (min == max) s"$min" else s"$min to $max"} " +
            s"argument(s), got ${children.length}")
      build(children)
    }

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(
        classOf[CosineSimilarity].getCanonicalName, null, "cosine_similarity"),
      arity("cosine_similarity", "a, b", 2, 2)(c => CosineSimilarity(c(0), c(1)))))
    extensions.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(
        classOf[MinHashSignature].getCanonicalName, null, "minhash_signature"),
      arity("minhash_signature", "text[, numHashes[, shingleSize]]", 1, 3)(c =>
        MinHashSignature(c.head,
          numHashes = intArg(c, 1, 4), shingleSize = intArg(c, 2, 3)))))
    extensions.injectFunction((
      new FunctionIdentifier("simhash"),
      new ExpressionInfo(
        classOf[SimHashSignature].getCanonicalName, null, "simhash"),
      arity("simhash", "text[, bits]", 1, 2)(c =>
        SimHashSignature(c.head, bits = intArg(c, 1, 16)))))
    extensions.injectFunction((
      new FunctionIdentifier("byte_histogram"),
      new ExpressionInfo(
        classOf[ByteHistogram].getCanonicalName, null, "byte_histogram"),
      arity("byte_histogram", "text[, dims]", 1, 2)(c =>
        ByteHistogram(c.head, dims = intArg(c, 1, 8)))))
    extensions.injectFunction((
      new FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(
        classOf[RepetitionStats].getCanonicalName, null, "repetition_stats"),
      arity("repetition_stats", "tokens", 1, 1)(c => RepetitionStats(c.head))))
    extensions.injectFunction((
      new FunctionIdentifier("type_of"),
      new ExpressionInfo(
        classOf[SparkTypeOf].getCanonicalName, null, "type_of"),
      arity("type_of", "value", 1, 1)(c => SparkTypeOf(c.head))))
    // aggregates: the analyzer wraps a returned AggregateFunction in an
    // AggregateExpression, exactly as for built-in registry entries
    extensions.injectFunction((
      new FunctionIdentifier("bottom_k_distinct"),
      new ExpressionInfo(
        classOf[BottomKDistinct].getCanonicalName, null, "bottom_k_distinct"),
      arity("bottom_k_distinct", "value[, k]", 1, 2)(c =>
        BottomKDistinct(c.head, k = intArg(c, 1, 64)))))
    extensions.injectFunction((
      new FunctionIdentifier("sum128"),
      new ExpressionInfo(
        classOf[Sum128].getCanonicalName, null, "sum128"),
      arity("sum128", "value[, scale]", 1, 2)(c =>
        Sum128(c.head, scale = intArg(c, 1, 4)))))
    extensions.injectFunction((
      new FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(
        classOf[CountMinSketchAgg].getCanonicalName, null, "cms_sketch"),
      arity("cms_sketch", "value[, depth[, width]]", 1, 3)(c =>
        CountMinSketchAgg(c.head,
          depth = intArg(c, 1, 4), width = intArg(c, 2, 2048)))))
    extensions.injectFunction((
      new FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(
        classOf[CountMinEstimate].getCanonicalName, null, "cms_estimate"),
      arity("cms_estimate", "sketch, key", 2, 2)(c => CountMinEstimate(c(0), c(1)))))
    extensions.injectFunction((
      new FunctionIdentifier("normalize_text"),
      new ExpressionInfo(
        classOf[NormalizeText].getCanonicalName, null, "normalize_text"),
      arity("normalize_text", "text[, form]", 1, 2)(c =>
        NormalizeText(c.head, form = strArg(c, 1, "NFC")))))
    extensions.injectFunction((
      new FunctionIdentifier("diversity_stats"),
      new ExpressionInfo(
        classOf[DiversityStats].getCanonicalName, null, "diversity_stats"),
      arity("diversity_stats", "tokens", 1, 1)(c => DiversityStats(c.head))))
  }

  /** Optional string-literal argument (e.g. `normalize_text(t, 'NFKC')`). */
  private def strArg(children: Seq[Expression], i: Int, default: String): String =
    if (children.length <= i) default
    else children(i) match {
      case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
      case other => throw new IllegalArgumentException(
        s"argument ${i + 1} must be a string literal, got $other")
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
