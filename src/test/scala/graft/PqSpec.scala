package graft

import graft.ops.Ann
import org.apache.spark.sql.functions._

/** Ground-truth checks for the product-quantization family on constructed
  * vectors (independent of the DuckDB oracle): code assignment picks the
  * per-subspace argmax-cosine centroid, and ADC search ranks by the sum
  * of the coded centroids' subspace cosines.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // dim=8, m=4 -> 2-dim subspaces. Centroid 0 points (1,0) in every
  // subspace, centroid 1 points (0,1).
  private def flat(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
  private val c0 = flat(1, 0, 1, 0, 1, 0, 1, 0)
  private val c1 = flat(0, 1, 0, 1, 0, 1, 0, 1)

  test("pqCodes: per-subspace argmax with deterministic tie-break") {
    val vecs = Seq(
      (10L, flat(5, 1, 1, 5, 9, 0, 0.5, 0.6)), // -> codes 0,1,0,1
      (11L, flat(1, 1, 1, 1, 1, 1, 1, 1))      // equidistant -> ties to centroid 0
    ).toDF("vec_id", "embedding")
    val codebook = Seq((0L, c0), (1L, c1)).toDF("centroid_id", "embedding")
    val codes = Ann.pqCodes(vecs, codebook, m = 4, dim = 8)
      .orderBy("vec_id").collect()
    assert(codes(0).toSeq == Seq(10L, 0L, 1L, 0L, 1L))
    assert(codes(1).toSeq == Seq(11L, 0L, 0L, 0L, 0L))
  }

  test("pqAdcTopK: ranks by summed subspace cosine of the CODED vectors") {
    // all corpus vectors decode exactly to a codebook combination, so the
    // ADC score is computable by hand: #subspaces where the code's
    // centroid aligns with the query's subvector direction
    val vecs = Seq(
      (20L, flat(1, 0, 1, 0, 1, 0, 1, 0)), // codes all-0: score 4 vs query c0
      (21L, flat(1, 0, 1, 0, 1, 0, 0, 1)), // 3×c0 + 1×c1: score 3
      (22L, flat(0, 1, 0, 1, 0, 1, 0, 1))  // all-1: score 0
    ).toDF("vec_id", "embedding")
    val codebook = Seq((0L, c0), (1L, c1)).toDF("centroid_id", "embedding")
    val query = Seq(Tuple1(c0)).toDF("qv")
    val top = Ann.pqAdcTopK(Ann.pqCodes(vecs, codebook, m = 4, dim = 8),
        codebook, query, k = 3, m = 4, dim = 8)
      .collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(20L, 21L, 22L))
    assert(top.map(_.getDouble(1)).toSeq == Seq(4.0, 3.0, 0.0))
  }
}
