package graft

import graft.functions.{CosineSimilarity, Similarity}
import org.apache.spark.sql.functions._

class VectorExpressionSpec extends SparkSpec {
  import spark.implicits._

  lazy val pairs = Seq(
    (Array(1f, 0f, 0f), Array(1f, 0f, 0f), 1.0),
    (Array(1f, 0f, 0f), Array(0f, 1f, 0f), 0.0),
    (Array(1f, 0f, 0f), Array(-1f, 0f, 0f), -1.0),
    (Array(1f, 2f, 3f), Array(4f, 5f, 6f),
      (4.0 + 10 + 18) / (math.sqrt(1.0 + 4 + 9) * math.sqrt(16.0 + 25 + 36)))
  ).toDF("a", "b", "expect")

  test("native cosine_similarity matches closed-form values") {
    pairs.select(CosineSimilarity($"a", $"b").as("got"), $"expect").collect()
      .foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("null and shape edge cases") {
    val df = Seq(
      (Some(Array(1f, 2f)), None: Option[Array[Float]]),
      (Some(Array(1f, 2f)), Some(Array(1f, 2f, 3f))), // length mismatch
      (Some(Array(0f, 0f)), Some(Array(1f, 2f)))      // zero norm
    ).toDF("a", "b")
    val got = df.select(CosineSimilarity($"a", $"b")).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getDouble(0) == 0.0)
    assert(got(2).getDouble(0) == 0.0)
  }

  test("SQL registration: cosine_similarity usable from spark.sql") {
    CosineSimilarity.register(spark)
    val one = spark.sql(
      "SELECT cosine_similarity(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS c")
      .collect()(0).getDouble(0)
    assert(one == 1.0)
  }

  test("native kernel agrees with exact decimal kernel on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where($"vec_id" === 0).select($"embedding".as("qv"))
    val both = e.crossJoin(broadcast(q)).select(
      Similarity.cosineExact($"embedding", $"qv").as("exact"),
      CosineSimilarity($"embedding", $"qv").as("fast")).collect()
    both.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6))
  }

  test("codegen path is active (no fallback)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where($"vec_id" === 0).select($"embedding".as("qv"))
    val df = e.crossJoin(broadcast(q))
      .select(CosineSimilarity($"embedding", $"qv").as("c"))
    df.collect() // AQE only finalizes (and annotates codegen) after execution
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen span
    assert("""\*\(\d+\) Project \[cosine_similarity""".r.findFirstIn(plan).isDefined, plan)
  }
}
