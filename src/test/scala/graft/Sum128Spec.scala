package graft

import graft.functions.Sum128
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

class Sum128Spec extends SparkSpec {
  import spark.implicits._

  test("matches wide-decimal sum on cents-scale products") {
    val df = Seq.tabulate(10000)(i => (i % 7, (i % 997).toLong * 31 + 1, (i % 101).toLong * 997 + 7))
      .toDF("g", "a", "b")
    val fast = df.groupBy("g").agg(Sum128($"a" * $"b", 8).as("s"))
    // reference: wide-decimal sum of the same unscaled products, point
    // placed by exact decimal division
    val expect = df.groupBy("g")
      .agg((sum(($"a" * $"b").cast(DecimalType(38, 8))) / 100000000)
        .cast(DecimalType(38, 8)).as("s"))
    val got = fast.collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    val want = expect.collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (g, v) => assert(v.compareTo(want(g)) == 0, s"group $g: $v vs ${want(g)}") }
  }

  test("sums past Long.MaxValue without overflow") {
    // 8192 rows of 2^60: sum = 2^73, far beyond Long range
    val df = Seq.fill(8192)(1L << 60).toDF("x")
    val got = df.agg(Sum128($"x", 0)).collect()(0).getDecimal(0)
    assert(got.toBigInteger == java.math.BigInteger.valueOf(1L << 60)
      .multiply(java.math.BigInteger.valueOf(8192)))
  }

  test("negative values and a negative total") {
    val df = Seq(5L, -9L, 3L, -12L, Long.MinValue / 4, Long.MinValue / 4).toDF("x")
    val got = df.agg(Sum128($"x", 0)).collect()(0).getDecimal(0)
    val want = java.math.BigInteger.valueOf(5L - 9 + 3 - 12)
      .add(java.math.BigInteger.valueOf(Long.MinValue / 4).multiply(java.math.BigInteger.TWO))
    assert(got.toBigInteger == want)
  }

  test("NULLs are skipped; scale places the point") {
    val df = Seq(Some(12345L), None, Some(55L)).toDF("x")
    val got = df.agg(Sum128($"x", 3)).collect()(0).getDecimal(0)
    assert(got == new java.math.BigDecimal("12.400"))
  }

  test("merge across many partitions is exact") {
    val df = spark.range(0, 200000, 1, 32)
      .select((col("id") * col("id")).as("x")) // Σ i² known closed form
    val got = df.agg(Sum128($"x", 0)).collect()(0).getDecimal(0)
    val n = java.math.BigInteger.valueOf(199999)
    val want = n.multiply(n.add(java.math.BigInteger.ONE))
      .multiply(n.multiply(java.math.BigInteger.TWO).add(java.math.BigInteger.ONE))
      .divide(java.math.BigInteger.valueOf(6))
    assert(got.toBigInteger == want)
  }

  test("whole pipeline compiles under CODEGEN_ONLY") {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = Seq((1, 10L), (1, 20L), (2, 30L)).toDF("g", "x")
      val got = df.groupBy("g").agg(Sum128($"x" * $"x", 2).as("s"))
        .orderBy("g").collect()
      assert(got(0).getDecimal(1) == new java.math.BigDecimal("5.00"))
      assert(got(1).getDecimal(1) == new java.math.BigDecimal("9.00"))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("rejects non-bigint input") {
    val err = intercept[Exception] {
      Seq(1.5).toDF("x").agg(Sum128($"x", 2)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("bigint"))
  }
}
