package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Throwaway: isolate where q_corr's time goes (scan vs decimal agg). */
object CorrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val q = col("l_quantity"); val p = col("l_extendedprice")
    def time(name: String)(f: => Unit): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    time("scan_only") {
      li.select(q, p, col("l_returnflag")).write.mode("overwrite").format("noop").save()
    }
    time("double_sums") {
      li.groupBy("l_returnflag")
        .agg(count(lit(1)), sum(q), sum(p), sum(q * q), sum(p * p), sum(q * p))
        .write.mode("overwrite").format("noop").save()
    }
    time("dec18_sums") {
      li.groupBy("l_returnflag")
        .agg(count(lit(1)),
          sum(q.cast(DecimalType(18, 4))), sum(p.cast(DecimalType(18, 4))))
        .write.mode("overwrite").format("noop").save()
    }
    time("dec38_product_sums") {
      def dL(c: org.apache.spark.sql.Column) = c.cast(DecimalType(20, 4))
      def dR(c: org.apache.spark.sql.Column) = c.cast(DecimalType(17, 4))
      li.groupBy("l_returnflag")
        .agg(sum(dL(q) * dR(q)), sum(dL(p) * dR(p)), sum(dL(q) * dR(p)))
        .write.mode("overwrite").format("noop").save()
    }
    // expected to FAIL at sf0.1 under ANSI: Σ qf·pf ≈ 8e19 > Long.MaxValue
    // — the overflow that makes plain SUM(BIGINT) unusable here and is
    // exactly why Sum128 exists
    try time("long_fixedpoint_sums") {
      val qf = round(q * 10000).cast("long"); val pf = round(p * 10000).cast("long")
      li.groupBy("l_returnflag")
        .agg(sum(qf * qf), sum(pf % 1000000 * pf), sum(qf * pf))
        .write.mode("overwrite").format("noop").save()
    } catch {
      case e: Exception =>
        println(s"long_fixedpoint_sums OVERFLOWED as expected: ${e.getMessage.linesIterator.next()}")
    }
    spark.stop()
  }
}
