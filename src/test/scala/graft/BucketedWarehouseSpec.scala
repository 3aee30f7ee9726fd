package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

class BucketedWarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables equi-join with no shuffle") {
    val wh = new Warehouse(spark, WarehouseOptions(database = "bwh"))
    val facts = (1L to 1000L).map(i => (i % 100, i, i * 1.5)).toDF("k", "fact_id", "v")
    val dims = (0L until 100L).map(i => (i, s"dim-$i")).toDF("k", "label")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      wh.saveBucketed(facts, "b_facts", Seq("k"), numBuckets = 8)
      wh.saveBucketed(dims, "b_dims", Seq("k"), numBuckets = 8)

      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      val plan = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000L)
      assert(joined.where(col("k") === 7).count() == 10L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }
}
