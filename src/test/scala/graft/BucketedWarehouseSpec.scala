package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

class BucketedWarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("export round-trips a warehouse table through csv and jsonl") {
    val wh = new Warehouse(spark, WarehouseOptions(database = "exp"))
    (1L to 50L).map(i => (i, s"n$i", i * 1.5)).toDF("id", "name", "v")
      .createOrReplaceTempView("exp_t")
    val dir = Files.createTempDirectory("wh-export")
    wh.export("exp_t", s"$dir/csv", "csv")
    wh.export("exp_t", s"$dir/json", "json")
    wh.export("exp_t", s"$dir/orc", "orc")
    val csv = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/csv")
    val jsonl = spark.read.json(s"$dir/json")
    val orc = spark.read.orc(s"$dir/orc")
    assert(csv.count() == 50 && jsonl.count() == 50 && orc.count() == 50)
    assert(csv.columns.sorted.toSeq == Seq("id", "name", "v"))
    assert(jsonl.where(col("id") === 7).collect()(0).getAs[String]("name") == "n7")
    assert(orc.where(col("id") === 7).collect()(0).getAs[String]("name") == "n7")
    intercept[IllegalArgumentException](wh.export("exp_t", s"$dir/x", "xml"))
  }

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
