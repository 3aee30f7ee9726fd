package graft

import graft.ops.FixedPlan

class FixedPlanSpec extends SparkSpec {
  private val Key = "spark.sql.adaptive.enabled"

  test("withAqeOff disables adaptivity inside the window and restores the prior value") {
    spark.conf.set(Key, "true")
    FixedPlan.withAqeOff(spark) {
      assert(spark.conf.get(Key) == "false")
    }
    assert(spark.conf.get(Key) == "true")
  }

  test("restore is exception-safe") {
    spark.conf.set(Key, "true")
    intercept[RuntimeException] {
      FixedPlan.withAqeOff(spark) { throw new RuntimeException("boom") }
    }
    assert(spark.conf.get(Key) == "true")
  }

  test("hitsPpm leaves the session's adaptivity setting untouched") {
    import spark.implicits._
    spark.conf.set(Key, "true")
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    graft.ops.Graph.hitsPpm(edges, 2).collect()
    assert(spark.conf.get(Key) == "true")
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }
}
