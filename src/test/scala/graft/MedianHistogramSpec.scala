package graft

import org.apache.spark.sql.functions._

/** Edge cases for q_median's histogram-rank formulation that the fixture
  * may not hit: even/odd group sizes, both middle ranks inside ONE
  * histogram bucket (duplicate middle values), and a 2-element group.
  */
class MedianHistogramSpec extends SparkSpec {
  import spark.implicits._

  private def medians(rows: (String, Long, Double)*): Map[String, Double] = {
    val dir = java.nio.file.Files.createTempDirectory("median").toString
    rows.toDF("event_type", "event_id", "value")
      .withColumn("ts", col("event_id")) // schema compat with t()
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    SparkEntry.queries("q_median")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("odd n picks the single middle; even n averages the two middles") {
    val m = medians(
      ("odd", 1L, 1.0), ("odd", 2L, 9.0), ("odd", 3L, 5.0),
      ("even", 1L, 1.0), ("even", 2L, 2.0), ("even", 3L, 10.0), ("even", 4L, 20.0))
    assert(m("odd") == 5.0)
    assert(m("even") == 6.0) // (2+10)/2
  }

  test("duplicate middle values land in one bucket covering both ranks") {
    // even n=4, middles are both 7.0 → one histogram bucket must carry k=2
    val m = medians(
      ("dup", 1L, 1.0), ("dup", 2L, 7.0), ("dup", 3L, 7.0), ("dup", 4L, 9.0))
    assert(m("dup") == 7.0)
    // all-equal group: every rank in one bucket
    val m2 = medians(("flat", 1L, 3.0), ("flat", 2L, 3.0), ("flat", 3L, 3.0))
    assert(m2("flat") == 3.0)
  }

  test("two-element group averages both") {
    val m = medians(("two", 1L, 1.5), ("two", 2L, 2.5))
    assert(m("two") == 2.0)
  }

  test("trimmed mean weights partial buckets at the trim boundaries") {
    val dir = java.nio.file.Files.createTempDirectory("trim").toString
    // n=10, trim = ceil(10/10)=1 each side → kept ranks 2..9. The value
    // 1.0 fills ranks 1..3: its bucket must contribute k=2 (ranks 2,3),
    // NOT 0 or 3. Kept sum = 1+1 + 2+3+4+5+6+7 = 29, /8
    val rows = Seq.tabulate(10) { i =>
      val v = if (i < 3) 1.0 else (i - 1).toDouble // 1,1,1,2,3,4,5,6,7,8
      ("g", (i + 1).toLong, v)
    }
    rows.toDF("event_type", "event_id", "value")
      .withColumn("ts", col("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_trimmed_mean")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("g") == 29.0 / 8)
  }
}
