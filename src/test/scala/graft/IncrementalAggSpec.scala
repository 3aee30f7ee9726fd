package graft

import graft.streaming.IncrementalAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  // one CDC version: (id, group, value, deleted)
  type Version = (Long, String, Double, Boolean)

  private def df(rows: Seq[(Long, String, Double)]): DataFrame =
    rows.toDF("id", "grp", "value")

  test("maintained aggregate tracks inserts, updates, group moves, deletes, re-inserts") {
    // the driver-side mirror of the live row state, used to build each
    // batch's oldRows (in production: a bucket-pruned id lookup in the
    // StreamIngest state table)
    var live = Map.empty[Long, (String, Double)]
    var agg = IncrementalAgg.empty(df(Seq.empty), "grp")

    def applyBatch(batch: Seq[Version]): Unit = {
      val olds = df(batch.map(_._1).distinct.flatMap(id =>
        live.get(id).map { case (g, v) => (id, g, v) }))
      val news = df(batch.filter(!_._4).map { case (id, g, v, _) => (id, g, v) })
      agg = IncrementalAgg.merge(agg,
        IncrementalAgg.delta(olds, news, "grp", "value"), "grp")
        .localCheckpoint() // cut the growing lineage like a real pipeline
      batch.foreach { case (id, g, v, del) =>
        live = if (del) live - id else live + (id -> (g, v))
      }
    }

    def check(): Unit = {
      val got = IncrementalAgg.finish(agg, "grp")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val truth = IncrementalAgg.recompute(
          df(live.toSeq.map { case (id, (g, v)) => (id, g, v) }), "grp", "value")
      val want = IncrementalAgg.finish(truth, "grp")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want)
    }

    applyBatch(Seq((1L, "a", 10.5, false), (2L, "a", 1.25, false),
      (3L, "b", 3.0, false), (4L, "b", 4.0, false), (5L, "c", 0.01, false)))
    check()
    // update value, MOVE id 2 across groups, delete id 3
    applyBatch(Seq((1L, "a", 11.5, false), (2L, "b", 1.25, false),
      (3L, "b", 0.0, true)))
    check()
    // re-insert id 3, empty group c entirely, fresh insert id 7
    applyBatch(Seq((3L, "a", 7.75, false), (5L, "c", 0.0, true),
      (7L, "d", 2.5, false)))
    check()
    // group c must be GONE from the maintained table, not a zero row
    assert(!agg.select("grp").as[String].collect().contains("c"))
  }

  test("delta of an empty batch is empty; merge with it is identity") {
    val agg = IncrementalAgg.merge(
      IncrementalAgg.empty(df(Seq.empty), "grp"),
      IncrementalAgg.delta(df(Seq.empty), df(Seq((1L, "a", 2.0))), "grp", "value"),
      "grp")
    val d = IncrementalAgg.delta(df(Seq.empty), df(Seq.empty), "grp", "value")
    assert(d.count() == 0)
    val merged = IncrementalAgg.merge(agg, d, "grp")
    assert(merged.collect().toSet == agg.collect().toSet)
  }
}
