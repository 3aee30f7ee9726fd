package graft

import graft.ops.Profile
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  val df = Seq(
    (1L, Some("alpha"), Some(10)),
    (2L, Some("beta"), None),
    (3L, None, Some(30)),
    (4L, Some("alpha"), Some(10)),
    (5L, None, Some(20))
  ).toDF("id", "name", "score")

  test("profile reports rows, nulls, distinct, extremes per column") {
    val p = Profile.profile(df, Seq("id", "name", "score"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(p("id") == ((5L, 0L, 5L, "1", "5")))
    assert(p("name") == ((5L, 2L, 2L, "alpha", "beta")))
    assert(p("score") == ((5L, 1L, 3L, "10", "30")))
  }

  test("profile keeps caller column order") {
    val names = Profile.profile(df, Seq("score", "id"))
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("score", "id"))
  }

  test("approxProfile matches exact on everything but distinct, which stays in bound") {
    val exact = Profile.profile(df, Seq("id", "name", "score"))
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = Profile.approxProfile(df, Seq("id", "name", "score"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet)
    for ((c, a) <- approx) {
      val e = exact(c)
      assert(a.getLong(1) == e.getLong(1), s"$c n_rows")
      assert(a.getLong(2) == e.getLong(2), s"$c n_nulls")
      assert(a.getString(4) == e.getString(4), s"$c min")
      assert(a.getString(5) == e.getString(5), s"$c max")
      // HLL++ at rsd 0.02 on single-digit cardinalities is exact in practice;
      // allow a generous bound anyway
      assert(math.abs(a.getLong(3) - e.getLong(3)) <= 1, s"$c n_distinct")
    }
  }

  test("approxProfile is a single job over one scan") {
    // all stats for all columns collapse into one aggregate: the physical
    // plan contains exactly one scan of the input
    val plan = Profile.approxProfile(df, Seq("id", "name", "score"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), plan)
  }
}
