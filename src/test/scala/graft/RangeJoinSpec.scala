package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned join equals the naive theta join on random data") {
    val rnd = new scala.util.Random(9)
    val pts = (0 until 400).map(i => (i.toLong, rnd.nextDouble() * 100))
      .toDF("pid", "p")
    val ivs = (0 until 40).map { i =>
      val lo = rnd.nextDouble() * 95
      (i.toLong, lo, lo + rnd.nextDouble() * 10)
    }.toDF("iid", "lo", "hi")
    val got = RangeJoin.binned(pts, "p", ivs, "lo", "hi", binWidth = 7.3)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = pts.join(ivs, $"p" >= $"lo" && $"p" < $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("float boundary regression: point whose bin index rounds past " +
       "ceil(hi/w)-1 still matches (interval replicated through floor(hi/w))") {
    // constructed so hi sits one ulp ABOVE k*w yet hi/w rounds DOWN to
    // exactly k=4501: the old ceil(hi/w)-1 replication stopped at bin
    // 4500 while the in-range point p = k*w lands in bin 4501
    val w = 19.818156655897212
    val hi = 89201.52310819336
    val p = 89201.523108193345
    assert(p < hi && math.floor(p / w) == 4501 && math.ceil(hi / w) - 1 == 4500)
    val pts = Seq((1L, p)).toDF("pid", "p")
    val ivs = Seq((1L, 0.0, hi)).toDF("iid", "lo", "hi")
    val got = RangeJoin.binned(pts, "p", ivs, "lo", "hi", binWidth = w)
      .select("pid").collect()
    assert(got.length == 1, "true match must not be dropped by bin rounding")
  }

  test("grid-aligned exclusive upper bound stays exclusive") {
    val pts = Seq((1L, 64.0), (2L, 63.999)).toDF("pid", "p")
    val ivs = Seq((1L, 0.0, 64.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.binned(pts, "p", ivs, "lo", "hi", binWidth = 64.0)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L)) // p=64.0 is outside [0, 64)
  }
}
