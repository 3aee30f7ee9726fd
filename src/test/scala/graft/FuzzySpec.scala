package graft

import graft.ops.Fuzzy
import org.apache.spark.sql.functions._

/** [[graft.ops.Fuzzy.editDistanceJoin]] — exact-recall contract: the
  * symmetric-delete blocked join must equal brute-force all-pairs
  * Levenshtein at every supported radius.
  */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private lazy val names = Seq(
    1L -> "martha stewart",
    2L -> "marta stewart",    // d=1 deletion of 1
    3L -> "martha stewartt",  // d=1 insertion on 1
    4L -> "marsha stewart",   // d=1 substitution on 1
    5L -> "marsha stuart",    // d=2 from 4 (e->empty, wa swap region)
    6L -> "completely different",
    7L -> "martha stewart",   // exact dup of 1
    8L -> "",                 // empty-string edge
    9L -> "a",
    10L -> "b")               // d=1 from 9 and from 8
    .toDF("id", "s")

  private def brute(maxDist: Int): Set[(Long, Long, Int)] = {
    val rows = names.collect().map(r => (r.getLong(0), r.getString(1)))
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      d = {
        // reference DP — independent of the production levenshtein
        val m = Array.tabulate(sa.length + 1, sb.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0
        }
        for (i <- 1 to sa.length; j <- 1 to sb.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (sa(i - 1) == sb(j - 1)) 0 else 1))
        m(sa.length)(sb.length)
      }
      if d <= maxDist
    } yield (ia, ib, d)).toSet
  }

  private def run(maxDist: Int): Set[(Long, Long, Int)] =
    Fuzzy.editDistanceJoin(names, maxDist = maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("editDistanceJoin d=1 equals brute-force all-pairs") {
    val got = run(1)
    assert(got == brute(1), s"got $got, want ${brute(1)}")
    assert(got.contains((1L, 7L, 0)))   // exact dup found
    assert(got.contains((9L, 10L, 1)))  // single-char substitution
    assert(got.contains((8L, 9L, 1)))   // empty vs 1-char
  }

  test("editDistanceJoin d=2 equals brute-force all-pairs") {
    val got = run(2)
    assert(got == brute(2), s"got $got, want ${brute(2)}")
    assert(got.exists(p => p._1 == 4L && p._2 == 5L && p._3 == 2))
  }

  test("deletionVariants counts and contents") {
    val v1 = names.where($"id" === 9)
      .select(Fuzzy.deletionVariants($"s", 1)).as[Seq[String]].head()
    assert(v1 == Seq("a", ""))
    val v2 = names.where($"id" === 1)
      .select(array_distinct(Fuzzy.deletionVariants($"s", 2)))
      .as[Seq[String]].head()
    val s = "martha stewart"
    // 1 original + |distinct 1-del| + |distinct 2-del|, all length >= 12
    assert(v2.contains(s) && v2.forall(_.length >= s.length - 2))
    assert(v2.size > s.length) // the 2-deletion neighborhood is present
  }

  test("no false positives survive the verify filter") {
    // "ab" and "ba" share deletion variants ("a" and "b") but have
    // Levenshtein distance 2 — at d=1 the verify step must drop the pair
    val df = Seq(1L -> "ab", 2L -> "ba").toDF("id", "s")
    assert(Fuzzy.editDistanceJoin(df, maxDist = 1).count() == 0)
    val d2 = Fuzzy.editDistanceJoin(df, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(d2 == Set((1L, 2L, 2)))
  }
}
