package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  val full = (1L to 2000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
  val half = full.where(col("doc_id") <= 1000)

  test("hash sample is a deterministic subset, stable under corpus growth") {
    val sHalf = Sampling.hashSample(half, "doc_id", "1a")
      .select("doc_id").as[Long].collect().toSet
    val sFull = Sampling.hashSample(full, "doc_id", "1a")
      .select("doc_id").as[Long].collect().toSet
    assert(sFull.filter(_ <= 1000L) == sHalf) // growth never reshuffles membership
    val frac = sFull.size.toDouble / 2000
    assert(frac > 0.06 && frac < 0.15, s"~10% expected, got $frac")
  }

  test("split assignment is total, disjoint, and stable under growth") {
    val aHalf = Sampling.assignSplit(half, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val aFull = Sampling.assignSplit(full, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(aFull.size == 2000 && aFull.values.toSet == Set("train", "val", "test"))
    assert(aFull.filter(_._1 <= 1000L) == aHalf)
    val train = aFull.values.count(_ == "train").toDouble / 2000
    assert(train > 0.74 && train < 0.85, s"~80% train expected, got $train")
  }

  test("packSequences bins by exclusive prefix sum within each shard") {
    val docs = Seq(
      ("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 500L), ("a", 4L, 100L),
      ("b", 1L, 600L), ("b", 2L, 10L)
    ).toDF("shard", "id", "n")
    val got = Sampling.packSequences(docs, "shard", "id", "n", budget = 512L)
      .select("shard", "id", "bin")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // shard a prefix sums: 0, 300, 600, 1100 -> bins 0, 0, 1, 2
    // shard b prefix sums: 0, 600           -> bins 0, 1
    assert(got == Map(("a", 1L) -> 0L, ("a", 2L) -> 0L, ("a", 3L) -> 1L,
      ("a", 4L) -> 2L, ("b", 1L) -> 0L, ("b", 2L) -> 1L))
  }

  test("topKPerKey: salted two-stage equals single window on a skewed corpus") {
    import org.apache.spark.sql.expressions.Window
    // hot key carries 90% of rows — the distribution that makes a naive
    // per-key window a single straggler task
    val rows = (0 until 9000).map(i => ("hot", i.toLong)) ++
      (0 until 500).map(i => ("warm", i.toLong)) ++
      Seq(("cold", 1L), ("cold", 2L))
    val df = rows.toDF("key", "id")
    val order = md5($"id".cast("string"))
    val got = Sampling.topKPerKey(df, $"key", order, $"id", k = 7, salts = 8)
      .select("key", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val naive = df
      .withColumn("rn", row_number().over(Window.partitionBy($"key").orderBy(order, $"id")))
      .where($"rn" <= 7).select("key", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == naive)
    assert(got.count(_._1 == "hot") == 7 && got.count(_._1 == "cold") == 2)
  }

  test("mixtureSample keeps each group at its own rate, unlisted at the default") {
    val df = (1L to 3000L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "g")
    val kept = Sampling.mixtureSample(df, "id", "g", Map("a" -> "cc"), default = "1a")
      .select("id", "g").as[(Long, String)].collect()
    val aRate = kept.count(_._2 == "a").toDouble / 1000
    val bRate = kept.count(_._2 == "b").toDouble / 2000
    assert(aRate > 0.72 && aRate < 0.88, s"~80% for group a, got $aRate")
    assert(bRate > 0.06 && bRate < 0.15, s"~10% default, got $bRate")
    // same membership function as hashSample: the default-rate rows are
    // exactly hashSample's picks restricted to group b
    val hs = Sampling.hashSample(df.where($"g" === "b"), "id", "1a")
      .select("id").as[Long].collect().toSet
    assert(kept.filter(_._2 == "b").map(_._1).toSet == hs)
  }

  test("systematicSample: sharded prefix sum equals the exact global rule") {
    // uneven weights; shardSize 64 over ids 0..999 exercises 16 shards,
    // so both the in-shard window and the offset join are on the path
    val ws = (0L until 1000L).map(i => 1L + i * 37 % 100)
    val docs = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "w")
    val got = Sampling.systematicSample(docs, "doc_id", "w", k = 20, shardSize = 64)
      .select("doc_id").as[Long].collect().toSet
    // ground truth: the selection rule evaluated exactly on the driver
    val total = ws.sum; val stride = math.max(total / 20, 1)
    val cums = ws.scanLeft(0L)(_ + _).tail
    val expected = ws.indices
      .filter(i => cums(i) / stride > (cums(i) - ws(i)) / stride)
      .map(_.toLong).toSet
    assert(got == expected)
    // systematic PPS yields floor(total/stride) picks: ~k, one per stride
    assert(got.size >= 20 && got.size <= 21)
    // a row heavier than one stride is always selected
    val giant = docs.withColumn("w", when($"doc_id" === 500L, lit(total)).otherwise($"w"))
    val g = Sampling.systematicSample(giant, "doc_id", "w", k = 20, shardSize = 64)
      .select("doc_id").as[Long].collect().toSet
    assert(g.contains(500L))
  }

  test("systematicSamplePerGroup: an independent exact draw per stratum") {
    def ws(salt: Long): Seq[Long] = (0L until 500L).map(i => 1L + (i * 31 + salt) % 50)
    val rows = Seq("a" -> 7L, "b" -> 13L).flatMap { case (g, salt) =>
      ws(salt).zipWithIndex.map { case (w, i) => (g, i.toLong, w) }
    }
    val got = Sampling.systematicSamplePerGroup(
        rows.toDF("g", "doc_id", "w"), "g", "doc_id", "w", k = 10, shardSize = 64)
      .select("g", "doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    Seq("a" -> 7L, "b" -> 13L).foreach { case (g, salt) =>
      val w = ws(salt)
      val total = w.sum; val stride = math.max(total / 10, 1)
      val cums = w.scanLeft(0L)(_ + _).tail
      val expected = w.indices
        .filter(i => cums(i) / stride > (cums(i) - w(i)) / stride)
        .map(_.toLong).toSet
      assert(got(g) == expected, s"stratum $g diverged")
    }
  }

  test("systematicSample property: random weights/k/shardSize match the global rule") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.choose(1, 300)
      ws <- Gen.listOfN(n, Gen.choose(0L, 1000L)) // includes zero weights
      k <- Gen.choose(1, 40)
      shardSize <- Gen.oneOf(1L, 7L, 64L, 1000L)
    } yield (ws, k, shardSize)
    val prop = Prop.forAll(gen) { case (ws, k, shardSize) =>
      val docs = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "w")
      val got = Sampling.systematicSample(docs, "doc_id", "w", k, shardSize)
        .select("doc_id").as[Long].collect().toSet
      val total = ws.sum; val stride = math.max(total / k, 1)
      val cums = ws.scanLeft(0L)(_ + _).tail
      val expected = ws.indices
        .filter(i => cums(i) / stride > (cums(i) - ws(i)) / stride)
        .map(_.toLong).toSet
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("epochOrderKeys: key order interleaves sources proportionally") {
    import spark.implicits._
    val docs = ((1L to 8L).map(i => (i, "big")) ++ Seq((100L, "small"), (101L, "small")))
      .toDF("doc_id", "source")
    val ordered = graft.ops.Sampling.epochOrderKeys(docs, "source")
      .orderBy("epoch_key", "doc_id")
      .select("source").as[String].collect().toSeq
    // sources occupy evenly spaced fractional positions, so each half of
    // the epoch carries the corpus mix exactly (4 big : 1 small)
    assert(ordered.take(5).count(_ == "big") == 4)
    assert(ordered.drop(5).count(_ == "big") == 4)
    // deterministic across runs (hash order, not physical order)
    val again = graft.ops.Sampling.epochOrderKeys(docs.repartition(7), "source")
      .orderBy("epoch_key", "doc_id")
      .select("doc_id").as[Long].collect().toSeq
    val first = graft.ops.Sampling.epochOrderKeys(docs, "source")
      .orderBy("epoch_key", "doc_id")
      .select("doc_id").as[Long].collect().toSeq
    assert(again == first, "epoch order must not depend on partitioning")
  }

  test("chunkDocuments property: drop-overlap reconstruction equals the original") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.choose(1, 120)
      max <- Gen.choose(1, 30)
      ov <- Gen.choose(0, max - 1)
    } yield (n, max, ov)
    val prop = Prop.forAll(gen) { case (n, max, ov) =>
      val text = (0 until n).map(i => s"t$i").mkString(" ")
      val chunks = graft.ops.Sampling
        .chunkDocuments(Seq((1L, text)).toDF("doc_id", "text"), max, ov)
        .orderBy("chunk_id").select("chunk").as[String].collect().toSeq
      // every non-first chunk repeats exactly `ov` tokens of its
      // predecessor; dropping them stitches the original text back
      val rebuilt = (chunks.head.split(" ").toSeq ++
        chunks.tail.flatMap(_.split(" ").toSeq.drop(ov))).mkString(" ")
      rebuilt == text
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("leakageSafeSplit: cluster members co-assign; singletons match per-doc split") {
    import spark.implicits._
    val docs = (1L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = graft.ops.Sampling.leakageSafeSplit(docs, pairs)
      .select("doc_id", "cluster_id", "split")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // the chained component labels by its min id and co-assigns
    assert(Seq(1L, 2L, 3L).map(got(_)._1).toSet == Set(1L))
    assert(Seq(1L, 2L, 3L).map(got(_)._2).toSet.size == 1,
      "near-dup cluster split across train/test = leakage")
    // docs in no pair are their own cluster and get the plain per-doc split
    val perDoc = graft.ops.Sampling.assignSplit(docs, "doc_id")
      .select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (i <- Seq(4L, 5L, 6L)) {
      assert(got(i)._1 == i)
      assert(got(i)._2 == perDoc(i))
    }
    // cluster members get the CLUSTER representative's split, doc 1's own
    assert(Seq(2L, 3L).map(got(_)._2).toSet == Set(perDoc(1L)))
  }

  test("chunkDocuments: overlap carry, no suffix-duplicate tail, short docs whole") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),      // exactly maxTokens → one chunk
      (2L, "a b c d e f g"),    // one token past → tail chunk carries overlap
      (3L, "x y z")             // short doc → single whole chunk
    ).toDF("doc_id", "text")
    val got = graft.ops.Sampling.chunkDocuments(docs, maxTokens = 6, overlap = 2)
      .as[(Long, Int, String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(c => (c._3, c._4)).toSeq).toMap
    assert(got(1L) == Seq(("a b c d e f", 6)),
      "a start whose tokens the previous chunk fully covered must not be emitted")
    assert(got(2L) == Seq(("a b c d e f", 6), ("e f g", 3)),
      "the tail chunk repeats the overlap tokens then adds the new one")
    assert(got(3L) == Seq(("x y z", 3)))
  }
}
