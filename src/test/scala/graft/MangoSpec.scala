package graft

import graft.ops.Mango
import graft.ops.Mango.MangoException

class MangoSpec extends SparkSpec {
  import spark.implicits._

  lazy val df = Seq(
    ("a", 10.0, true, "red"),
    ("b", 20.0, false, "blue"),
    ("c", 30.0, true, "green"),
    ("d", 40.0, false, "red")
  ).toDF("id", "age", "verified", "colour")

  def ids(sel: String): Seq[String] =
    df.where(Mango.compile(sel)).select("id").collect().map(_.getString(0)).sorted.toSeq

  test("implicit $eq") { assert(ids("""{"colour":"red"}""") == Seq("a", "d")) }
  test("$gt / $lte") {
    assert(ids("""{"age":{"$gt":20}}""") == Seq("c", "d"))
    assert(ids("""{"age":{"$lte":20}}""") == Seq("a", "b"))
  }
  test("$ne bool") { assert(ids("""{"verified":{"$ne":true}}""") == Seq("b", "d")) }
  test("$and of fields (implicit)") {
    assert(ids("""{"colour":"red","verified":false}""") == Seq("d"))
  }
  test("$or") {
    assert(ids("""{"$or":[{"colour":"blue"},{"age":{"$gte":40}}]}""") == Seq("b", "d"))
  }
  test("$in / $nin") {
    assert(ids("""{"colour":{"$in":["red","blue"]}}""") == Seq("a", "b", "d"))
    assert(ids("""{"colour":{"$nin":["red","blue"]}}""") == Seq("c"))
  }
  test("$regex") { assert(ids("""{"colour":{"$regex":"^(r|g)"}}""") == Seq("a", "c", "d")) }
  test("$exists") { assert(ids("""{"age":{"$exists":true}}""") == Seq("a", "b", "c", "d")) }
  test("range combo $gte+$lt on one field") {
    assert(ids("""{"age":{"$gte":20,"$lt":40}}""") == Seq("b", "c"))
  }
  test("invalid JSON rejected (index.js:202-208)") {
    intercept[MangoException](Mango.compile("{nope"))
  }
  test("nested selector wrapper rejected (index.js:209-214)") {
    intercept[MangoException](Mango.compile("""{"selector":{"a":1}}"""))
  }
}
