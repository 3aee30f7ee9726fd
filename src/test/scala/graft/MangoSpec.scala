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

  test("Column compiler and document evaluator agree on every selector") {
    import graft.ops.Mango
    import com.fasterxml.jackson.databind.ObjectMapper
    val mapper = new ObjectMapper()
    val docs = Seq(
      """{"id":"a","age":10,"verified":true,"colour":"red"}""",
      """{"id":"b","age":20,"verified":false,"colour":"blue"}""",
      """{"id":"c","age":30,"verified":true,"colour":"green"}""",
      """{"id":"d","age":40,"verified":false,"colour":"red"}""",
      """{"id":"e","verified":true,"colour":"red"}""" // missing age
    )
    val selectors = Seq(
      """{"colour":"red"}""",
      """{"age":{"$gt":15}}""",
      """{"age":{"$gte":20,"$lt":40}}""",
      """{"verified":{"$ne":true}}""",
      """{"$or":[{"colour":"blue"},{"age":{"$gte":40}}]}""",
      """{"colour":{"$in":["red","green"]},"verified":true}""",
      """{"age":{"$exists":false}}""",
      """{"colour":{"$regex":"^(r|g)"}}""",
      """{"$nor":[{"colour":"red"},{"colour":"blue"}]}"""
    )
    val df = spark.read.json(
      { import spark.implicits._; docs.toDS() })
    selectors.foreach { sel =>
      val viaColumn = df.where(Mango.compile(sel))
        .select("id").collect().map(_.getString(0)).toSet
      val parsed = Mango.parse(sel)
      val viaDoc = docs.map(mapper.readTree)
        .filter(Mango.evalDoc(parsed, _))
        .map(_.get("id").asText).toSet
      assert(viaColumn == viaDoc, s"selector $sel: column=$viaColumn doc=$viaDoc")
    }
  }
}
