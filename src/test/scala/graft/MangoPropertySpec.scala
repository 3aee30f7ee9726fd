package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.ops.Mango
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property: for ANY generated selector and document set, the Column
  * compiler (over a JSON-inferred DataFrame) and the document-side
  * evaluator (used by the DSv2 reader) select the same documents.
  */
class MangoPropertySpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private def check(n: Int)(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // documents over a small closed field space so selectors actually hit
  private val docGen: Gen[String] = for {
    age <- Gen.option(Gen.choose(0, 99))
    colour <- Gen.option(Gen.oneOf("red", "green", "blue"))
    verified <- Gen.option(Gen.oneOf(true, false))
    id <- Gen.uuid
  } yield {
    val fields = Seq(Some(s""""id":"$id""""),
      age.map(a => s""""age":$a"""),
      colour.map(c => s""""colour":"$c""""),
      verified.map(v => s""""verified":$v""")).flatten
    fields.mkString("{", ",", "}")
  }

  private val cmpOpGen: Gen[String] =
    Gen.oneOf("$eq", "$ne", "$gt", "$gte", "$lt", "$lte")

  private def fieldCondGen: Gen[String] = Gen.oneOf(
    for { op <- cmpOpGen; v <- Gen.choose(0, 99) } yield s""""age":{"$op":$v}""",
    for { op <- Gen.oneOf("$eq", "$ne"); v <- Gen.oneOf("red", "green", "blue") }
      yield s""""colour":{"$op":"$v"}""",
    Gen.oneOf(true, false).map(b => s""""verified":{"$$eq":$b}"""),
    Gen.oneOf(true, false).map(b => s""""age":{"$$exists":$b}"""),
    Gen.someOf(Seq("red", "green")).map(vs =>
      s""""colour":{"$$in":[${vs.map("\"" + _ + "\"").mkString(",")}]}"""),
    // $beginsWith over a value space with shared prefixes ("g"/"gr"/"b"
    // hit, "x" misses, "" matches everything present)
    Gen.oneOf("r", "g", "gr", "b", "x", "").map(p =>
      s""""colour":{"$$beginsWith":"$p"}"""))

  private def selectorGen(depth: Int): Gen[String] =
    if (depth <= 0) fieldCondGen.map(c => s"{$c}")
    else Gen.frequency(
      3 -> fieldCondGen.map(c => s"{$c}"),
      1 -> (for { a <- selectorGen(depth - 1); b <- selectorGen(depth - 1) }
        yield s"""{"$$and":[$a,$b]}"""),
      1 -> (for { a <- selectorGen(depth - 1); b <- selectorGen(depth - 1) }
        yield s"""{"$$or":[$a,$b]}"""),
      1 -> (for { a <- selectorGen(depth - 1) } yield s"""{"$$nor":[$a]}"""))

  test("Column compiler == document evaluator for random selectors/docs") {
    import spark.implicits._
    val gen = for {
      docs <- Gen.listOfN(30, docGen)
      sel <- selectorGen(2)
    } yield (docs, sel)

    check(60)(Prop.forAll(gen) { case (docs, sel) =>
      val df = spark.read.json(docs.toDS())
      val available = df.columns.toSet
      // selectors referencing fields absent from EVERY doc can't compile
      // column-side (unresolved column) — CouchDB treats them as never
      // matching; skip those cases
      val referenced = Seq("age", "colour", "verified").filter(sel.contains)
      if (!referenced.forall(available.contains)) true
      else {
        val viaColumn = df.where(Mango.compile(sel))
          .select("id").collect().map(_.getString(0)).toSet
        val parsed = Mango.parse(sel)
        val viaDoc = docs.map(mapper.readTree)
          .filter(Mango.evalDoc(parsed, _))
          .map(_.get("id").asText).toSet
        viaColumn == viaDoc
      }
    })
  }

  // ---------------------------------------------------------- array space

  // warehouse storage form (§1.2): the document's JSON array lands in the
  // DataFrame as ONE stringified column; the evaluator sees the parsed doc
  private val elemGen: Gen[String] = Gen.oneOf("x", "y", "z")
  private val arrayDocGen: Gen[(String, String)] = for {
    id <- Gen.uuid.map(_.toString)
    tags <- Gen.listOf(elemGen).map(_.take(4))
    qtys <- Gen.listOf(Gen.choose(0, 9)).map(_.take(4))
  } yield {
    val items = qtys.map(q => s"""{"q":$q}""").mkString("[", ",", "]")
    val tj = tags.map("\"" + _ + "\"").mkString("[", ",", "]")
    (s"""{"id":"$id","tags":$tj,"items":$items}""", id)
  }

  private val arrayCondGen: Gen[String] = Gen.oneOf(
    Gen.choose(0, 4).map(n => s""""tags":{"$$size":$n}"""),
    Gen.someOf(Seq("x", "y")).map(vs =>
      s""""tags":{"$$all":[${vs.map("\"" + _ + "\"").mkString(",")}]}"""),
    elemGen.map(v => s""""tags":{"$$elemMatch":{"$$eq":"$v"}}"""),
    elemGen.map(v => s""""tags":{"$$allMatch":{"$$eq":"$v"}}"""),
    Gen.choose(0, 9).map(n => s""""items":{"$$elemMatch":{"q":{"$$gte":$n}}}"""),
    Gen.choose(0, 9).map(n => s""""items":{"$$allMatch":{"q":{"$$gte":$n}}}"""),
    Gen.choose(0, 9).map(n =>
      s""""items":{"$$not":{"$$elemMatch":{"q":{"$$gt":$n}}}}"""))

  test("Column compiler == document evaluator over stringified arrays " +
       "($size/$all/$elemMatch/$allMatch, scalar and object elements)") {
    import spark.implicits._
    val gen = for {
      docs <- Gen.listOfN(25, arrayDocGen)
      cond <- arrayCondGen
    } yield (docs, s"{$cond}")

    check(80)(Prop.forAll(gen) { case (docs, sel) =>
      // DataFrame side: arrays stored as JSON text (the flattener's form)
      val rows = docs.map { case (doc, id) =>
        val n = mapper.readTree(doc)
        (id, n.get("tags").toString, n.get("items").toString)
      }
      val df = rows.toDF("id", "tags", "items")
      val viaColumn = df.where(Mango.compile(sel))
        .select("id").collect().map(_.getString(0)).toSet
      val parsed = Mango.parse(sel)
      val viaDoc = docs.filter { case (doc, _) =>
        Mango.evalDoc(parsed, mapper.readTree(doc))
      }.map(_._2).toSet
      viaColumn == viaDoc
    })
  }
}
