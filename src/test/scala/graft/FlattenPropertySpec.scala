package graft

import graft.model.SchemaDiscovery
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for schema discovery / flattening (SURVEY §5 test plan:
  * "flattened column set == JSON leaf paths").
  */
class FlattenPropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property under ScalaTest. */
  private def check(n: Int)(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // --- generator for random nested documents --------------------------

  private val keyGen: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private def leafGen: Gen[(String, Any)] = Gen.oneOf(
    Gen.alphaNumStr.map(s => ("s", s.take(12))),
    Gen.choose(-1e6, 1e6).map(d => ("n", math.rint(d * 100) / 100)),
    Gen.oneOf(true, false).map(b => ("b", b)),
    Gen.listOf(Gen.choose(0, 99)).map(l => ("a", l.take(4))))

  private def docGen(depth: Int): Gen[Map[String, Any]] =
    Gen.choose(1, 4).flatMap { n =>
      Gen.listOfN(n, for {
        k <- keyGen
        v <- if (depth <= 0) leafGen.map(_._2)
             else Gen.frequency(
               4 -> leafGen.map(_._2),
               1 -> docGen(depth - 1))
      } yield k -> v).map(_.toMap)
    }

  private def toJson(v: Any): String = v match {
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]]
        .map { case (k, x) => "\"" + k + "\":" + toJson(x) }.mkString("{", ",", "}")
    case s: String  => "\"" + s + "\""
    case l: List[_] => l.map(toJson).mkString("[", ",", "]")
    case other      => other.toString
  }

  /** Expected flattened leaf names: depth-first doc order, underscore
    * paths, arrays as leaves.
    */
  private def leafPaths(m: Map[String, Any], prefix: Seq[String]): Seq[String] =
    m.toSeq.flatMap {
      case (k, mm: Map[_, _]) =>
        leafPaths(mm.asInstanceOf[Map[String, Any]], prefix :+ k)
      case (k, _) => Seq((prefix :+ k).mkString("_"))
    }

  test("discovered column set == JSON leaf paths (plus id/rev)") {
    check(200)(Prop.forAll(docGen(2)) { doc0 =>
      val doc = doc0 ++ Map("_id" -> "x", "_rev" -> "1-r")
      val json = toJson(doc)
      val schema = SchemaDiscovery.discover(json)
      val expected =
        (leafPaths(doc0, Nil) ++ Seq("id", "rev")).toSet
      schema.leaves.map(_.name).toSet == expected
    })
  }

  test("3-type invariant: every leaf is string/number/boolean") {
    check(100)(Prop.forAll(docGen(2)) { doc0 =>
      val schema = SchemaDiscovery.discover(toJson(doc0))
      val types = SchemaDiscovery.logicalTypes(schema).values.toSet
      types.subsetOf(Set("string", "number", "boolean"))
    })
  }

  test("discovery is idempotent on the flattened shape") {
    check(100)(Prop.forAll(docGen(2)) { doc0 =>
      val s1 = SchemaDiscovery.discover(toJson(doc0))
      // a document that is already flat discovers to itself
      val flatDoc = s1.leaves.map { l =>
        val v = l.dataType match {
          case org.apache.spark.sql.types.DoubleType  => "1.5"
          case org.apache.spark.sql.types.BooleanType => "true"
          case _ => "\"v\""
        }
        "\"" + l.name + "\":" + v
      }.mkString("{", ",", "}")
      val s2 = SchemaDiscovery.discover(flatDoc)
      s2.leaves.map(_.name) == s1.leaves.map(_.name)
    })
  }
}
