package graft

import graft.model.SchemaDiscovery
import graft.ops.Flatten
import org.apache.spark.sql.types._

/** Unit tests mirroring reference `test/flatten.js` and `test/schema.js`
  * semantics (field-by-field asserts on a person-style doc).
  */
class FlattenSchemaSpec extends SparkSpec {

  // Same shape as the reference's person fixtures (test/samplechanges.txt):
  // top-level scalars, a tags array, and a nested address with a nested
  // location object.
  val doc: String =
    """{"_id":"abc123","_rev":"1-deadbeef","name":"Ada","age":38,
      |"verified":true,"nickname":null,
      |"tags":["a","b"],
      |"address":{"street":"1 Main St","location":{"long":-1.5,"lat":53.2}}}"""
      .stripMargin.replace("\n", "")

  test("schema discovery: 3-type system, first-doc order, _id/_rev rename") {
    val s = SchemaDiscovery.discover(doc)
    assert(s.leaves.map(_.name) == Seq(
      "name", "age", "verified", "tags", "id", "rev",
      "address_street", "address_location_long", "address_location_lat"))
    assert(SchemaDiscovery.logicalTypes(s) == Map(
      "name" -> "string", "age" -> "number", "verified" -> "boolean",
      "tags" -> "string", // arrays are JSON strings (lib/flatten.js:45)
      "id" -> "string", "rev" -> "string",
      "address_street" -> "string",
      "address_location_long" -> "number",
      "address_location_lat" -> "number"))
  }

  test("null leaf in first doc is dropped from schema (lib/flatten.js:38-42)") {
    val s = SchemaDiscovery.discover(doc)
    assert(!s.leaves.exists(_.name == "nickname"))
  }

  test("flatten: underscore paths, array → JSON string, missing → null") {
    import spark.implicits._
    val s = SchemaDiscovery.discover(doc)
    // second doc misses 'age' and the nested location → NULLs
    val doc2 = """{"_id":"xyz","_rev":"1-1","name":"Bob","verified":false,"tags":[1,2],"address":{"street":"2 High St"}}"""
    val df = Seq(doc, doc2).toDF("doc")
    val flat = Flatten(df, s)
    assert(flat.columns.toSeq == s.leaves.map(_.name))
    val rows = flat.orderBy("id").collect()
    val r1 = rows(0) // abc123
    assert(r1.getString(flat.columns.indexOf("name")) == "Ada")
    assert(r1.getDouble(flat.columns.indexOf("age")) == 38.0)
    assert(r1.getBoolean(flat.columns.indexOf("verified")))
    assert(r1.getString(flat.columns.indexOf("tags")) == """["a","b"]""")
    assert(r1.getString(flat.columns.indexOf("address_street")) == "1 Main St")
    assert(r1.getDouble(flat.columns.indexOf("address_location_lat")) == 53.2)
    val r2 = rows(1) // xyz
    assert(r2.isNullAt(flat.columns.indexOf("age")))
    assert(r2.isNullAt(flat.columns.indexOf("address_location_long")))
    // integer array keeps integer JSON form (JSON.stringify parity)
    assert(r2.getString(flat.columns.indexOf("tags")) == "[1,2]")
  }

  test("flat schema maps to Spark types") {
    val s = SchemaDiscovery.discover(doc)
    val m = s.flatSchema.fields.map(f => f.name -> f.dataType).toMap
    assert(m("age") == DoubleType)
    assert(m("verified") == BooleanType)
    assert(m("tags") == StringType)
  }
}
