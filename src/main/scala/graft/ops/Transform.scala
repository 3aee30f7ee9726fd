package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The user-transform hook (reference A5).
  *
  * The reference lets a user supply an arbitrary JS `doc → doc` function
  * applied to every document before schema discovery and insert
  * (README.md:177-196, `index.js:46-49`) — its entire UDF story.
  *
  * Spark-native: the hook is a `DataFrame => DataFrame`. Because documents
  * enter the pipeline as raw JSON text, transforms are expressed over the
  * *flattened* table (post-schema), which keeps them declarative Column
  * pipelines (codegen'd) rather than opaque row functions. The README's
  * example transforms map to:
  *
  *   - drop a field            → `df.drop("field")`
  *   - trim a field            → `withColumn("f", trim($"f"))`
  *   - combine two fields      → `withColumn("n", concat_ws(" ", $"a", $"b"))`
  *
  * For genuinely imperative doc→doc logic, [[Transform.jsonDocTransform]]
  * maps the raw JSON through a Scala function — the direct analog of the
  * reference hook, at the usual UDF cost (off-codegen), so prefer the
  * Column form.
  */
object Transform {

  type Hook = DataFrame => DataFrame

  val identity: Hook = df => df

  /** Compose hooks left-to-right. */
  def chain(hooks: Hook*): Hook = df => hooks.foldLeft(df)((d, h) => h(d))

  /** Raw doc→doc transform over the JSON text column (pre-schema), for
    * parity with the reference's arbitrary-JS hook. `f` must be a pure
    * total function on the driver-serializable closure.
    */
  def jsonDocTransform(f: String => String, docCol: String = "doc"): Hook = { df =>
    val u = udf(f)
    df.withColumn(docCol, u(col(docCol)))
  }
}
