package graft

import org.apache.spark.sql.DataFrame

/** Fixture for the CLI `--transform` e2e: the reference README's transform
  * example (combine fields into one, trim whitespace, delete a field —
  * `README.md:177-196`) as a reflectively-loadable
  * [[graft.ops.Transform.Hook]] Scala object.
  */
/** Negative fixture: a Function1 of the WRONG type — loadHook must reject
  * it up front instead of deferring to a mid-pipeline ClassCastException.
  */
object CliBadTransform extends (String => String) {
  def apply(s: String): String = s
}

/** Negative fixture: right parameter, WRONG return type — also rejected. */
object CliWrongReturnTransform extends (DataFrame => Long) {
  def apply(df: DataFrame): Long = 0L
}

object CliTestTransform extends (DataFrame => DataFrame) {

  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def apply(df: DataFrame): DataFrame =
    graft.ops.Transform.jsonDocTransform { doc =>
      if (doc == null) null // deleted changes carry no doc
      else mapper.readTree(doc) match {
        case o: com.fasterxml.jackson.databind.node.ObjectNode =>
          // combine name+age into one field, trimmed — then drop the source
          o.put("label", o.path("name").asText("").trim + " (" + o.path("age").asLong(0) + ")")
          o.remove("description")
          mapper.writeValueAsString(o)
        case _ => doc
      }
    }(df)
}
