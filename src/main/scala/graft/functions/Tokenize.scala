package graft.functions

/** The engine-wide tokenization policy, shared by the native signature
  * expressions ([[MinHashSignature]], [[SimHashSignature]]) and mirrored
  * exactly by the DataFrame form ([[TextAnalysis.tokens]]) and the DuckDB
  * oracle SQL:
  *
  *   `string_split(trim(regexp_replace(text, '[ \t\n\f\r]+', ' ', 'g')), ' ')`
  *
  * Three properties pin all three implementations to the same result:
  *
  *   - the whitespace class is EXACTLY `[ \t\n\f\r]` — RE2's `\s` (DuckDB)
  *     excludes `\x0B` (vertical tab) while Java's `\s` and
  *     `String.trim` include it, so neither Java default may be used;
  *   - runs are collapsed BEFORE trimming, so text edged by any whitespace
  *     (not just spaces) produces no empty edge tokens;
  *   - empty or all-whitespace text yields ONE empty token, because
  *     `string_split('', ' ')` is `['']` in both DuckDB and Spark.
  */
object Tokenize {

  @inline def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** Java/Spark regex spelling of the whitespace class (one char). */
  val WsClass = "[ \\t\\n\\f\\r]"

  /** Maximal runs of non-whitespace characters; `[""]` when there are
    * none. Bit-identical to the DataFrame/oracle split formulation above.
    */
  def tokens(text: String): Array[String] = {
    val n = text.length
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < n) {
      while (i < n && isWs(text.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(text.charAt(i))) i += 1
        out += text.substring(start, i)
      }
    }
    if (out.isEmpty) Array("") else out.toArray
  }
}
