package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  test("withExtensions exposes cosine_similarity to pure-SQL sessions") {
    // builds a second session over the shared context (never stop() it —
    // that would kill the context for every other suite in this JVM);
    // restore the previous default session afterwards
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    // getOrCreate returns an existing active/default session and silently
    // IGNORES withExtensions — clear both so a fresh session (sharing the
    // context) is built with the graft function registry
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val c = spark.sql(
        """SELECT cosine_similarity(
             array(CAST(3 AS FLOAT), CAST(0 AS FLOAT)),
             array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS c""")
        .collect()(0).getDouble(0)
      assert(c == 1.0)
      val described = spark.sql("DESCRIBE FUNCTION cosine_similarity")
        .collect().map(_.getString(0)).mkString("\n")
      assert(described.contains("cosine_similarity"))

      // the signature expressions are SQL-reachable too, with optional
      // integer-literal parameters
      val sh = spark.sql("SELECT simhash('a b c') AS s, simhash('a b c', 8) AS s8")
        .collect()(0)
      assert(sh.getLong(0) >= 0 && sh.getLong(1) < 256)
      val mh = spark.sql("SELECT minhash_signature('a b c d e') AS m").collect()(0)
      assert(mh.getSeq[String](0).length == 4)
      assert(spark.sql("SELECT minhash_signature('a b') AS m").collect()(0).isNullAt(0))

      // round-6 registrations: the remaining custom scalars and aggregates
      val bh = spark.sql("SELECT byte_histogram('ab', 2) AS h").collect()(0)
        .getSeq[Long](0)
      assert(bh == Seq(97L, 98L)) // position-bucketed byte-value sums
      val rs = spark.sql("SELECT repetition_stats(split('a a b', ' ')) AS r")
        .collect()(0).getStruct(0)
      assert(rs.getLong(0) == 3L, "token count")
      assert(spark.sql("SELECT type_of(map('k', 1)) AS t").collect()(0)
        .getString(0).startsWith("map"))
      val bk = spark.sql(
        "SELECT bottom_k_distinct(CAST(x AS BIGINT), 2) AS b FROM VALUES (5),(1),(9),(1) t(x)")
        .collect()(0).getSeq[Long](0)
      assert(bk == Seq(1L, 5L))
      val s128 = spark.sql(
        "SELECT sum128(CAST(x AS BIGINT), 0) AS s FROM VALUES (1),(2),(3) t(x)")
        .collect()(0).getDecimal(0)
      assert(s128.longValueExact() == 6L)
      val cms = spark.sql(
        """SELECT cms_estimate(cms_sketch(CAST(x AS BIGINT), 4, 64), CAST(7 AS BIGINT)) AS e
           FROM VALUES (7),(7),(8) t(x)""").collect()(0).getLong(0)
      assert(cms >= 2L && cms <= 3L)
      // NFC normalization from SQL: decomposed e+combining-acute composes
      val nt = spark.sql(
        "SELECT normalize_text('cafe\u0301') AS n, normalize_text('\ufb01le', 'NFKC') AS k")
        .collect()(0)
      assert(nt.getString(0) == "caf\u00e9" && nt.getString(1) == "file")
      val ds = spark.sql("SELECT diversity_stats(split('a a b', ' ')) AS d")
        .collect()(0).getStruct(0)
      assert(ds.getLong(0) == 3L) // token count field

      // wrong arity surfaces as a clear message from every registration,
      // never an IndexOutOfBoundsException out of the builder
      for (bad <- Seq("cosine_similarity(array(CAST(1 AS FLOAT)))",
                      "cms_estimate(array(CAST(1 AS BIGINT)))",
                      "repetition_stats(split('a', ' '), 2)")) {
        val err = intercept[Exception] { spark.sql(s"SELECT $bad").collect() }
        def messages(t: Throwable): Seq[String] =
          if (t == null) Nil
          else Option(t.getMessage).toSeq ++ messages(t.getCause)
        assert(messages(err).exists(_.contains("argument")),
          s"$bad: expected an arity message, got $err")
      }
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
