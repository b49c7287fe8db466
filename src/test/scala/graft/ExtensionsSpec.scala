package graft

import org.apache.spark.sql.SparkSession

/** The library-integration path: a session built with GraftExtensions
  * (the `spark.sql.extensions` hook) resolves the native functions in
  * plain SQL with no imperative register call — what a user of the
  * library gets by adding one config line to spark-submit.
  */
class ExtensionsSpec extends SparkSpec {

  test("session built withExtensions resolves graft functions in SQL") {
    val orig = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.functions.GraftExtensions())
      .getOrCreate()
    try {
      val d = s2.sql(
        """SELECT vec_dot(
          |  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""".stripMargin)
        .head.getDouble(0)
      assert(d === 11.0)
      val n = s2.sql(
        "SELECT vec_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n")
        .head.getDouble(0)
      assert(n === 5.0)
      val sh = s2.sql(
        "SELECT size(word_shingles('a b c d', 3)) AS k").head.getInt(0)
      assert(sh === 2)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      orig.foreach { o =>
        SparkSession.setDefaultSession(o)
        SparkSession.setActiveSession(o)
      }
    }
  }
}
