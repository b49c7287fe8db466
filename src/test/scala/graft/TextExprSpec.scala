package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** word_shingles codegen kernel vs the declarative HOF formulation it
  * replaced — semantics must be identical (the DuckDB oracle mirrors the
  * HOF form).
  */
class TextExprSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def hofShingles(textCol: org.apache.spark.sql.Column, n: Int) = {
    val ws = split(textCol, " ")
    when(size(ws) >= n,
      array_distinct(transform(
        sequence(lit(0), size(ws) - n),
        i => concat_ws(" ",
          (0 until n).map(k => element_at(ws, (i + k + 1).cast("int"))): _*))))
      .otherwise(array().cast("array<string>"))
  }

  test("matches the HOF formulation on varied inputs") {
    val docs = Seq(
      "a b c d e",
      "a b c a b c a b c", // duplicate shingles
      "x y",               // shorter than n
      "",                  // empty
      "a  b c",            // double space → empty word
      "trailing space ",   // trailing space
      "สวัสดี ครับ ผม ชื่อ",  // unicode
      "one two three"
    ).toDF("text")
    val both = docs.select(
      call_function("word_shingles", col("text"), lit(3)).as("kernel"),
      hofShingles(col("text"), 3).as("hof"))
    assert(both.filter(col("kernel") =!= col("hof")).count() === 0)
  }

  test("null text yields null") {
    val r = Seq(Option.empty[String]).toDF("text")
      .select(call_function("word_shingles", col("text"), lit(3)))
      .head()
    assert(r.isNullAt(0))
  }

  test("interpreted path matches codegen path") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val r = Seq("a b c d").toDF("text")
        .select(call_function("word_shingles", col("text"), lit(3)))
        .head().getSeq[String](0)
      assert(r === Seq("a b c", "b c d"))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
