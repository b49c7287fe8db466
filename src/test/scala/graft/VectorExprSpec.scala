package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** vec_dot / vec_norm (custom codegen expressions) vs a plain Scala fold,
  * plus null/type edge cases. Codegen and interpreted paths both covered:
  * whole-stage codegen handles the main projection; the interpreted
  * `nullSafeEval` path is forced via spark.sql.codegen.factoryMode.
  */
class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.5f, -0.5f, 2.5f), Array(1.5f, 0.0f, -1.0f))
  ).toDF("id", "a", "b")

  private def scalaDot(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
      acc + x.toDouble * y.toDouble
    }

  test("vec_dot equals a sequential double fold (codegen path)") {
    val rows = vecs
      .select(col("id"), call_function("vec_dot", col("a"), col("b")))
      .collect()
    assert(rows.map(_.getDouble(1)).toSeq ===
      Seq(scalaDot(Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
        scalaDot(Array(0.5f, -0.5f, 2.5f), Array(1.5f, 0f, -1f))))
  }

  test("vec_dot interpreted path matches codegen path") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val r = vecs.select(call_function("vec_dot", col("a"), col("b")))
        .collect().map(_.getDouble(0))
      assert(r.head === 32.0)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("vec_norm is sqrt of self-dot") {
    val r = vecs.select(
      call_function("vec_norm", col("a")),
      sqrt(call_function("vec_dot", col("a"), col("a"))))
      .collect()
    r.foreach(row => assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 1e-12))
  }

  test("null input yields null, not error") {
    val withNull = Seq((1L, Option.empty[Array[Float]]))
      .toDF("id", "a")
    val r = withNull.select(call_function("vec_norm", col("a"))).head()
    assert(r.isNullAt(0))
  }

  test("double arrays are accepted too") {
    val d = Seq((Array(3.0, 4.0))).toDF("a")
    assert(d.select(call_function("vec_norm", col("a"))).head().getDouble(0)
      === 5.0)
  }

  test("non-array input is a type-check error") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1).toDF("x").select(call_function("vec_dot", col("x"), col("x")))
        .collect()
    }
    assert(e.getMessage.contains("vec_dot"))
  }
}
