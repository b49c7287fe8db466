package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.SparkSessionExtensions

/** Registry for graft's native Catalyst expressions, usable two ways:
  *   - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *     build time, or
  *   - [[GraftFunctions.register]] on a live session (idempotent) — the
  *     path the query library uses so the driver's plain sessions work.
  */
object GraftFunctions {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => DotProduct(es.head, es(1))),
    "vec_norm" -> (es => NormL2(es.head)),
    "word_shingles" -> (es => WordShingles(es.head, intLit("word_shingles", es(1)))),
    "word_ngrams" -> (es => WordNgrams(es.head, intLit("word_ngrams", es(1)))),
    "minhash_sig" -> (es => MinHashSig(es.head, intLit("minhash_sig", es(1)))),
    "vec_lsh_sig" -> (es => LshSignature(es.head, intLit("vec_lsh_sig", es(1))))
  )

  private def intLit(fn: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects an int literal, got $other")
  }

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

/** `SparkSessionExtensions` hook (config `spark.sql.extensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}
