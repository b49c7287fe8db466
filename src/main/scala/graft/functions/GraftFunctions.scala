package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Expression, ExpressionInfo, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.SparkSessionExtensions

/** Registry for graft's native Catalyst expressions, usable two ways:
  *   - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *     build time, or
  *   - [[GraftFunctions.register]] on a live session (idempotent) — the
  *     path the query library uses so the driver's plain sessions work.
  *
  * Both paths also install [[RewriteIntersectSize]], the optimizer rule
  * that fuses `size(array_intersect(a, b))` into the [[IntersectSize]]
  * kernel — preference order (c) of the builder brief: query code stays
  * declarative; the plan gets the native operator.
  */
object GraftFunctions {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => DotProduct(es.head, es(1))),
    "vec_norm" -> (es => NormL2(es.head)),
    "word_shingles" -> (es => WordShingles(es.head, intLit("word_shingles", es(1)))),
    "word_ngrams" -> (es => WordNgrams(es.head, intLit("word_ngrams", es(1)))),
    "top_ngram_count" ->
      (es => TopNgramCount(es.head, intLit("top_ngram_count", es(1)))),
    "minhash_sig" -> (es => MinHashSig(es.head, intLit("minhash_sig", es(1)))),
    "vec_lsh_sig" -> (es => LshSignature(es.head, intLit("vec_lsh_sig", es(1)))),
    "vec_rp" -> (es => RandomProjection(es.head, intLit("vec_rp", es(1)))),
    // direct-call form: size(null)-as-NULL semantics (non-legacy)
    "intersect_size" ->
      (es => IntersectSize(es.head, es(1), legacySizeOfNull = false))
  )

  private def intLit(fn: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects an int literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    if (!spark.experimental.extraOptimizations.contains(RewriteIntersectSize))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteIntersectSize
    if (!spark.experimental.extraStrategies
        .contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    if (!spark.experimental.extraStrategies
        .contains(graft.plans.RangeJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.RangeJoinStrategy
  }
}

/** Fuse `size(array_intersect(a, b))` → [[IntersectSize]] for string
  * arrays (the shingle-set shape): same value under either `sizeOfNull`
  * contract — the legacy flag is carried over verbatim, and the kernel
  * reproduces array_intersect's null-element equality (two null elements
  * match, at most once) — but no per-row intermediate
  * distinct-intersection array is allocated.
  */
object RewriteIntersectSize extends Rule[LogicalPlan] {
  private def stringSet(t: DataType): Boolean = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ai: ArrayIntersect, legacy)
          if stringSet(ai.left.dataType) && stringSet(ai.right.dataType) =>
        IntersectSize(ai.left, ai.right, legacy)
    }
}

/** `SparkSessionExtensions` hook (config `spark.sql.extensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    ext.injectOptimizerRule(_ => RewriteIntersectSize)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
  }
}
