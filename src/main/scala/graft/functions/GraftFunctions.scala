package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Cast, Conv, Expression, ExpressionInfo, Literal, Md5, Pmod, Size, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.sql.SparkSessionExtensions

/** Registry for graft's native Catalyst expressions, usable two ways:
  *   - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *     build time, or
  *   - [[GraftFunctions.register]] on a live session (idempotent) — the
  *     path the query library uses so the driver's plain sessions work.
  *
  * Both paths also install the optimizer rules [[RewriteIntersectSize]]
  * (fuses `size(array_intersect(a, b))` into the [[IntersectSize]]
  * kernel) and [[RewriteMd5Bucket]] (fuses the engine-wide md5 coin
  * into [[Md5Bucket]]) — preference order (c) of the builder brief:
  * query code stays declarative; the plan gets the native operator.
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
      (es => IntersectSize(es.head, es(1), legacySizeOfNull = false)),
    "md5_bucket" -> (es => Md5Bucket(es.head, es(1)))
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
    if (!spark.experimental.extraOptimizations.contains(RewriteMd5Bucket))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteMd5Bucket
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

/** Fuse the engine-wide md5 coin —
  * `pmod(cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint), m)` —
  * into the [[Md5Bucket]] kernel. The composed form renders the 16-byte
  * digest as a 32-char hex string, substrings 8 chars, and reparses
  * them base-16, all to recover the digest's own first 4 bytes; the
  * kernel reads the bytes. Fires only on a POSITIVE long/int literal
  * modulus, where pmod ≡ the kernel's `%` under either ANSI setting
  * (a zero or negative modulus keeps the composed form and its exact
  * semantics). Runs in the user-optimizer batch, i.e. after type
  * coercion and constant folding — the literal is already a long.
  */
object RewriteMd5Bucket extends Rule[LogicalPlan] {
  private object PositiveLit {
    def unapply(e: Expression): Option[Expression] = e match {
      case l @ Literal(m: Long, LongType) if m > 0 => Some(l)
      case Literal(m: Int, IntegerType) if m > 0 =>
        Some(Literal(m.toLong, LongType))
      case _ => None
    }
  }
  /** The STRING the caller hashed: the analyzer wraps md5's argument in
    * a string→binary cast, which the kernel (string-keyed, one
    * getBytes) unwraps.
    */
  private object HashedString {
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(s, org.apache.spark.sql.types.BinaryType, _, _)
          if s.dataType == StringType => Some(s)
      case s if s.dataType == StringType => Some(s)
      case _ => None
    }
  }
  /** Hex widths the kernel supports: whole leading bytes, value < 2^56
    * (fits a signed long) — 8 is the engine-wide coin, 14 the Bloom
    * tier's wide draw for filters beyond 2^32 bits.
    */
  private val FusableHexLens = Set(8, 14)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Pmod(
          Cast(Conv(Substring(Md5(HashedString(s)), Literal(1, IntegerType),
              Literal(len: Int, IntegerType)),
            Literal(16, IntegerType), Literal(10, IntegerType), _),
            LongType, _, _),
          PositiveLit(m), _) if FusableHexLens(len) =>
        Md5Bucket(s, m, len)
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
    ext.injectOptimizerRule(_ => RewriteMd5Bucket)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
  }
}
