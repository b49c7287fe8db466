package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[WordShingles]] — one virtual call per row from
  * generated code, primitive loop inside (no per-element lambda boxing).
  */
object TextOps {

  /** Distinct word n-gram shingles in first-occurrence order. Semantics
    * match `array_distinct(transform(sequence(0, size-n), i =>
    * concat_ws(" ", ws[i..i+n-1])))` over `split(text, " ")` (trailing
    * empty words kept, like Spark's split with limit -1) — the
    * formulation the DuckDB oracle mirrors.
    */
  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val words = s.toString.split(" ", -1)
    if (words.length < n)
      return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size)))
  }

  /** ALL word n-grams in order, duplicates kept — the language-model
    * sibling of [[wordShingles]] (token statistics need multiplicity;
    * dedup shingling needs sets). Semantics match
    * `transform(sequence(0, size-n), i => concat_ws(" ", ws[i..i+n-1]))`
    * over `split(text, " ")`.
    */
  def wordNgrams(s: UTF8String, n: Int): ArrayData = {
    val words = s.toString.split(" ", -1)
    if (words.length < n)
      return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](words.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** word_shingles(text, n): distinct word n-gram shingle array. The
  * interpreted HOF formulation measured 4.2 s for the sf0.1 corpus vs
  * 0.5 s for this kernel — same per-element-boxing pathology as the
  * vector folds in [[VectorExpressions]].
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"word_shingles expects a string column, got ${t.catalogString}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(s: Any): Any =
    TextOps.wordShingles(s.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextOps.wordShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** word_ngrams(text, n): ALL word n-grams, duplicates kept (language-model
  * counting — multiplicity is the signal). Same codegen-kernel shape as
  * [[WordShingles]]: one static call per row, primitive loop inside.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"word_ngrams expects a string column, got ${t.catalogString}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(s: Any): Any =
    TextOps.wordNgrams(s.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextOps.wordNgrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}
