package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
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

  /** Maximum multiplicity over the word n-grams of `s` — the Gopher
    * top-n-gram repetition statistic ([[graft.ops.TextAnalysis
    * .qualityFilterFunnel]]'s gate 5) computed ROW-LOCALLY: equivalent to
    * exploding [[wordNgrams]] and taking `max(count)` per document, but
    * with no explode, no (doc, gram) shuffle, and no re-aggregate — a
    * per-doc property should never cost a corpus shuffle. One hash map
    * over the doc's own grams, primitive loop, no per-element boxing.
    * Returns 0 when the text has fewer than n words.
    */
  def topNgramCount(s: UTF8String, n: Int): Long = {
    val words = s.toString.split(" ", -1)
    if (words.length < n) return 0L
    val counts = new java.util.HashMap[String, Integer]
    val sb = new java.lang.StringBuilder
    var best = 0
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      val g = sb.toString
      val c = counts.merge(g, 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best.toLong
  }

  /** |distinct(a) ∩ distinct(b)| over two string arrays WITHOUT
    * materializing the intersection array — hash-set build over the
    * smaller side, destructive probe over the larger (remove-on-hit
    * makes the count distinct). Exactly `size(array_intersect(a, b))`,
    * including the null-element contract: two null elements compare
    * equal and contribute at most one to the count.
    */
  def intersectSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return 0
    val (small, ns, large, nl) =
      if (na <= nb) (a, na, b, nb) else (b, nb, a, na)
    val set = new java.util.HashSet[UTF8String](ns * 2)
    var smallHasNull = false
    var i = 0
    while (i < ns) {
      if (small.isNullAt(i)) smallHasNull = true
      else set.add(small.getUTF8String(i))
      i += 1
    }
    var cnt = 0
    i = 0
    while (i < nl && (!set.isEmpty || smallHasNull)) {
      if (large.isNullAt(i)) {
        if (smallHasNull) { cnt += 1; smallHasNull = false }
      } else if (set.remove(large.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** The md5 bucket draw — `pmod(conv(substring(md5(s), 1, 8), 16, 10),
    * m)` collapsed to one digest + masked modulo: the first 8 hex chars
    * of the digest ARE its first 4 bytes, so the hex-string render,
    * substring, and base-16 reparse of the composed form are pure
    * allocation overhead. Callers guarantee m > 0 (the rewrite only
    * fires on positive literals; the direct-call form validates).
    */
  def md5Bucket(s: UTF8String, m: Long): Long = md5Bucket(s, m, 8)

  /** The wide-draw variant: the first `nHexChars` hex characters of the
    * digest (= nHexChars/2 leading bytes; callers pass an even count
    * ≤ 14, so the value stays < 2^56 and fits a signed long in BOTH
    * engines). The Bloom tier draws 14 when its bit count exceeds 2^32
    * — a 32-bit draw can never set a bit position ≥ 2^32, which would
    * silently cap a production-sized filter (the r16 advice finding).
    */
  def md5Bucket(s: UTF8String, m: Long, nHexChars: Int): Long = {
    if (m <= 0) throw new IllegalArgumentException(
      s"md5_bucket: modulus must be positive, got $m")
    // whole leading bytes only: an odd width would silently truncate to
    // nHexChars−1 and diverge from the composed substring(md5…) form;
    // 16 hex chars (2^64) is the first width past a signed long
    if (nHexChars < 2 || nHexChars > 14 || nHexChars % 2 != 0)
      throw new IllegalArgumentException(
        s"md5_bucket: width must be an even count in [2, 14], got $nHexChars")
    val d = md5Local.get().digest(s.getBytes)
    val nBytes = nHexChars / 2
    var v = 0L
    var i = 0
    while (i < nBytes) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v % m
  }

  /** k MinHash draws over a shingle array, row-local in one pass — no
    * explode, no aggregation shuffle. Bit-identical to the relational
    * formulation the oracle mirrors: per shingle, h1/h2 are the two
    * unsigned 48-bit halves of md5 (h2 forced odd; Kirsch-Mitzenmacher
    * double hashing), draw_i = h1 + i·h2 (< 12·2^48 < 2^52 — exact in
    * DuckDB's integer arithmetic AND in a double, so either engine can
    * mirror it), signature_i = min over shingles. Empty input → empty
    * array (callers must drop shingle-less docs BEFORE banding; a
    * sentinel signature would bucket all empty docs together).
    */
  def minhashSig(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mins = Array.fill(k)(Long.MaxValue)
    val md = md5Local.get()
    var i = 0
    while (i < n) {
      val d = md.digest(arr.getUTF8String(i).getBytes)
      // first/second 6 bytes as unsigned 48-bit ints = the first/second
      // 12 hex chars of the digest string (conv(substring(hex,…),16,10))
      var h1 = 0L
      var h2 = 0L
      var b = 0
      while (b < 6) {
        h1 = (h1 << 8) | (d(b) & 0xffL)
        h2 = (h2 << 8) | (d(b + 6) & 0xffL)
        b += 1
      }
      h2 |= 1L
      var j = 0
      while (j < k) {
        val draw = h1 + j * h2
        if (draw < mins(j)) mins(j) = draw
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box(_): AnyRef))
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

/** top_ngram_count(text, n): max word-n-gram multiplicity, row-local —
  * the shuffle-free form of the per-doc `max(count)` over exploded
  * n-grams. Same codegen-kernel shape as [[WordNgrams]].
  */
case class TopNgramCount(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"top_ngram_count expects a string column, got ${t.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "top_ngram_count"

  override def nullSafeEval(s: Any): Any =
    TextOps.topNgramCount(s.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextOps.topNgramCount($c, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): TopNgramCount =
    copy(child = newChild)
}

/** intersect_size(a, b): `size(array_intersect(a, b))` fused into one
  * hash-probe count — no intermediate distinct-intersection array is
  * allocated per row, which matters on the exact-Jaccard verify path
  * where this runs once per candidate PAIR over full shingle sets.
  * Installed two ways: as a callable function, and via
  * [[RewriteIntersectSize]], the optimizer rule that rewrites the
  * composed form wherever it appears (so query code keeps the
  * declarative `size(array_intersect(...))` and still gets the kernel).
  *
  * `legacySizeOfNull` mirrors `Size`'s contract exactly (−1 vs NULL on a
  * null input), so the rewrite is semantics-preserving under either
  * setting of `spark.sql.legacy.sizeOfNull`.
  */
case class IntersectSize(left: Expression, right: Expression,
                         legacySizeOfNull: Boolean)
    extends BinaryExpression {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._

  private def checkSide(e: Expression): TypeCheckResult = e.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"intersect_size expects an array<string> column, " +
        s"got ${t.catalogString}")
  }
  override def checkInputDataTypes(): TypeCheckResult =
    Seq(checkSide(left), checkSide(right))
      .find(_ != TypeCheckResult.TypeCheckSuccess)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def nullable: Boolean =
    if (legacySizeOfNull) false else left.nullable || right.nullable
  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_size"

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) { if (legacySizeOfNull) -1 else null }
    else TextOps.intersectSize(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val le = left.genCode(ctx)
    val re = right.genCode(ctx)
    val onNull =
      if (legacySizeOfNull) s"${ev.value} = -1;"
      else s"${ev.isNull} = true;"
    ev.copy(code =
      code"""
        ${le.code}
        ${re.code}
        boolean ${ev.isNull} = false;
        int ${ev.value} = 0;
        if (${le.isNull} || ${re.isNull}) {
          $onNull
        } else {
          ${ev.value} = graft.functions.TextOps.intersectSize(
            ${le.value}, ${re.value});
        }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSize =
    copy(left = newLeft, right = newRight)
}

/** minhash_sig(shingles, k): the k-draw MinHash signature as ARRAY<LONG>,
  * computed row-local (see [[TextOps.minhashSig]]). Replaces an
  * explode → md5 → hex-conv → k-column min-aggregate pipeline — same
  * values, no shuffle, one digest per shingle.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects an array<string> column, got ${t.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(s: Any): Any =
    TextOps.minhashSig(s.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextOps.minhashSig($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** md5_bucket(s, m): the engine-wide md5 coin —
  * `pmod(conv(substring(md5(s), 1, 8), 16, 10), m)` — as one digest +
  * modulo ([[TextOps.md5Bucket]]). Installed two ways like
  * [[IntersectSize]]: callable, and via [[graft.functions
  * .RewriteMd5Bucket]], which fuses the composed form wherever it
  * appears (split coins, bucket-offset rank draws, Bloom/CMS hash
  * positions, stratum filters) — query code stays declarative, every
  * coin drops its hex-render/substring/reparse string work.
  */
case class Md5Bucket(left: Expression, right: Expression,
                     nHexChars: Int = 8)
    extends BinaryExpression with ImplicitCastInputTypes {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._

  // ImplicitCastInputTypes so a direct call with an int modulus —
  // md5_bucket(s, 100) — coerces like any binary expression instead of
  // failing analysis (the r16 advice finding); the type check itself
  // comes from ExpectsInputTypes.
  // (return type inferred: AbstractDataType is private[sql])
  override def inputTypes = Seq(StringType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_bucket"

  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    val m = right.eval(input)
    if (s == null || m == null) null
    else TextOps.md5Bucket(s.asInstanceOf[UTF8String],
      m.asInstanceOf[Long], nHexChars)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val le = left.genCode(ctx)
    val re = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${le.code}
        ${re.code}
        boolean ${ev.isNull} = false;
        long ${ev.value} = 0L;
        if (${le.isNull} || ${re.isNull}) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = graft.functions.TextOps.md5Bucket(
            ${le.value}, ${re.value}, $nHexChars);
        }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5Bucket =
    copy(left = newLeft, right = newRight)
}
