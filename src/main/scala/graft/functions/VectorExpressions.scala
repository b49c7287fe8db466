package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the similarity-search hot path.
  *
  * The generic higher-order-function formulation
  * (`aggregate(zip_with(a, b, …))`) is interpreted per element with boxing —
  * measured ~30 s for the 2M-pair × 64-dim near-dup sweep at sf0.1. These
  * expressions generate a tight primitive loop inside whole-stage codegen
  * instead (preference order (b) of the builder brief: a native
  * `Expression` with `doGenCode` beats a Scala UDF).
  *
  * Numeric contract: accumulation is sequential left-to-right in DOUBLE over
  * float→double casts — the exact operation order of the HOF formulation and
  * of DuckDB's list_sum, so results stay bit-identical to the oracle.
  */
object VectorExpressions {

  private[functions] def elemGet(elemType: DataType, arr: String, i: String): String =
    elemType match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  private[functions] def elemAt(elemType: DataType, arr: ArrayData, i: Int): Double =
    elemType match {
      case FloatType => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  private[functions] def checkVec(name: String, e: Expression): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$name expects array<float>/array<double>, got ${t.catalogString}")
    }
}

/** dot(a, b) over two float/double arrays, double accumulation in index
  * order. Null if either side is null; length mismatch uses the common
  * prefix (callers guarantee fixed dims).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorExpressions._

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(checkVec(prettyName, left), checkVec(prettyName, right))
      .find(_ != TypeCheckResult.TypeCheckSuccess)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def lElem = left.dataType.asInstanceOf[ArrayType].elementType
  private def rElem = right.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += elemAt(lElem, x, i) * elemAt(rElem, y, i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${elemGet(lElem, a, i)} * ${elemGet(rElem, b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Hyperplane LSH signature over a float/double array: bit p of the result
  * is set iff the dim-ordered fold sum_d sign(p,d)·x_d is > 0, with
  * sign(p,d) = ±1 from the parity of md5("p,d")'s first byte — the same
  * deterministic scheme the DuckDB oracle computes symbolically.
  *
  * Exists as a kernel because the declarative form (nPlanes × dim nested
  * Add tree, 512 nodes at 8×64) exceeds codegen method limits and falls
  * back to per-node interpretation — measured 32 s vs ~1 s at sf0.1.
  */
case class LshSignature(child: Expression, nPlanes: Int)
    extends UnaryExpression {
  import VectorExpressions._

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(prettyName, child)
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_lsh_sig"

  private def elem = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any): Any =
    LshSignature.compute(a.asInstanceOf[ArrayData], nPlanes,
      elem == DoubleType)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.functions.LshSignature.compute($a, $nPlanes,
         |  ${elem == DoubleType});""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)
}

object LshSignature {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]

  /** ±1 sign matrix from md5("p,d") first-byte parity (cached per shape). */
  def signMatrix(nPlanes: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((nPlanes, dim), { case (np, d) =>
      Array.tabulate(np, d) { (p, i) =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p,$i".getBytes("UTF-8"))
        if ((md(0) & 1) == 0) 1.0 else -1.0
      }
    })

  /** Codegen entry point: one virtual call per row. */
  def compute(x: ArrayData, nPlanes: Int, isDouble: Boolean): Long = {
    val dim = x.numElements()
    val signs = signMatrix(nPlanes, dim)
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      val row = signs(p)
      var acc = 0.0
      var d = 0
      while (d < dim) {
        acc += row(d) * (if (isDouble) x.getDouble(d) else x.getFloat(d).toDouble)
        d += 1
      }
      if (acc > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

/** ±1 random projection (Johnson & Lindenstrauss 1984 — public method)
  * of a float/double array down to `nDims` doubles: y_p = Σ_d
  * sign(p,d)·x_d with the SAME md5("p,d") first-byte-parity sign matrix
  * as [[LshSignature]] (shared cache) — so the projection the oracle
  * recomputes symbolically is bit-identical (dim-ordered double folds,
  * signs exact). Kernel for the same reason as the signature: the
  * declarative form is an nDims × dim Add tree past codegen limits.
  */
case class RandomProjection(child: Expression, nDims: Int)
    extends UnaryExpression {
  import VectorExpressions._

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(prettyName, child)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_rp"

  private def elem = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any): Any =
    RandomProjection.compute(a.asInstanceOf[ArrayData], nDims,
      elem == DoubleType)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.functions.RandomProjection.compute($a, $nDims,
         |  ${elem == DoubleType});""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): RandomProjection =
    copy(child = newChild)
}

object RandomProjection {
  /** Codegen entry point: one virtual call per row, primitive loops. */
  def compute(x: ArrayData, nDims: Int,
              isDouble: Boolean): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val dim = x.numElements()
    val signs = LshSignature.signMatrix(nDims, dim)
    val out = new Array[Double](nDims)
    var p = 0
    while (p < nDims) {
      val row = signs(p)
      var acc = 0.0
      var d = 0
      while (d < dim) {
        acc += row(d) * (if (isDouble) x.getDouble(d) else x.getFloat(d).toDouble)
        d += 1
      }
      out(p) = acc
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** sqrt(sum(x_i^2)) over a float/double array, same fold discipline. */
case class NormL2(child: Expression)
    extends UnaryExpression {
  import VectorExpressions._

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(prettyName, child)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  private def elem = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val v = elemAt(elem, x, i)
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = ${elemGet(elem, a, i)};
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormL2 =
    copy(child = newChild)
}
