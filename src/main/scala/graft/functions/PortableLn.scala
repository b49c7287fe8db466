package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable natural log for hash-gated float pipelines.
  *
  * `Math.log` (JVM) and a C libm's `ln` are only guaranteed faithful to
  * ~1 ulp, and real builds DO differ in the last bit — which flips a
  * `round(x, 6)` result whenever the true value sits on a 6-decimal
  * rounding boundary (the `dsir_importance` driver-env hash-fail,
  * VERDICT r8). IEEE 754 DOES guarantee bit-exact cross-engine results
  * for `+ - * /` (each correctly rounded) and for decimal-literal →
  * double parsing (correctly rounded). So this object computes ln from
  * ONLY those ops:
  *
  *   1. range-reduce x ∈ [2^-63, 2^63] into m ∈ [1, 2) by a fixed
  *      CASE ladder of power-of-two multiplies/divides (EXACT in binary
  *      fp — no rounding at all), accumulating the exponent e;
  *   2. ln(m) = 2·artanh(s), s = (m−1)/(m+1) ∈ [0, 1/3), via the odd
  *      series through s^13 (truncation < 1e-8 — well under the 1e-6
  *      quantum the callers round to);
  *   3. ln(x) = e·ln2 + ln(m), with ln2 as the shortest-repr double
  *      literal 0.6931471805599453 (parses to the same bits everywhere).
  *
  * The ladder is evaluated as STAGED projections (12 steps), not one
  * nested expression — a single expression would reference each prior
  * stage 3× and blow up exponentially. [[withLn]] emits the Spark
  * Column pipeline and [[sqlCtes]] emits the equivalent DuckDB CTE
  * chain; both are generated from the same [[Steps]] list so the two
  * engines cannot drift structurally. Evaluation order is pinned by
  * explicit parentheses on both sides.
  *
  * This is NOT a general libm replacement: callers quantize the result
  * (e.g. `round(_, 6)`), so only cross-engine bit-identity matters, not
  * last-ulp agreement with true ln.
  */
object PortableLn {
  /** Ladder step sizes; covers x ∈ [2^-63, 2^64). */
  private val Steps: Seq[Int] = Seq(32, 16, 8, 4, 2, 1)

  /** Shortest decimal repr of the double nearest ln 2. The SQL form uses
    * e-notation because a bare fixed-point literal parses as DECIMAL in
    * SQL engines (Spark SQL would then do DECIMAL division on the series
    * constants — a 4e-10 error, caught by Round10Spec's replay test);
    * e-notation is DOUBLE everywhere, and parses correctly rounded to
    * identical bits in every IEEE engine. */
  private val Ln2 = "0.6931471805599453"
  private val Ln2Sql = "6.931471805599453e-1"

  /** Odd-series denominators for 2·artanh(s) = 2s·(1 + s²/3 + s⁴/5 + …). */
  private val SeriesDenoms: Seq[Int] = Seq(3, 5, 7, 9, 11, 13)

  /** Adds double column `out` = portable ln of strictly-positive double
    * column `x` (left intact). Cost: 14 narrow projections — Catalyst
    * collapses adjacent Projects, so the physical plan stays one stage. */
  def withLn(df0: DataFrame, x: String, out: String): DataFrame = {
    var df = df0
      .withColumn("__pl_x", col(x).cast("double"))
      .withColumn("__pl_e", lit(0))
    for (k <- Steps) { // large ladder: after step k, x < 2^k
      val p = lit((1L << k).toDouble)
      df = df.withColumns(Map(
        "__pl_x" -> when(col("__pl_x") >= p, col("__pl_x") / p)
          .otherwise(col("__pl_x")),
        "__pl_e" -> when(col("__pl_x") >= p, col("__pl_e") + k)
          .otherwise(col("__pl_e"))))
    }
    for (k <- Steps) { // small ladder: after step k, x >= 2^(1-k)
      val thresh = lit(1.0 / (1L << (k - 1)).toDouble) // exact 2^(1-k)
      val p = lit((1L << k).toDouble)
      df = df.withColumns(Map(
        "__pl_x" -> when(col("__pl_x") < thresh, col("__pl_x") * p)
          .otherwise(col("__pl_x")),
        "__pl_e" -> when(col("__pl_x") < thresh, col("__pl_e") - k)
          .otherwise(col("__pl_e"))))
    }
    df = df
      .withColumn("__pl_s",
        (col("__pl_x") - lit(1.0)) / (col("__pl_x") + lit(1.0)))
      .withColumn("__pl_u", col("__pl_s") * col("__pl_s"))
    val u = col("__pl_u")
    // 1 + u*(1/3 + u*(1/5 + … )) — Horner, innermost-first
    val poly = SeriesDenoms.reverse
      .foldLeft(null: Column) { (acc, d) =>
        val c = lit(1.0 / d.toDouble)
        if (acc == null) c else c + u * acc
      }
    val series = lit(1.0) + u * poly
    df.withColumn(out,
        (col("__pl_e").cast("double") * lit(Ln2.toDouble)) +
          ((lit(2.0) * col("__pl_s")) * series))
      .drop("__pl_x", "__pl_e", "__pl_s", "__pl_u")
  }

  /** DuckDB CTE chain computing the SAME staged pipeline. Returns the
    * CTE text (to splice after a leading `WITH … ,`) and the name of
    * the final CTE, which exposes `keep` columns plus double `out`.
    *
    * @param prefix  unique CTE-name prefix (e.g. "pl")
    * @param fromSql the FROM clause body the ladder reads (a CTE name
    *                or join expression)
    * @param keep    passthrough columns carried through every stage
    * @param xExpr   SQL expression for the strictly-positive input
    */
  def sqlCtes(prefix: String, fromSql: String, keep: Seq[String],
              xExpr: String, out: String): (String, String) = {
    val ks = keep.mkString(", ")
    val keepSel = if (keep.isEmpty) "" else ks + ", "
    val b = new StringBuilder
    b.append(s"${prefix}0 AS (SELECT $keepSel$xExpr AS x, 0 AS e FROM $fromSql)")
    var i = 0
    for (k <- Steps) { // large ladder
      val p = s"${1L << k}e0"
      b.append(s""",
        |${prefix}${i + 1} AS (SELECT $keepSel
        |  CASE WHEN x >= $p THEN x / $p ELSE x END AS x,
        |  CASE WHEN x >= $p THEN e + $k ELSE e END AS e
        |  FROM ${prefix}$i)""".stripMargin)
      i += 1
    }
    for (k <- Steps) { // small ladder
      val thresh = s"(1e0 / ${1L << (k - 1)}e0)"
      val p = s"${1L << k}e0"
      b.append(s""",
        |${prefix}${i + 1} AS (SELECT $keepSel
        |  CASE WHEN x < $thresh THEN x * $p ELSE x END AS x,
        |  CASE WHEN x < $thresh THEN e + (0 - $k) ELSE e END AS e
        |  FROM ${prefix}$i)""".stripMargin)
      i += 1
    }
    val poly = SeriesDenoms.reverse.foldLeft(null: String) { (acc, d) =>
      val c = s"(1e0 / ${d}e0)"
      if (acc == null) c else s"($c + (u * $acc))"
    }
    b.append(s""",
      |${prefix}_s AS (SELECT ${keepSel}e,
      |  (x - 1e0) / (x + 1e0) AS s FROM ${prefix}$i),
      |${prefix}_u AS (SELECT ${keepSel}e, s, s * s AS u FROM ${prefix}_s),
      |${prefix}_out AS (SELECT $keepSel
      |  (CAST(e AS DOUBLE) * $Ln2Sql) +
      |    ((2e0 * s) * (1e0 + (u * $poly))) AS $out
      |  FROM ${prefix}_u)""".stripMargin)
    (b.toString, s"${prefix}_out")
  }
}
