package graft

import org.apache.spark.sql.functions._

/** Round-13 additions: the exact-integer disciplines the scale gates
  * rely on, asserted as unit tests (the decimal-DIV ppm pattern that
  * fixed the r12 20×-fresh overflows, and the density guard's exact
  * candidate estimate past the 2^53 double boundary).
  */
class Round13Spec extends SparkSpec {

  test("decimal DIV ppm arithmetic is exact where BIGINT multiply " +
       "overflows and double division loses integers") {
    // 9e12 * 1e6 = 9e18 fits; 13e12 * 1e6 overflows BIGINT — the
    // DECIMAL(38,0) widening keeps the product exact on both engines
    // (DuckDB side is HUGEINT; parity verified in the r12 gate)
    val r = spark.sql(
      """SELECT CAST(CAST(a AS DECIMAL(38,0)) * 1000000 DIV b AS BIGINT)
        |         AS ppm_small,
        |       CAST(CAST(b AS DECIMAL(38,0)) * 1000000 DIV a AS BIGINT)
        |         AS ppm_large
        |FROM (SELECT CAST(9000000000000 AS BIGINT) AS a,
        |             CAST(13000000000000 AS BIGINT) AS b)""".stripMargin)
      .head()
    assert(r.getLong(0) == 692307L) // floor(9/13 * 1e6)
    assert(r.getLong(1) == 1444444L) // floor(13/9 * 1e6)
    // the DIV result type stays integral (no double round-trip)
    val wide = spark.sql(
      """SELECT CAST(CAST(a AS DECIMAL(38,0)) * (a - 1) DIV 2 AS DECIMAL(38,0))
        |         AS pairs
        |FROM (SELECT CAST(4000000000 AS BIGINT) AS a)""".stripMargin)
      .head()
    // 4e9 choose 2 = 7999999998000000000 — representable as BIGINT but
    // the product 4e9*(4e9-1) is not; and at the next decade the double
    // path would round to a multiple of 1024
    assert(wide.getDecimal(0).toBigInteger
      .equals(new java.math.BigInteger("7999999998000000000")))
  }
}
