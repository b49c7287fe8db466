package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric conventions shared by the oracle-checked queries. */
object Num {
  /** Exact money sum: per-row cast to DECIMAL(18,6) (both engines round the
    * same double to the same decimal), exact integer-scaled accumulation
    * (order-independent — raw double sums differ in ulps with partition
    * order), surfaced as DOUBLE (deterministic nearest-double of the exact
    * decimal). Averages/ratios must be quotients of such exact operands,
    * never `round()`ed: Spark and DuckDB round identical doubles differently
    * at .xx5 decimal boundaries.
    */
  def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast("double")
}
