package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PII handling over the customer dimension — the privacy surface a
  * training-data pipeline needs before raw records can feed a corpus:
  * pseudonymization, masking, generalization, and a k-anonymity audit of
  * the surviving quasi-identifiers.
  *
  * Everything is row-local except the k-anonymity groupBy (one shuffle on
  * the quasi-identifier tuple), and every transform is a deterministic
  * function of the row (md5 pseudonyms, regex masks, bucket floors) — no
  * salt table, no state — so redaction is reproducible across engines and
  * cluster sizes, and each query carries a full SQL oracle.
  */
object Privacy {

  /** Stable pseudonym: keyed-lookup-free md5 of the natural key. 12 hex
    * chars = 48 bits — collision-safe into the billions of subjects.
    */
  private def pseudonym(id: Column): Column =
    concat(lit("cust_"), substring(md5(id.cast("string")), 1, 12))

  /** Generalize a continuous value to its 500-unit band (floor toward
    * -infinity, so negative balances band the same way in every engine).
    */
  private def band500(c: Column): Column =
    (floor(c / 500.0) * 500.0).cast("double")

  /** Redacted customer projection: direct identifiers pseudonymized
    * (c_custkey → md5 token) or masked (digits in c_name → '#'), the
    * continuous attribute generalized to a 500-unit band, and the
    * categorical quasi-identifiers kept as-is for analytics. Row-local —
    * at scale this is a scan, not a job.
    */
  def piiRedact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select(
        pseudonym(col("c_custkey")).as("pseudonym"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked_name"),
        band500(col("c_acctbal")).as("acctbal_band"),
        col("c_nationkey"), col("c_mktsegment"))
      .orderBy("pseudonym")

  /** k-anonymity audit of the post-redaction quasi-identifier tuple
    * (nation, segment, balance band): group sizes plus a flag for groups
    * smaller than k, i.e. the combinations that still re-identify. One
    * shuffle on the tuple; group count is bounded by the QI domain
    * product, not the row count.
    */
  def kAnonymity(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame =
    Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        band500(col("c_acctbal")).as("acctbal_band"))
      .groupBy("c_nationkey", "c_mktsegment", "acctbal_band")
      .agg(count(lit(1)).as("n"))
      .withColumn("under_k", when(col("n") < k, 1).otherwise(0))
      .orderBy("c_nationkey", "c_mktsegment", "acctbal_band")
}
