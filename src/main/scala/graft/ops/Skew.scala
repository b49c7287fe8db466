package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Key-salting for skewed shuffle joins — the manual escape hatch for the
  * 100 TB case where one join key owns a disproportionate share of rows
  * (AQE's skew-join split handles sort-merge spills, but salting also
  * spreads the STATE of the hot key across `nSalts` reducers and works
  * under any join strategy).
  *
  * Mechanics: the skewed (probe) side gets a deterministic salt in
  * [0, nSalts) hashed from a high-cardinality column; the build side is
  * replicated once per salt value (constant `nSalts`× fan-out). The join
  * key becomes (key, salt), so each hot key spreads over `nSalts`
  * partitions. Salt choice cannot change the join RESULT — only its
  * placement — so oracle SQL is the plain unsalted join.
  */
object Skew {

  /** Inner-join `left` (skewed side, salted on `saltFrom`) with `right`
    * (replicated) on `leftKey == rightKey`.
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 saltFrom: String, nSalts: Int): DataFrame = {
    val salted = left.withColumn("_salt", pmod(hash(col(saltFrom)), lit(nSalts)))
    val replicated = right.withColumn("_salt",
      explode(array((0 until nSalts).map(lit): _*)))
    salted.join(replicated,
      salted(leftKey) === replicated(rightKey) &&
        salted("_salt") === replicated("_salt"))
  }

  /** Per-user event×order pair counts through the salted join (events'
    * user distribution is the skewed axis in the fixtures: few users own
    * the whole event stream). The salt hashes event_id — a per-ROW value,
    * never the join key itself, which would re-concentrate each hot key
    * into a single salt bucket.
    */
  def saltedUserCounts(spark: SparkSession, sfDir: String,
                       nSalts: Int = 8): DataFrame = {
    val e = Tables.events(spark, sfDir).select(col("event_id"), col("user_id"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_totalprice"))
    saltedJoin(e, o, "user_id", "o_custkey", "event_id", nSalts)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        round(sum("o_totalprice"), 2).as("sum_price"))
      .orderBy("user_id")
  }
}
