package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact per-group top-k as a typed `Aggregator` (SURVEY.md §7.3's one
  * optional custom aggregate): a bounded k-element buffer per group, merged
  * associatively — so it runs as a normal partial/final hash aggregate
  * (map-side combine, one shuffle of ≤k rows per group) AND works
  * unchanged inside streaming update mode, where the window-rank
  * formulation (sort + filter) is unavailable.
  *
  * The batch query form is oracle-checked against the window-rank
  * equivalent; ties break deterministically on the payload to keep both
  * engines identical.
  */
object TopK {

  /** Top-k (score, payload) pairs per group, descending score, ties broken
    * by ascending payload. The reduction keeps buffers at ≤k elements, so
    * shuffle volume per group is O(k), independent of group size.
    */
  class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortBy { case (score, payload) => (-score, payload) }.take(k)
    override def zero: Seq[(Double, Long)] = Seq.empty
    override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      trim(b :+ a)
    override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(x ++ y)
    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
  }

  /** Top-3 orders by price per market segment, via the Aggregator. */
  def topOrdersPerSegment(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    val agg = new TopKAgg(k).toColumn
    val joined = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"), col("o_orderkey"))
      .as[(String, Double, Long)]
    joined
      .groupByKey(_._1)
      .mapValues { case (_, price, key) => (price, key) }
      .agg(agg.name("topk"))
      .flatMap { case (seg, top) =>
        top.map { case (price, key) => (seg, key, price) }
      }
      .toDF("c_mktsegment", "o_orderkey", "o_totalprice")
      .orderBy("c_mktsegment", "o_orderkey")
  }
}
