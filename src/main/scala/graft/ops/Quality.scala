package graft.ops


import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Dataset profiling — the validation pass a pipeline runs before trusting
  * an input drop: per-column row/null/distinct counts plus numeric ranges,
  * one row per profiled column (what Deequ calls a column profile).
  *
  * Shape: ONE wide aggregate over a single scan produces every metric,
  * then the 1×N row is unpivoted row-locally into the report. The exact
  * distinct counts plan as one Expand(×columns) pass — the honest cost of
  * exactness; at 100 TB swap `countDistinct` for `approx_count_distinct`
  * (same plan minus the expand) and keep the report schema.
  */
object Quality {

  private case class Prof(name: String, c: Column, numeric: Boolean)

  def dataProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val cols = Seq(
      Prof("event_id", col("event_id"), numeric = true),
      Prof("user_id", col("user_id"), numeric = true),
      Prof("event_type", col("event_type"), numeric = false),
      Prof("value", col("value"), numeric = true),
      Prof("props", col("props"), numeric = false))
    val aggs = cols.flatMap { p =>
      Seq(
        count(p.c).as(s"${p.name}__nn"),
        countDistinct(p.c).as(s"${p.name}__nd")) ++
        (if (p.numeric)
           Seq(min(p.c).cast("double").as(s"${p.name}__mn"),
             max(p.c).cast("double").as(s"${p.name}__mx"))
         else Seq.empty)
    }
    val wide = ev.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { p =>
      struct(
        lit(p.name).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${p.name}__nn")).as("n_nulls"),
        col(s"${p.name}__nd").as("n_distinct"),
        (if (p.numeric) col(s"${p.name}__mn")
         else lit(null).cast("double")).as("min_num"),
        (if (p.numeric) col(s"${p.name}__mx")
         else lit(null).cast("double")).as("max_num"))
    }
    wide.select(explode(array(rows: _*)).as("r"))
      .select("r.*")
      .orderBy("column")
  }

  /** Content checksums per source partition — the anti-entropy primitive a
    * replicated store uses to verify replicas/backups without moving data
    * (ClickHouse checksums parts the same way; here it is an order-
    * independent ADDITIVE digest, so partial checksums merge). Each row
    * contributes the first 32 bits of md5(key || '|' || payload); the sum
    * (exact in both engines, cast back to BIGINT) plus row count and key
    * range identify a divergent partition in one scan — then only the
    * mismatched partition needs a row-level diff. Row-local + one
    * partial-aggregating shuffle on the partition key.
    */
  def tableChecksum(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_rows"),
        // concat (NOT concat_ws): null-propagating like the oracle's `||`,
        // so a NULL payload nulls the row digest in BOTH engines instead
        // of silently dropping the separator on one side only
        sum(conv(substring(md5(concat(col("doc_id").cast("string"),
          lit("|"), col("text"))), 1, 8), 16, 10).cast("long"))
          .cast("long").as("checksum"),
        min("doc_id").as("min_doc"),
        max("doc_id").as("max_doc"))
      .orderBy("source")

  /** Referential-integrity audit across the star schema: for each
    * FK-relation, the child row count, the count of child rows whose key
    * dangles (no parent — a LEFT ANTI join), and the distinct dangling
    * key count. The load-validation pass a warehouse runs after every
    * ingest; all integers. Plan shape: one anti join per relation — the
    * parent key columns are small (keys only, projected before the join)
    * so every build side broadcasts; child tables are scanned once per
    * relation with only the FK column read (columnar pruning). At 100 TB
    * the same audit runs with the big-parent relations falling back to
    * shuffled anti joins — semantics unchanged.
    */
  def fkIntegrity(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val part = Tables.part(spark, sfDir)
    val supp = Tables.supplier(spark, sfDir)
    val nat = Tables.nation(spark, sfDir)
    def rel(name: String, child: DataFrame, fk: String,
            parent: DataFrame, pk: String): DataFrame = {
      val keys = child.select(col(fk).as("k"))
      val dangling = keys.join(
        broadcast(parent.select(col(pk).as("k")).distinct()),
        Seq("k"), "left_anti")
      keys.agg(count(lit(1)).as("n_child"))
        .crossJoin(dangling.agg(count(lit(1)).as("n_dangling"),
          countDistinct(col("k")).as("n_dangling_keys")))
        .select(lit(name).as("relation"), col("n_child"),
          col("n_dangling"), col("n_dangling_keys"))
    }
    rel("lineitem.orderkey->orders", li, "l_orderkey", orders, "o_orderkey")
      .unionByName(rel("lineitem.partkey->part", li, "l_partkey",
        part, "p_partkey"))
      .unionByName(rel("lineitem.suppkey->supplier", li, "l_suppkey",
        supp, "s_suppkey"))
      .unionByName(rel("orders.custkey->customer", orders, "o_custkey",
        cust, "c_custkey"))
      .unionByName(rel("customer.nationkey->nation", cust, "c_nationkey",
        nat, "n_nationkey"))
      .orderBy("relation")
  }

  /** The one-row DATASET CARD a curation pipeline publishes with a
    * training corpus (the HF dataset-card / Datasheets-for-Datasets
    * summary, re-expressed as a query): corpus size, source/language
    * breadth, token volume and vocabulary, exact-duplicate and
    * near-duplicate document counts, and the chars/4 token estimate the
    * packing planner budgets with. All integers; near-dup membership
    * comes from the MEMOIZED connected-component labels (shared with
    * dedup_clusters / curation_pipeline — the expensive pair pipeline
    * runs once per process), so the card costs two corpus scans (field
    * profile + token explode) plus three broadcast-combined scalars.
    */
  def datasetCard(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val toks = docs
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct("source").as("n_sources"),
      countDistinct("lang").as("n_langs"),
      (count(lit(1)) - countDistinct(md5(col("text"))))
        .as("exact_dup_docs"),
      sum(ceil(col("n_chars") / 4.0).cast("long")).cast("long")
        .as("est_tokens"))
    val tok = toks.agg(count(lit(1)).as("total_tokens"),
      countDistinct("t").as("vocab_size"))
    val nd = Dedup.clusterLabels(spark, sfDir)
      .filter(col("node") =!= col("label"))
      .agg(count(lit(1)).as("near_dup_docs"))
    base.crossJoin(tok).crossJoin(nd)
      .select(col("n_docs"), col("n_sources"), col("n_langs"),
        col("total_tokens"), col("vocab_size"), col("est_tokens"),
        col("exact_dup_docs"), col("near_dup_docs"))
  }
}
