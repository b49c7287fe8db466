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

  /** l-diversity audit (Machanavajjhala et al. 2006 — the k-anonymity
    * follow-on: a QI class whose members all share one SENSITIVE value
    * re-identifies the attribute even when the class is k-large): per
    * quasi-identifier class (nation, balance band), the distinct count
    * of the sensitive attribute (market segment) and the dominant
    * value's share in exact integer ppm — the homogeneity signal
    * behind recursive (c, l)-diversity. Flags classes below `l`. Same
    * scale shape as the k audit: one shuffle on the QI tuple, class
    * count bounded by the QI domain product.
    */
  def lDiversity(spark: SparkSession, sfDir: String, l: Int = 3): DataFrame =
    Tables.customer(spark, sfDir)
      .select(col("c_nationkey"),
        band500(col("c_acctbal")).as("acctbal_band"),
        col("c_mktsegment"))
      .groupBy("c_nationkey", "acctbal_band", "c_mktsegment")
      .agg(count(lit(1)).as("sn"))
      .groupBy("c_nationkey", "acctbal_band")
      .agg(sum(col("sn")).cast("long").as("n"),
        count(lit(1)).as("l_distinct"),
        max(col("sn")).cast("long").as("top_sens"))
      .withColumn("top_share_ppm",
        expr("CAST(CAST(top_sens AS DECIMAL(38,0)) * 1000000 DIV n" +
          " AS BIGINT)"))
      .withColumn("under_l", when(col("l_distinct") < l, 1).otherwise(0))
      .select(col("c_nationkey"), col("acctbal_band"), col("n"),
        col("l_distinct"), col("top_sens"), col("top_share_ppm"),
        col("under_l"))
      .orderBy("c_nationkey", "acctbal_band")

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007 — the
    * l-diversity follow-on: a class can be diverse yet still SKEWED
    * far from the corpus baseline, leaking probabilistic information):
    * per QI class, the total-variation distance between the class's
    * sensitive-value distribution and the global one, kept EXACT by
    * cross-multiplication — ½·Σ|sn·N − gn·n| over segments, reported
    * as integer ppm of n·N — so both engines fold the same integers
    * and the gate hashes. Classes beyond `tPpm` flagged. The global
    * distribution is a 5-row broadcast; absent segments contribute
    * their full global mass, which the class × segment spine (class
    * frame ⨯ broadcast segment frame) makes explicit.
    */
  def tCloseness(spark: SparkSession, sfDir: String,
                 tPpm: Long = 300000L): DataFrame = {
    val base = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"),
        band500(col("c_acctbal")).as("acctbal_band"),
        col("c_mktsegment"))
    val global = base.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("gn"))
    val classes = base.groupBy("c_nationkey", "acctbal_band")
      .agg(count(lit(1)).as("n"))
    val classSeg = base.groupBy("c_nationkey", "acctbal_band",
        "c_mktsegment")
      .agg(count(lit(1)).as("sn"))
    val bigN = global.agg(sum(col("gn")).as("corpus_n"))
    classes
      .crossJoin(broadcast(global))
      .join(classSeg, Seq("c_nationkey", "acctbal_band", "c_mktsegment"),
        "left_outer")
      .crossJoin(broadcast(bigN))
      .groupBy("c_nationkey", "acctbal_band")
      .agg(first(col("n")).as("n"),
        sum(abs(coalesce(col("sn"), lit(0L)).cast("decimal(38,0)") *
            col("corpus_n") - col("gn").cast("decimal(38,0)") * col("n")))
          .as("l1_num"),
        first(col("corpus_n")).as("bigN"))
      .withColumn("t_ppm", expr(
        "CAST(l1_num * 1000000 DIV (2 * CAST(n AS DECIMAL(38,0)) * bigN)" +
          " AS BIGINT)"))
      .withColumn("over_t", when(col("t_ppm") > tPpm, 1).otherwise(0))
      .select(col("c_nationkey"), col("acctbal_band"), col("n"),
        col("t_ppm"), col("over_t"))
      .orderBy("c_nationkey", "acctbal_band")
  }

  /** ε for [[dpNoisyCounts]] in exact integer micro-units (1e6 = 1.0) —
    * env-knobbed like the other release constants; the oracle
    * interpolates the same value at object init, so one JVM run can
    * never see drifted budgets.
    */
  val DpEpsMicro: Int = graft.EnvKnobs.posInt("GRAFT_DP_EPS_MICRO", 1000000)

  /** DIFFERENTIALLY-PRIVATE count release — the completion of the
    * privacy progression (redact → k-anonymity → l-diversity →
    * t-closeness → DP): per-source document counts with seeded Laplace
    * noise at sensitivity 1 (one document moves one count by one), the
    * standard ε-DP counting mechanism (Dwork et al. 2006, public
    * method). The randomness is the repo's md5 coin, NOT an RNG — the
    * release is a pure function of (corpus, ε, salt), which is what
    * makes it HASH-GATABLE while keeping the mechanism's exact shape:
    *
    *  - u ∈ (0, 1): h = first 48 bits of md5("dp:" ‖ source), and
    *    u = (h + ½)/2^48 — the ½ keeps u off 0 AND ½, so sign and log
    *    are always defined; (2h + 1 − 2^48) is an odd integer, exact in
    *    a double, and w = 1 − 2·|u − ½| = (2^48 − |2h+1−2^48|)/2^48 is
    *    an integer over a power of two: bit-exact in both engines;
    *  - Laplace inverse CDF: noise = −b·sgn(u − ½)·ln(w) with
    *    b = 1/ε (one IEEE division, correctly rounded identically);
    *    ln through [[graft.functions.PortableLn]] (the engine-portable
    *    +−×/ ladder), then FLOORED to integer micro-units at source;
    *  - the released value is noisy_u = n·1e6 + noise_u, integer.
    *
    * A production release would not also emit the exact count — this
    * gate does (the audit posture: the oracle must verify the noise
    * math, and the exact column is what every recall/err audit in the
    * repo already carries). At 100 TB the plan is one groupBy over the
    * corpus plus 14 narrow projections on a |sources|-row frame.
    */
  def dpNoisyCounts(spark: SparkSession, sfDir: String,
                    epsMicro: Int = DpEpsMicro): DataFrame = {
    val counts = Tables.spread(Tables.documents(spark, sfDir))
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    val two48 = 1L << 48
    val withW = counts
      .withColumn("h", conv(substring(md5(
        concat(lit("dp:"), col("source"))), 1, 12), 16, 10).cast("long"))
      .withColumn("num", lit(2L) * col("h") + lit(1L) - lit(two48))
      .withColumn("sgn", when(col("num") > 0, lit(1.0)).otherwise(lit(-1.0)))
      .withColumn("w",
        (lit(two48) - abs(col("num"))).cast("double") /
          lit(two48.toDouble))
    graft.functions.PortableLn.withLn(withW, "w", "lnw")
      .withColumn("noise_u",
        floor((lit(0.0) - (lit(1e6) / lit(epsMicro.toDouble))) *
          col("sgn") * col("lnw") * lit(1e6)).cast("long"))
      .select(col("source"), lit(epsMicro.toLong).as("eps_micro"),
        col("n_docs"),
        col("noise_u"),
        (col("n_docs") * lit(1000000L) + col("noise_u")).as("noisy_u"))
      .orderBy("source")
  }
}
