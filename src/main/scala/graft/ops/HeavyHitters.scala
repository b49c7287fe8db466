package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact distributed heavy hitters via the two-pass Misra-Gries scheme:
  *
  *   1. a bounded-memory MG sketch (k counters) over the stream — its
  *      merge is a counter-sum followed by the MG decrement-trim, and the
  *      classic guarantee survives arbitrary merge trees: every item with
  *      true frequency > N/k is IN the surviving counter set, whatever
  *      order partitions combine in (Misra & Gries 1982; Agarwal et al.,
  *      "Mergeable Summaries", PODS'12);
  *   2. an exact recount of ONLY the candidate set (a broadcast semi
  *      filter, one aggregate over matching rows), which removes the
  *      sketch's overestimates.
  *
  * Output = items with frequency ≥ `thresholdPerMille`/1000 of the total,
  * with EXACT counts — deterministic even though intermediate sketch
  * contents are partition-order dependent, because pass 2 recounts and
  * the guarantee makes pass 1 a superset of the answer whenever
  * k ≥ 1000/thresholdPerMille. At 100 TB this is the standard shape:
  * the sketch shuffles k counters per partition instead of the full key
  * space, and only candidates (≤ k) are ever recounted exactly.
  */
object HeavyHitters {

  /** Misra-Gries sketch aggregator over String items: at most k surviving
    * counters; reduce = increment-or-admit-or-decrement, merge =
    * counter-sum then trim to the top-k by (count, key) with the
    * (k+1)-th count subtracted — the mergeable-summaries form.
    */
  class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    private def trim(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= k) m
      else {
        // subtract the (k+1)-th largest count from everyone, drop <= 0
        val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
        m.collect { case (w, c) if c - cut > 0 => w -> (c - cut) }
      }
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], w: String): Map[String, Long] =
      trim(b.updated(w, b.getOrElse(w, 0L) + 1L))
    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
      trim(y.foldLeft(x) { case (m, (w, c)) =>
        m.updated(w, m.getOrElse(w, 0L) + c)
      })
    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] = bufferEncoder
  }

  /** Tokens covering ≥ thresholdPerMille/1000 of the corpus token mass,
    * with exact counts and shares. The integer cross-multiplied threshold
    * (c·1000 ≥ t·total) keeps the gate exact in both engines.
    */
  def heavyHitterTokens(spark: SparkSession, sfDir: String,
                        thresholdPerMille: Long = 34L,
                        k: Int = 64): DataFrame = {
    import spark.implicits._
    require(k >= (1000L + thresholdPerMille - 1) / thresholdPerMille,
      "MG guarantee needs k >= 1000/thresholdPerMille")
    val toks = Tables.spread(Tables.documents(spark, sfDir))
      .select(explode(split(col("text"), " ")).as("w"))
    // sketch AND total in ONE typed aggregate pass (two corpus scans per
    // query total: this one + the exact recount). The 1-row result is
    // eagerly localCheckpointed so its two readers never re-run the pass;
    // the pinned state is a single row, not a cached dataset per call.
    val pass1 = toks.as[String]
      .groupByKey(_ => 0) // one global sketch; partials merge map-side
      .agg(new MisraGries(k).toColumn.name("mg"),
        count(lit(1)).as("total").as[Long])
      .localCheckpoint(true)
    val sketch = pass1.flatMap { case (_, m, _) => m.keys }.toDF("w")
    val total = pass1.map { case (_, _, t) => t }.toDF("total")
    toks.join(broadcast(sketch), Seq("w"), "left_semi")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") * 1000L >= col("total") * thresholdPerMille)
      .select(col("w").as("token"), col("n"),
        (col("n").cast("double") / col("total")).as("share"))
      .orderBy(desc("n"), asc("token"))
  }

  /** Count-min sketch geometry (Cormode & Muthukrishnan 2005): d rows
    * of w counters; est(x) = min_i grid[i][h_i(x)] ≥ true count, with
    * overestimate ≤ e·N/w at probability 1 − e^(−d). Width is
    * env-knobbed like the IVF-PQ cells (the oracle interpolates the
    * same constant at object init); production sets GRAFT_CMS_WIDTH ∝
    * N/ε. The grid is the POINT-QUERY mergeable sketch next to the
    * Misra-Gries candidate sketch above: MG answers "which items are
    * heavy", CMS answers "how heavy is x" — and CMS partials merge by
    * plain ADDITION, which is what makes it the per-micro-batch /
    * per-partition aggregation structure at 100 TB.
    */
  val CmsDepth: Int = 4
  val CmsWidth: Int = graft.EnvKnobs.posInt("GRAFT_CMS_WIDTH", 1024)

  /** Row-i counter position of token `w` — the md5 draw both engines
    * replay.
    */
  private def cmsPos(i: org.apache.spark.sql.Column,
                     w: org.apache.spark.sql.Column) =
    pmod(conv(substring(md5(concat_ws("#", i, w)), 1, 8), 16, 10)
      .cast("long"), lit(CmsWidth.toLong))

  /** The d×w counter grid over a token frame (column `w`) — one
    * aggregate, partial map-side combine, result bounded at d·w rows
    * at ANY corpus size (the broadcast side of every point query).
    */
  private[graft] def cmsOf(toks: DataFrame): DataFrame =
    toks
      .select(explode(sequence(lit(0), lit(CmsDepth - 1))).as("i"),
        col("w"))
      .select(col("i"), cmsPos(col("i"), col("w")).as("pos"))
      .groupBy("i", "pos")
      .agg(count(lit(1)).as("cnt"))

  /** CMS point estimates for a token frame (column `token`) against a
    * grid — k-fan-out broadcast lookups, min over rows. Shared by the
    * batch audit and the streaming-partials gate. The lookup is a LEFT
    * join with empty cells counting as 0: for a token the sketch never
    * saw, the true CMS estimate is the min over its cells INCLUDING
    * the unpopulated ones (i.e. 0) — an inner join would inflate the
    * min to the smallest populated collision, or drop the token
    * entirely. Current gated callers only probe tokens drawn from the
    * sketched stream (every cell populated, left ≡ inner), but the
    * helper's contract must hold for unseen probes too.
    */
  private[graft] def cmsEstimate(tokens: DataFrame,
                                 grid: DataFrame): DataFrame =
    tokens
      .withColumn("i", explode(sequence(lit(0), lit(CmsDepth - 1))))
      .withColumn("pos", cmsPos(col("i"), col("token")))
      .join(broadcast(grid), Seq("i", "pos"), "left_outer")
      .groupBy("token")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))

  private def corpusTokens(spark: SparkSession, sfDir: String,
                           filter: org.apache.spark.sql.Column): DataFrame = {
    // installs RewriteMd5Bucket so the k·tokens coin draws run fused
    graft.functions.GraftFunctions.register(spark)
    Tables.spread(Tables.documents(spark, sfDir))
      .filter(filter)
      .select(explode(split(col("text"), " ")).as("w"))
  }

  /** THE CMS AUDIT — the Bloom-tier discipline applied to counting:
    * build the grid over the corpus token stream, take the exact top-k
    * tokens, and report exact count vs CMS estimate side by side. The
    * sketch's one-sided guarantee (est ≥ exact, the mirror of Bloom's
    * no-false-negatives) is asserted in spec; the OVERESTIMATE column
    * is what prices the d×w memory trade before anyone serves counts
    * from the sketch at scale. All integers, both engines replaying
    * the same md5 positions and min-folds.
    */
  def cmsHeavyAudit(spark: SparkSession, sfDir: String,
                    topN: Int = 50): DataFrame = {
    val toks = corpusTokens(spark, sfDir, lit(true))
    val grid = cmsOf(toks)
    val exact = toks.groupBy(col("w").as("token"))
      .agg(count(lit(1)).as("exact"))
      .orderBy(desc("exact"), asc("token"))
      .limit(topN)
    cmsEstimate(exact, grid)
      .join(exact, "token")
      .select(col("token"), col("exact"), col("cms_est"),
        (col("cms_est") - col("exact")).as("overestimate"))
      .orderBy(desc("exact"), asc("token"))
  }

  /** Bottom-k size of the KMV sketch; production sizes k by the target
    * relative standard error (≈ 1/√k — k=1024 gives ~3%). */
  val KmvK: Int = graft.EnvKnobs.posInt("GRAFT_KMV_K", 1024)

  /** 48-bit md5 draw (12 hex chars): wide enough that collisions are
    * negligible at any fixture scale, narrow enough that the KMV
    * numerator (k−1)·2^48 still fits a BIGINT both engines divide with
    * exact integer semantics. */
  private[graft] def h48(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** THE KMV DISTINCT-COUNT AUDIT — the order-statistics member of the
    * bounded-structure family (Bloom answers "seen before?", CMS "how
    * many of x?", MG "which items are heavy?"; KMV answers "how many
    * DISTINCT items?" from k rows of state): keep the k minimum hash
    * values of the distinct-shingle stream, and the k-th smallest
    * h_(k) estimates the distinct count as D̂ = (k−1)·2^48 / h_(k)
    * (Bar-Yossef et al. 2002 — the sketch inside BJKST and the Theta
    * family). Bottom-k merges EXACTLY — bottom-k(A∪B) =
    * bottom-k(bottom-k(A) ∪ bottom-k(B)) — so at 100 TB each executor
    * ships k rows and a coordinator folds, no rate retuning as the
    * corpus grows. The stream counted here is the 8-gram shingle set,
    * because that is the count a production pipeline needs BEFORE it
    * can build anything: the Bloom decontamination filter
    * ([[graft.ops.TrainingSets.bloomContamination]]) is sized
    * m ≈ 10·n_distinct_shingles — KMV prices n from k rows of state
    * without materializing the set it is sizing a filter for. The
    * audit reports the estimate against the exact distinct count with
    * the error in integer ppm; the estimator is integer long division
    * end to end, so the gate hashes exactly. When k exceeds the
    * stream's distinct count the sketch holds everything and the
    * answer is exact (k_eff < k branch).
    */
  def kmvDistinctShingles(spark: SparkSession, sfDir: String,
                          k: Int = KmvK): DataFrame = {
    // (k−1)·2^48 must fit a BIGINT: (2^15)·2^48 = 2^63 is the first
    // value past Long range, so k caps at 2^15 (still a 0.6% rse —
    // production never needs more)
    require(k <= (1 << 15), s"KMV k=$k overflows the 2^48-scaled numerator")
    graft.functions.GraftFunctions.register(spark)
    val sh = Tables.spread(Tables.documents(spark, sfDir))
      .select(explode(Dedup.shingleCol(col("text"), 8)).as("s"))
    val hs = sh.select(h48(col("s")).as("h")).distinct()
    // TakeOrderedAndProject: per-partition top-k, one driver-side fold
    // of k·partitions rows — never a full sort
    val sketch = hs.orderBy("h").limit(k)
      .agg(count(lit(1)).as("k_eff"), max("h").as("h_k"))
    val exact = sh.select("s").distinct()
      .agg(count(lit(1)).as("d_exact"))
    sketch.crossJoin(broadcast(exact))
      .withColumn("d_est",
        when(col("k_eff") < k, col("k_eff"))
          .otherwise(expr(s"(${k - 1}L * ${1L << 48}L) div h_k")))
      .select(lit(k.toLong).as("k"), col("k_eff"), col("h_k"),
        col("d_est"), col("d_exact"),
        // degenerate-corpus guard: DuckDB's `//` raises on /0 while
        // Spark's `div` yields NULL — pin both engines to 0 instead
        expr("CASE WHEN d_exact = 0 THEN 0L ELSE " +
          "(abs(d_est - d_exact) * 1000000L) div d_exact END")
          .as("err_ppm"))
  }
}
