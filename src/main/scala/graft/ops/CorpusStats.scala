package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-level statistical operators for training-data curation: Zipf
  * rank/frequency profiling and count-based bigram language-model scoring
  * (the KenLM-style perplexity filter of LLM data pipelines, re-expressed
  * with exact integer arithmetic so the DuckDB gate can hash-check it).
  *
  * Reference tie-in: the reference corpus profile lives in dashboards
  * (`Sample_Dashboard.png`); these are the text-corpus analogues of its
  * revenue histograms.
  */
object CorpusStats {

  /** Zipf profile of the token distribution: every token with its corpus
    * frequency, rank (1 = most frequent), and the rank×frequency product
    * (flat ⇔ Zipfian; Zipf, 1949 — public knowledge). The fixture vocab
    * is 31 tokens, so the global rank window is a single tiny partition
    * by construction — the heavy work is the token count, a map-side
    * partial aggregate over the exploded token stream. At 100 TB the
    * vocab of a whitespace corpus stays bounded (≪ shuffle partition
    * size); a byte-BPE vocab is likewise ≤ ~256k rows. All columns are
    * integers — exact in both engines.
    */
  def tokenZipf(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
    // global window over the vocab-sized frame only (31 rows here; ≤ 256k
    // for a BPE vocab) — never over the token stream itself
    val w = Window.orderBy(desc("freq"), asc("token"))
    counts
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("token"), col("freq"),
        (col("freq") * col("rank")).as("freq_rank"))
      .orderBy("rank")
  }

  /** Vocabulary coverage quantiles — the tokenizer-sizing statistic (how
    * many distinct tokens cover 50/90/99% of corpus token mass; the
    * curve every vocab/BPE-size decision reads). Tokens rank by
    * frequency desc; the cumulative-mass window runs over the
    * VOCAB-bounded frame only (same discipline as [[tokenZipf]]); the
    * coverage thresholds compare `cum·100 ≥ total·pct` in exact integer
    * arithmetic — no float division anywhere in the gate.
    */
  def vocabCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
    val total = counts.agg(sum("freq").cast("long").as("total"))
    val w = Window.orderBy(desc("freq"), asc("token"))
    val ranked = counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum", sum("freq").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
    def covered(pct: Int): Column =
      min(when(col("cum") * 100 >= col("total") * pct, col("rank")))
    ranked.crossJoin(broadcast(total))
      .agg(max("rank").as("vocab_size"),
        max("cum").as("total_tokens"),
        covered(50).as("r50"), covered(90).as("r90"),
        covered(99).as("r99"))
  }

  /** Token co-occurrence pairs — the association-mining / PMI-table shape
    * (which terms appear in the same documents): per-doc DISTINCT tokens
    * self-joined on doc_id (w1 < w2 orients each unordered pair once),
    * counted across the corpus, top-k by document count with a full
    * deterministic tie-break. Per-doc fan-out is bounded by the distinct
    * token count per document, and the pair frame is vocab²-bounded — the
    * same discipline as [[tokenZipf]]; an open-vocabulary corpus would cap
    * the per-doc token set by document frequency first (the prefix-filter
    * trick of [[Dedup.ngramJaccardPairs]]).
    */
  def tokenCooccurrence(spark: SparkSession, sfDir: String,
                        k: Int = 20): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
      .filter(length(col("w")) > 0)
    val pairs = toks.as("a")
      .join(toks.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
      .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
      .agg(count(lit(1)).as("n_docs"))
    // top-k via sort-limit → TakeOrderedAndProject: per-partition
    // partial top-k, k rows to the driver-side merge — the pair frame
    // (which grows with corpus breadth) never funnels through a
    // single-partition global window. The rank window below runs over
    // the k-row RESULT only (constant-bounded), never the pair frame.
    val top = pairs
      .orderBy(desc("n_docs"), asc("w1"), asc("w2"))
      .limit(k)
    top
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("n_docs"), asc("w1"), asc("w2"))).cast("long"))
      .select(col("rank"), col("w1"), col("w2"), col("n_docs"))
      .orderBy("rank")
  }

  /** TF-IDF-style salient terms per language — the corpus-signature view
    * (which terms characterize each language slice). Weighting is the
    * integer surrogate score = tf × ((1000·N) div df): the idf factor is
    * a milli-precision rational of exact integers instead of ln(N/df), so
    * the ranking is engine-exact (same monotone ordering for the fixture's
    * frequency range; a float-idf variant would differ only in weighting,
    * not plumbing). Plan: one corpus-wide df aggregate (vocab-sized,
    * broadcast back), one per-(lang, term) tf aggregate, and a top-k rank
    * window over the vocab×lang frame — the token stream shuffles once.
    */
  def tfidfTerms(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.agg(count(lit(1)).as("n_total"))
    val toks = docs
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val df = toks.groupBy("term")
      .agg(countDistinct("doc_id").as("df"))
    val tf = toks.groupBy("lang", "term")
      .agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy("lang")
      .orderBy(desc("score"), asc("term"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * expr("(1000 * n_total) div df"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("lang"), col("rk"), col("term"), col("tf"), col("df"),
        col("score"))
      .orderBy("lang", "rk")
  }

  /** Count-based bigram LM scoring per document — the shape of a
    * perplexity quality filter: build the corpus bigram model (counts),
    * score every document's bigrams against it, flag improbable text. To
    * stay hash-identical across engines the log-probability is computed
    * in INTEGER arithmetic: floor(log2 c) = bitlength(c) − 1 via the
    * binary string length (`bin`), so
    * `lp2 = Σ (floorlog2 c(w1,w2) − floorlog2 c(w1))` is an exact
    * whole-bit log-likelihood (a production filter would use float
    * log-probs + a KenLM model; the plumbing — n-gram explode, model
    * join, per-doc re-aggregate — is identical). `n_rare` counts bigrams
    * seen ≤ `rareMax` times corpus-wide (median fixture bigram count is
    * 29).
    *
    * Scale posture: the bigram model is vocab² ≤ tiny (961 here; ≤ a few
    * M for real vocabs) — it BROADCASTS, so scoring is one map-side join
    * per bigram occurrence plus the per-doc re-aggregate on doc_id; the
    * model build itself is a map-side partial count. Bigram extraction
    * runs in the [[graft.functions.WordNgrams]] codegen kernel
    * (multiplicity kept — the interpreted HOF formulation pays the
    * per-element boxing pathology documented in TextExpressions).
    */
  def bigramLm(spark: SparkSession, sfDir: String,
               rareMax: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val docBi = Tables.spread(Tables.documents(spark, sfDir))
      .select(col("doc_id"),
        explode(call_function("word_ngrams", col("text"), lit(2))).as("bg"))
    def floorLog2(c: org.apache.spark.sql.Column) =
      (length(bin(c)) - lit(1)).cast("long")
    val c12 = docBi.groupBy(col("bg").as("m_bg"))
      .agg(count(lit(1)).as("c12"))
    // context counts re-aggregate from the vocab²-sized model — every
    // bigram starting with w1 was already counted there, so a second pass
    // over the corpus bigram stream would recount what c12 knows
    val c1 = c12
      .groupBy(substring_index(col("m_bg"), " ", 1).as("m_w1"))
      .agg(sum(col("c12")).as("c1"))
    docBi
      .join(broadcast(c12), col("bg") === col("m_bg"))
      .join(broadcast(c1), substring_index(col("bg"), " ", 1) === col("m_w1"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(floorLog2(col("c12")) - floorLog2(col("c1"))).cast("long")
          .as("lp2_sum"),
        sum(when(col("c12") <= rareMax, lit(1)).otherwise(lit(0)))
          .cast("long").as("n_rare"))
      .orderBy("doc_id")
  }

  /** The first iteration of BPE tokenizer training (Sennrich et al. 2016,
    * public knowledge): corpus-wide frequencies of adjacent character
    * pairs within whitespace words — the statistic whose argmax picks the
    * first merge. Counts weight every word OCCURRENCE (a tokenizer trains
    * on the corpus distribution, not the vocabulary), all integers, so the
    * gate is exact. Plan shape: the pair stream is row-local
    * (split → explode → `transform(sequence(...))` explode, all inside
    * whole-stage codegen), then ONE partial-aggregating shuffle on the
    * pair key (alphabet²-bounded ≤ a few k keys) and a sort-limit
    * (TakeOrderedAndProject) for the top-k — nothing funnels through a
    * single partition, so the plan is 100 TB-shaped; full BPE = iterate
    * this with the winning pair folded in.
    */
  def bpePairCounts(spark: SparkSession, sfDir: String,
                    k: Int = 25): DataFrame = {
    val words = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
    val pairs = words
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n"))
    val top = pairs.orderBy(desc("n"), asc("pair")).limit(k)
    top
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("n"), asc("pair"))).cast("long"))
      .select(col("rank"), col("pair"), col("n"))
      .orderBy("rank")
  }

  /** Spearman rank correlation between document length (n_chars) and
    * vocabulary richness (distinct token count) — the corpus-diagnostic
    * correlation ("are longer docs just repetitive?"), with the ENTIRE
    * gate in exact integers: ranks are row_numbers over the deterministic
    * (metric, doc_id) order, Σd² is a BIGINT, and ρ is reported as the
    * exact ppm floor of 1 − 6Σd²/(n(n²−1)). The two rank windows are
    * global but this op is a CORPUS-LEVEL diagnostic the analyst runs on
    * a sample/stratum; at full-corpus scale the same Σd² computes from
    * bucket-offset ranks ([[graft.ops.Analytics.globalRankDocs]]'s
    * pattern) and the n³ term moves to DECIMAL.
    */
  def rankCorrelation(spark: SparkSession, sfDir: String): DataFrame = {
    val m = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"),
        size(array_distinct(split(col("text"), " "))).cast("long")
          .as("n_types"))
    val ranked = m
      .withColumn("r_chars", row_number().over(
        Window.orderBy(col("n_chars"), col("doc_id"))).cast("long"))
      .withColumn("r_types", row_number().over(
        Window.orderBy(col("n_types"), col("doc_id"))).cast("long"))
    ranked.agg(
      count(lit(1)).as("n"),
      sum((col("r_chars") - col("r_types")) *
        (col("r_chars") - col("r_types"))).cast("long").as("sum_d2"))
      .select(col("n"), col("sum_d2"),
        expr("1000000 - (6 * sum_d2 * 1000000) div (n * (n * n - 1))")
          .as("rho_ppm"))
  }

  /** Heaps'-law vocabulary growth curve: the corpus in doc_id order cut
    * into `nBuckets` equal prefixes, per bucket the token volume and the
    * count of NEW types (tokens whose corpus-wide first occurrence — the
    * min doc_id holding them — lands in that bucket), plus running
    * cumulatives. Sublinear cum_types growth is the Heaps signature; a
    * flat new_types tail is the classic "more data stops adding vocab"
    * curation signal. All integers. Plan shape: first occurrence is ONE
    * min-aggregate over the exploded token stream (map-side partial, one
    * shuffle on the vocab-bounded token key); bucketing re-aggregates the
    * vocab-sized frame to `nBuckets` rows, and the cumulative window runs
    * over those `nBuckets` rows only — never over the corpus.
    */
  def vocabGrowth(spark: SparkSession, sfDir: String,
                  nBuckets: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.agg(count(lit(1)).as("n_total"))
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    // token volume per bucket
    val vol = toks.crossJoin(broadcast(nDocs))
      .withColumn("bucket",
        least(expr(s"(doc_id * $nBuckets) DIV n_total"),
          lit(nBuckets - 1).cast("long")).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct("doc_id").as("n_docs"))
    // corpus-wide first occurrence per type, re-bucketed
    val firstOcc = toks.groupBy("token")
      .agg(min("doc_id").as("first_doc"))
      .crossJoin(broadcast(nDocs))
      .withColumn("bucket",
        least(expr(s"(first_doc * $nBuckets) DIV n_total"),
          lit(nBuckets - 1).cast("long")).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("new_types"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vol.join(firstOcc, Seq("bucket"), "left_outer")
      .na.fill(0L, Seq("new_types"))
      .select(col("bucket"), col("n_docs").cast("long").as("n_docs"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("new_types").cast("long").as("new_types"))
      .withColumn("cum_tokens", sum("n_tokens").over(w).cast("long"))
      .withColumn("cum_types", sum("new_types").over(w).cast("long"))
      .orderBy("bucket")
  }
}
