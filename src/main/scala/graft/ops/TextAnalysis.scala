package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators over `documents` — the training-data pipeline
  * surface: token counting, quality scoring, language-ID heuristics, and
  * content fingerprinting. All scores are quotients of exact integer counts
  * (deterministic across engines; see [[Num]]).
  */
object TextAnalysis {

  private[graft] val stopwords =
    Seq("the", "a", "of", "and", "to", "in", "is")

  /** Array-function battery over the token array — the collection-typed
    * scalar surface (§2.8 sibling of `scalar_funcs`): distinct, sort,
    * slice, join, position, membership, and set-difference/intersection
    * sizes, all row-local and integer/string-valued so every value is
    * engine-exact. Set-op outputs are SIZES (element order inside
    * array_except/intersect differs across engines; cardinality doesn't).
    */
  def arrayFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    val ws = split(col("text"), " ")
    val stop = array(Seq("the", "a", "of").map(lit(_)): _*)
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        size(ws).as("n_tokens"),
        size(array_distinct(ws)).as("n_distinct"),
        element_at(array_sort(ws), 1).as("first_sorted"),
        element_at(array_sort(ws), size(ws)).as("last_sorted"),
        array_position(ws, "the").cast("long").as("pos_the"),
        array_contains(ws, "data").cast("int").as("has_data"),
        array_join(slice(ws, 2, 3), "_").as("mid3"),
        size(array_except(ws, stop)).as("n_except_stop"),
        size(array_intersect(array_distinct(ws), stop)).as("n_stop_kinds"))
      .orderBy("doc_id")
  }

  /** Ordered collection aggregates — collect_set / collect_list with a
    * deterministic presentation (sorted, then joined): per lang the sorted
    * distinct source list as CSV and the three smallest doc_ids. This is
    * the LISTAGG/string_agg surface; sorting before joining is what makes
    * a set-valued aggregate oracle-checkable (collect order is
    * partition-dependent, the sorted projection is not).
    *
    * Both collected sets are BOUNDED before collection — collect_set over
    * the small source vocabulary, collect_list only over rank ≤ 3 rows
    * (a row_number window, early-stoppable) — never an unbounded
    * collect-then-slice, which would buffer every doc_id per group at
    * corpus scale.
    */
  def collectSources(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val first3 = docs
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy("doc_id")))
      .filter(col("rk") <= 3)
      .groupBy("lang")
      .agg(array_join(
        transform(array_sort(collect_list(col("doc_id"))), _.cast("string")),
        ",").as("first_doc_ids"))
    docs.groupBy("lang")
      .agg(
        countDistinct("source").as("n_sources"),
        array_join(array_sort(collect_set(col("source"))), ",")
          .as("sources_csv"),
        count(lit(1)).as("n_docs"))
      .join(first3, "lang")
      .select(col("lang"), col("n_sources"), col("sources_csv"),
        col("first_doc_ids"), col("n_docs"))
      .orderBy("lang")
  }

  private def toks(textCol: Column): Column = split(textCol, " ")

  /** Token counting: whitespace tokens plus a BPE-ish subword estimate
    * (ceil(chars/4), the common ~4-chars-per-token heuristic) — both exact
    * integer functions of the text.
    */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"), col("lang"),
        size(toks(col("text"))).as("n_tokens"),
        size(array_distinct(toks(col("text")))).as("n_distinct_tokens"),
        length(col("text")).as("n_chars_measured"),
        ceil(length(col("text")) / 4.0).cast("long").as("n_subword_est"))
      .orderBy("doc_id")

  /** Quality scoring (length / punctuation / stopword / repetition
    * signals). Every ratio is int/int; the composite score is a fixed
    * arithmetic combination of those quotients.
    */
  def qualityScores(spark: SparkSession, sfDir: String): DataFrame = {
    val t = toks(col("text"))
    val nTok = size(t).cast("double")
    val nStop = size(filter(t, w => w.isin(stopwords.map(lit(_)): _*)))
      .cast("double")
    val nDistinct = size(array_distinct(t)).cast("double")
    val nPunct = (length(col("text")) -
      length(regexp_replace(col("text"), "[\\.,;:!\\?]", ""))).cast("double")
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        size(t).as("n_tokens"),
        (nStop / nTok).as("stopword_ratio"),
        (nDistinct / nTok).as("distinct_ratio"),
        (nPunct / length(col("text")).cast("double")).as("punct_ratio"),
        (length(col("text")).cast("double") / nTok).as("avg_token_len"))
      .withColumn("quality_score",
        col("distinct_ratio") * 0.5 +
          least(col("stopword_ratio") * 2.0, lit(1.0)) * 0.3 +
          when(col("n_tokens") >= 20 && col("n_tokens") <= 1000, 0.2)
            .otherwise(0.0))
      .orderBy("doc_id")
  }

  /** Language-ID heuristic: stopword-hit ratios per language profile (the
    * classic cheap n-gram/stopword classifier). On this fixture corpus the
    * vocabulary is shared across langs, so the value of the operator is its
    * deterministic semantics, summarized as a (lang, predicted) confusion
    * count.
    */
  def langIdConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    val t = toks(col("text"))
    def hitRatio(words: Seq[String]): Column =
      size(filter(t, w => w.isin(words.map(lit(_)): _*))).cast("double") /
        size(t).cast("double")
    val en = hitRatio(Seq("the", "a", "of", "and"))
    val dataish = hitRatio(Seq("table", "row", "column", "value"))
    Tables.documents(spark, sfDir)
      .withColumn("predicted",
        when(en >= 0.05, "en")
          .when(dataish >= 0.15, "data")
          .otherwise("other"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  }

  /** Gopher-style repetition signals (Rae et al. 2021, app. A1.1): the
    * share of a document occupied by its most frequent word 2-gram, plus
    * the duplicate-word fraction — high values flag boilerplate and spam
    * for quality filtering. The top gram is argmax by count with a
    * lexicographic tiebreak (min over struct(-count, gram)), so the result
    * is a pure function of the text. Per-doc gram fan-out is row-local;
    * the (doc, gram) count and per-doc argmax are each one doc-keyed
    * shuffle with map-side partial aggregation — the standard two-stage
    * count/argmax at any scale.
    */
  def repetitionSignals(spark: SparkSession, sfDir: String): DataFrame = {
    val sized = Tables.spread(Tables.documents(spark, sfDir))
      .select(col("doc_id"), toks(col("text")).as("ws"))
      .select(col("doc_id"), size(col("ws")).as("n_tokens"),
        size(array_distinct(col("ws"))).as("n_distinct"), col("ws"))
      .filter(col("n_tokens") >= 2)
    val grams = sized.select(col("doc_id"), col("n_tokens"), col("n_distinct"),
      explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> concat(ws[i], ' ', ws[i+1]))"))
        .as("g"))
    val counts = grams.groupBy("doc_id", "g")
      .agg(first("n_tokens").as("n_tokens"), first("n_distinct").as("n_distinct"),
        count(lit(1)).as("c"))
    counts.groupBy("doc_id")
      .agg(first("n_tokens").as("n_tokens"), first("n_distinct").as("n_distinct"),
        min(struct((-col("c")).as("nc"), col("g").as("g"))).as("top"))
      .select(col("doc_id"), col("n_tokens"),
        col("top.g").as("top_2gram"), (-col("top.nc")).as("top_2gram_n"),
        ((-col("top.nc")).cast("double") / (col("n_tokens") - 1))
          .as("top_2gram_share"),
        ((col("n_tokens") - col("n_distinct")).cast("double") / col("n_tokens"))
          .as("dup_word_fraction"))
      .orderBy("doc_id")
  }

  /** Unigram-rarity quality signal (the deterministic core of CCNet-style
    * LM filtering, Wenzek et al. 2019): score each document by how common
    * its tokens are corpus-wide. Instead of a log-probability (libm `ln`
    * differs in the last ulp across engines), the signals are exact
    * integer statistics: the mean corpus occurrence count of the doc's
    * tokens and the count of its rarest token (the OOV-proxy a rarity
    * gate thresholds on). Two shuffles: the global frequency count and
    * the doc re-aggregation; the frequency table joins back
    * broadcast-size for any real vocabulary (heavy-tail cutoffs would
    * bound it further at 100 TB).
    */
  def unigramRarity(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.spread(Tables.documents(spark, sfDir))
      .select(col("doc_id"), explode(toks(col("text"))).as("w"))
    val dfreq = t.groupBy("w").agg(count(lit(1)).as("df"))
    t.join(dfreq, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("df").as("sum_df"),
        min("df").as("min_token_df"))
      .select(col("doc_id"), col("n_tokens"),
        (col("sum_df").cast("double") / col("n_tokens")).as("avg_token_df"),
        col("min_token_df"))
      .orderBy("doc_id")
  }

  /** Corpus length histogram: document counts and char mass per
    * fixed-width n_chars bucket — the length-distribution profile every
    * curation run reports before choosing min/max-length gates. One
    * group-by on a derived bucket key; bucket cardinality is bounded by
    * max(n_chars)/width regardless of corpus size.
    */
  def lengthHistogram(spark: SparkSession, sfDir: String,
                      bucketWidth: Int = 50): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(expr(s"(n_chars div $bucketWidth) * $bucketWidth").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"),
        sum("n_chars").as("sum_chars"))
      .orderBy("bucket")

  /** Text normalization battery — the cleaning pass a pretraining pipeline
    * runs before tokenization: lowercase, strip non-alphanumerics to
    * spaces, collapse whitespace runs, trim. Reports per-lang how much the
    * corpus changes under normalization (docs touched, char mass before /
    * after, token count after) — the "what did cleaning cost us"
    * accounting. Row-local string kernels only (codegen built-ins): a
    * scan, not a job, at any corpus size. Regex classes are pure-ASCII
    * (`[^a-z0-9 ]`, `" +"`) so Java and RE2 semantics coincide — the
    * corpus is ASCII (checked), and a unicode corpus would swap in ICU
    * forms on both sides.
    */
  def textClean(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("cleaned",
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " ")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cleaned") =!= col("text"), 1L).otherwise(0L))
          .as("n_changed"),
        sum(length(col("text"))).as("sum_len_raw"),
        sum(length(col("cleaned"))).as("sum_len_clean"),
        sum(size(split(col("cleaned"), " "))).as("sum_tokens_clean"))
      .orderBy("lang")

  /** Gate bounds for [[qualityFilterFunnel]], hoisted so the operator and
    * its oracle interpolate the SAME constants (the DsirBuckets
    * anti-drift discipline). Every gate is an exact integer
    * cross-multiplication of the published ratio thresholds:
    * token count ∈ [Min,Max]; mean chars-per-token (separator included)
    * ∈ [5, 6]; ≥ 1 profile stopword; duplicate-word fraction ≤ 3/5;
    * top-2-gram share ≤ 1/8.
    */
  val FunnelMinTokens: Int = 20
  val FunnelMaxTokens: Int = 1000

  /** Gopher-style sequential quality-filter funnel (Rae et al. 2021,
    * app. A1.1 — public method): apply the repetition/length/stopword
    * gates IN ORDER and report, per stage, how many documents enter, how
    * many the gate kills (among those that survived every earlier gate),
    * and how many continue — the "what did each filter cost us" funnel
    * accounting every curation run publishes next to its corpus card.
    * Stage 0 is the survivor row (docs passing all gates, with their
    * token mass — the corpus the pipeline would keep).
    *
    * Every gate is an exact integer comparison (cross-multiplied ratios,
    * never a float quotient), so the gate booleans — and therefore the
    * funnel counts — are bit-identical in any engine. The first-failing-
    * stage attribution makes the stages sum exactly to the corpus total
    * (each doc killed exactly once), which the oracle re-derives.
    *
    * Scale shape: gates 1–4 are row-local scans; the top-2-gram gate is
    * the [[repetitionSignals]] shape (row-local gram fan-out, one
    * doc-keyed partial-agg shuffle); the funnel itself collapses to ONE
    * aggregate row unpivoted into six bounded rows — nothing about the
    * composition adds a shuffle beyond the repetition signal it reuses.
    */
  def qualityFilterFunnel(spark: SparkSession, sfDir: String): DataFrame =
    funnelPresent(funnelAggregate(funnelFirstFail(spark,
      Tables.spread(Tables.documents(spark, sfDir)))))

  /** Per-doc first-failing-gate attribution — the gate definitions live
    * HERE and only here; the batch funnel and the streaming probe both
    * consume this frame (input needs doc_id, text, n_chars). Stage 0 =
    * survivor.
    *
    * Every gate is ROW-LOCAL — including the top-2-gram repetition gate,
    * which runs in the [[graft.functions.TopNgramCount]] codegen kernel
    * (max gram multiplicity is a per-doc property; the explode →
    * (doc, gram) shuffle → re-aggregate formulation pays a corpus
    * shuffle for what one hash map over the doc's own grams computes in
    * place). The whole attribution is therefore a SCAN: the funnel costs
    * one 1-row aggregate on top, nothing else, at any corpus size.
    */
  private[graft] def funnelFirstFail(spark: SparkSession,
                                     docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    docs
      .select(col("doc_id"), length(col("text")).as("len"),
        toks(col("text")).as("ws"), col("text"), col("n_chars"))
      .select(col("doc_id"), col("len"), col("n_chars"),
        size(col("ws")).as("nt"),
        size(array_distinct(col("ws"))).as("nd"),
        size(array_intersect(array_distinct(col("ws")),
          array(stopwords.map(lit(_)): _*))).as("n_stop_kinds"),
        call_function("top_ngram_count", col("text"), lit(2)).as("topn"))
      .select(col("doc_id"), col("n_chars"),
        (col("nt") >= FunnelMinTokens && col("nt") <= FunnelMaxTokens)
          .as("g1"),
        (col("len") >= col("nt") * 5 && col("len") <= col("nt") * 6)
          .as("g2"),
        (col("n_stop_kinds") > 0).as("g3"),
        ((col("nt") - col("nd")) * 5 <= col("nt") * 3).as("g4"),
        (col("topn") * 16 <= col("nt") - 1).as("g5"))
      .withColumn("first_fail",
        when(!col("g1"), 1).when(!col("g2"), 2).when(!col("g3"), 3)
          .when(!col("g4"), 4).when(!col("g5"), 5).otherwise(0))
  }

  /** The 1-row funnel aggregate over a first-fail frame. ADDITIVE: partial
    * aggregates of disjoint doc slices sum componentwise to the corpus
    * aggregate — which is what lets the streaming probe fold per-batch
    * partials on readback ([[graft.streaming.StreamAssembly]]).
    */
  private[graft] def funnelAggregate(flags: DataFrame): DataFrame =
    flags.agg(
      count(lit(1)).as("total"),
      sum(when(col("first_fail") === 1, 1L).otherwise(0L)).as("k1"),
      sum(when(col("first_fail") === 2, 1L).otherwise(0L)).as("k2"),
      sum(when(col("first_fail") === 3, 1L).otherwise(0L)).as("k3"),
      sum(when(col("first_fail") === 4, 1L).otherwise(0L)).as("k4"),
      sum(when(col("first_fail") === 5, 1L).otherwise(0L)).as("k5"),
      sum(when(col("first_fail") === 0,
        ceil(col("n_chars") / 4.0).cast("long")).otherwise(0L))
        .as("survivor_tokens"))

  /** Unpivot the 1-row funnel aggregate into the 6 presentation rows. */
  private[graft] def funnelPresent(agg: DataFrame): DataFrame =
    agg.select(expr(
      """stack(6,
        |  1, 'tokens_range',   total,                k1, CAST(0 AS BIGINT),
        |  2, 'avg_word_len',   total-k1,             k2, CAST(0 AS BIGINT),
        |  3, 'stopword_hit',   total-k1-k2,          k3, CAST(0 AS BIGINT),
        |  4, 'dup_word_frac',  total-k1-k2-k3,       k4, CAST(0 AS BIGINT),
        |  5, 'top_2gram_share',total-k1-k2-k3-k4,    k5, CAST(0 AS BIGINT),
        |  6, 'survivors',      total-k1-k2-k3-k4-k5, CAST(0 AS BIGINT),
        |     survivor_tokens)
        |  AS (stage, gate, n_in, n_killed, sum_est_tokens)""".stripMargin))
      .withColumn("n_out", (col("n_in") - col("n_killed")).cast("long"))
      .select(col("stage").cast("long").as("stage"), col("gate"),
        col("n_in").cast("long").as("n_in"),
        col("n_killed").cast("long").as("n_killed"), col("n_out"),
        col("sum_est_tokens"))
      .orderBy("stage")

  /** Document fingerprinting: canonical md5 over normalized tokens (lower,
    * collapse whitespace) — duplicate fingerprints = normalized dups. The
    * 64-bit rolling-hash variant (a native Catalyst expression with
    * codegen) lives in [[graft.functions.RollingHash]]; this query uses the
    * md5 canonical form for oracle portability.
    */
  def fingerprints(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        md5(array_join(split(lower(col("text")), "\\s+"), " "))
          .as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min("doc_id").as("first_doc"), count(lit(1)).as("n_docs"))
      .orderBy("fingerprint")
}
