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

  /** Frequency-bucket offsets for rank/cumsum over a (token, freq) vocab
    * frame WITHOUT an unpartitioned window over it — the
    * [[Analytics.globalRankDocs]] bucket-offset discipline applied to the
    * vocabulary: bucket = the freq value itself (rank order is
    * freq desc, token asc, so equal-freq tokens form one bucket); the
    * prefix-sum windows run over the DISTINCT-freq bucket-count frame
    * only (⌈log-ish⌉ rows — power-law corpora have few distinct
    * frequencies relative to vocab size), and the per-token local rank is
    * freq-partitioned, parallel across buckets. `offset` is the rank
    * offset, `mass_before` the cumulative token mass of strictly more
    * frequent buckets.
    */
  private def freqBucketOffsets(counts: DataFrame): DataFrame = {
    val wDesc = Window.orderBy(desc("freq"))
      .rowsBetween(Window.unboundedPreceding, -1)
    counts.groupBy("freq").agg(count(lit(1)).as("cnt"))
      .withColumn("offset",
        coalesce(sum("cnt").over(wDesc), lit(0L)).cast("long"))
      .withColumn("mass_before",
        coalesce(sum(col("freq") * col("cnt")).over(wDesc), lit(0L))
          .cast("long"))
  }

  /** Zipf profile of the token distribution: every token with its corpus
    * frequency, rank (1 = most frequent), and the rank×frequency product
    * (flat ⇔ Zipfian; Zipf, 1949 — public knowledge). The heavy work is
    * the token count, a map-side partial aggregate over the exploded
    * token stream; the global rank is bucket-offset
    * ([[freqBucketOffsets]]): rank = bucket offset + freq-partitioned
    * local rank, so NO unpartitioned window ever consumes the vocab frame
    * — an open (BPE/byte-ngram) vocabulary ranks in parallel. All columns
    * are integers — exact in both engines.
    */
  def tokenZipf(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
    val offsets = freqBucketOffsets(counts).select("freq", "offset")
    counts.join(broadcast(offsets), Seq("freq"))
      .withColumn("rank",
        (col("offset") + row_number().over(
          Window.partitionBy("freq").orderBy("token"))).cast("int"))
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
    val offsets = freqBucketOffsets(counts)
    // corpus total rides out of the bucket-count frame (its last
    // cumulative), not a second pass over the token stream
    val total = offsets
      .agg(max(col("mass_before") + col("freq") * col("cnt")).as("total"))
    // rank = offset + freq-local rank; cum follows in closed form (every
    // token in a freq bucket adds exactly `freq`), so BOTH the rank and
    // the running-mass window are bucket-offset — no unpartitioned window
    // touches the vocab frame
    val ranked = counts
      .join(broadcast(offsets.select("freq", "offset", "mass_before")),
        Seq("freq"))
      .withColumn("local_rn", row_number().over(
        Window.partitionBy("freq").orderBy("token")).cast("long"))
      .withColumn("rank", col("offset") + col("local_rn"))
      .withColumn("cum", col("mass_before") + col("freq") * col("local_rn"))
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
    * not plumbing).
    *
    * Scale posture (no vocab-sized broadcast, no vocab-sized window
    * partition): tf ⋈ df is a SHUFFLE join on the term key — an open
    * (BPE/byte-ngram) vocabulary's df table outgrows any broadcast
    * threshold, and both vocab-keyed aggregates hash-partition on term
    * anyway, so the join co-locates without a broadcast build. The
    * per-lang top-k is two-phase salted: a first rank window partitioned
    * by (lang, salt(term)) keeps every window partition
    * vocab/`salts`-bounded (size the salt count to the executor at
    * deployment), and since a language's true top-k terms are each top-k
    * within their own salt bucket, the ≤ salts·k survivors per lang feed
    * the exact final rank — a constant-bounded frame.
    */
  def tfidfTerms(spark: SparkSession, sfDir: String, k: Int = 5,
                 salts: Int = 16): DataFrame = {
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
    val scored = tf.join(df.hint("shuffle_hash"), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * expr("(1000 * n_total) div df"))
    val cand = scored
      .withColumn("salt", pmod(crc32(col("term")), lit(salts)))
      .withColumn("rk1", row_number().over(
        Window.partitionBy("lang", "salt")
          .orderBy(desc("score"), asc("term"))))
      .filter(col("rk1") <= k)
    cand
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(desc("score"), asc("term")))
        .cast("long"))
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
    val docBi = docBigramStream(spark, sfDir)
    def floorLog2(c: org.apache.spark.sql.Column) =
      (length(bin(c)) - lit(1)).cast("long")
    val c12 = bigramModel(spark, sfDir)
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

  /** Per-doc (doc_id, source, bg) bigram occurrence stream — row-local
    * ([[graft.functions.WordNgrams]] codegen kernel), shared by both LM
    * scorers. NOT memoized: it is corpus-sized; only the vocab²-bounded
    * model below is.
    */
  private def docBigramStream(spark: SparkSession,
                              sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.spread(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("source"),
        explode(call_function("word_ngrams", col("text"), lit(2))).as("bg"))
  }

  private val bigramModelCache =
    graft.ops.Memo.registry[(SparkSession, String)]

  /** The corpus bigram model `(m_bg, c12)` — vocab²-bounded — memoized per
    * (session, corpus): the model TRAINS once per run and every scoring
    * consumer ([[bigramLm]], [[lmPerplexityBands]]) reuses the
    * checkpointed frame, the production LM-filter shape (train the KenLM
    * once, score with it everywhere). Bench passes drop this via
    * [[Memo.clearAll]] so timings stay honest.
    */
  private def bigramModel(spark: SparkSession, sfDir: String): DataFrame =
    bigramModelCache.getOrElseUpdate((spark, sfDir),
      docBigramStream(spark, sfDir)
        .groupBy(col("bg").as("m_bg"))
        .agg(count(lit(1)).as("c12"))
        .localCheckpoint(true))

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

  /** Merge-round count for [[bpeTrainMerges]] — interpolated into the
    * registered DuckDB oracle (unrolled CTE rounds) so operator and
    * oracle cannot drift. Must stay ≤ the corpus's merge capacity:
    * the Spark loop stops early if a round finds no remaining pair
    * (keeping the word frame intact), while the unrolled oracle CTEs
    * would degenerate to empty past that point — the fixture corpora
    * support far more than 24 merges, so both engines always run the
    * full count. At a production vocabulary (32k merges) the
    * one-merge-per-round driver loop is the bottleneck —
    * [[bpeTrainMergesBatched]] is the O(merges/batchSize)-job-waves
    * path for that regime.
    */
  val BpeMergeRounds: Int = 24

  /** FULL BPE tokenizer training (Sennrich et al. 2016, public method):
    * [[BpeMergeRounds]] greedy merge rounds, each re-counting adjacent
    * symbol pairs over the corpus word distribution, picking the argmax
    * (ties broken lexicographically — deterministic in both engines),
    * and folding the winning merge into every word before the next
    * round. Output: the ordered merge table (rank, pair, count) — the
    * artifact a tokenizer build ships.
    *
    * Words are held as delimiter-wrapped symbol strings (`|a||b||c|`),
    * so the merge step is ONE non-overlapping left-to-right
    * `replace(s, '|l||r|', '|lr|')` — the exact greedy-scan semantics
    * BPE specifies, and bit-identical in Spark and DuckDB (the oracle
    * unrolls the same rounds as generated CTEs over the same strings;
    * safe because the corpus alphabet is [a-z0-9]). All counts integer —
    * float-free gate.
    *
    * Scale shape: the iterative-driver-loop discipline of
    * [[graft.ops.Dedup.starContractionLabels]]: state lives in a
    * VOCABULARY-sized frame (distinct words × counts — corpus volume
    * collapses in the first aggregate, the tokenizer-training shape at
    * any corpus size), each round is one pair-keyed partial-agg shuffle
    * + a 1-row sort-limit argmax broadcast back (never a driver
    * collect of data), with `localCheckpoint` truncating lineage per
    * round exactly like the CC loop.
    */
  def bpeTrainMerges(spark: SparkSession, sfDir: String,
                     rounds: Int = BpeMergeRounds): DataFrame =
    bpeLoopCached(spark, sfDir, rounds)._1.orderBy("rank")

  /** The tokenizer APPLIED back to the corpus — the other half of the
    * build loop ([[bpeTrainMerges]] produces the merge table; this
    * reports what it does to the corpus): after [[BpeMergeRounds]]
    * merges, the distribution of tokens-per-word across word
    * OCCURRENCES, plus the symbol mass each bucket carries before (one
    * symbol per char) and after merging — the compression accounting a
    * tokenizer build signs off on. All integers; the oracle extends the
    * same unrolled CTE chain with this final aggregate.
    */
  def bpeTokenizeStats(spark: SparkSession, sfDir: String,
                       rounds: Int = BpeMergeRounds): DataFrame = {
    val words = bpeLoopCached(spark, sfDir, rounds)._2
    // s = "|t1||t2||…||tk|" ⇒ length(s) = chars + 2k, so chars =
    // length(s) − 2·tokens (merges concatenate, never add/remove chars)
    words
      .select(col("cnt"),
        size(split(trim(col("s"), "|"), "\\|\\|")).cast("long")
          .as("tokens_per_word"),
        (length(col("s")) -
          lit(2) * size(split(trim(col("s"), "|"), "\\|\\|"))).cast("long")
          .as("n_chars"))
      .groupBy("tokens_per_word")
      .agg(count(lit(1)).as("n_words"),
        sum("cnt").cast("long").as("n_occurrences"),
        sum(col("cnt") * col("n_chars")).cast("long").as("char_mass"),
        sum(col("cnt") * col("tokens_per_word")).cast("long")
          .as("token_mass"))
      .orderBy("tokens_per_word")
  }

  /** Per-source BPE compression — tokenizer "fertility" by domain (the
    * chars-per-token rate the NMT/tokenizer literature tracks per
    * language/domain; a source whose rate is near 1 is being split to
    * characters — the trained vocabulary doesn't fit it). Joins the
    * per-(source, word) occurrence counts against the POST-MERGE word
    * frame (the original word is recoverable from the symbol string —
    * merges concatenate, never alter chars), so the report prices the
    * SAME trained tokenizer [[bpeTokenizeStats]] histograms, per
    * source. All-integer; the ppm rate is one floor-division of
    * positive masses.
    *
    * Scale shape: one (source, word) map-side-combined count; the
    * tokenized vocab joins as a broadcast here (open-vocabulary scale
    * would make it a word-keyed shuffle join — same topology); pays the
    * memoized merge loop once across its three consumers.
    */
  def bpeCompressionBySource(spark: SparkSession, sfDir: String,
                             rounds: Int = BpeMergeRounds): DataFrame = {
    val words = bpeLoopCached(spark, sfDir, rounds)._2
    val wt = words.select(
      regexp_replace(col("s"), "\\|", "").as("word"),
      size(split(trim(col("s"), "|"), "\\|\\|")).cast("long").as("tpw"))
    val sw = Tables.documents(spark, sfDir)
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("source", "word").agg(count(lit(1)).cast("long").as("c"))
    sw.join(broadcast(wt), Seq("word"))
      .withColumn("chars", length(col("word")).cast("long"))
      .groupBy("source")
      .agg(sum("c").cast("long").as("n_word_occurrences"),
        sum(col("c") * col("chars")).cast("long").as("char_mass"),
        sum(col("c") * col("tpw")).cast("long").as("token_mass"))
      .withColumn("chars_per_token_ppm",
        expr("(char_mass * 1000000) DIV token_mass").cast("long"))
      .orderBy("source")
  }

  /** [[bpeLoop]] memoized per (session, sfDir, rounds) — the loop's
    * checkpointed state serves both the merge-table and tokenize-stats
    * queries, so within a bench pass the 24 iterative rounds run once
    * (the [[graft.ops.Dedup.ngramJaccardPairs]] discipline; the two
    * cached frames are the merge union and the post-merge word frame,
    * both already materialized by `localCheckpoint`).
    */
  private def bpeLoopCached(spark: SparkSession, sfDir: String,
                            rounds: Int): (DataFrame, DataFrame) = {
    val key = (spark, sfDir, rounds)
    (bpeMergeCache.get(key), bpeWordCache.get(key)) match {
      case (Some(m), Some(w)) => (m, w)
      case _ =>
        val (bests, words) = bpeLoop(spark, sfDir, rounds)
        // reduceOption: a corpus of only single-symbol words yields zero
        // merge rounds (see the exhaustion guard in bpeLoop)
        val merges = bests.reduceOption(_ unionByName _).getOrElse(
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("rank",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("pair",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("n",
                org.apache.spark.sql.types.LongType)))))
        bpeMergeCache.put(key, merges)
        bpeWordCache.put(key, words)
        (merges, words)
    }
  }

  private val bpeMergeCache =
    graft.ops.Memo.registry[(SparkSession, String, Int)]
  private val bpeWordCache =
    graft.ops.Memo.registry[(SparkSession, String, Int)]

  /** The corpus word distribution in delimiter-wrapped symbol form
    * (`|a||b||c|`) — shared by the sequential ([[bpeLoop]]) and batched
    * ([[bpeTrainMergesBatched]]) trainers so the encoding lives in one
    * place (the spec-pinned batchSize=1 equivalence depends on it).
    */
  private def bpeWordFrame(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), concat(lit("|"),
        expr("array_join(transform(sequence(1, length(w))," +
          " i -> substring(w, i, 1)), '||')"), lit("|")).as("s"))
      .localCheckpoint(true)

  /** Occurrence-weighted adjacent-pair counts over a word frame —
    * the per-round counting stage both trainers share; callers append
    * their own argmax / candidate-pool sort-limit.
    */
  private def bpePairCounts(words: DataFrame): DataFrame =
    words
      .select(col("cnt"), split(trim(col("s"), "|"), "\\|\\|").as("syms"))
      // single-symbol words carry no pair; Spark's sequence(1, 0) would
      // DESCEND ([1,0]) rather than return empty, so filter explicitly
      // (DuckDB's generate_series(1, 0) is already empty)
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, size(syms) - 1)," +
          " i -> struct(syms[i-1] AS l, syms[i] AS r))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("cnt").cast("long").as("n"))

  /** The shared merge loop: returns (per-round 1-row best frames with
    * rank/pair/n columns, the post-merge word frame (cnt, s)).
    */
  private def bpeLoop(spark: SparkSession, sfDir: String,
                      rounds: Int): (Seq[DataFrame], DataFrame) = {
    var words = bpeWordFrame(spark, sfDir)
    val bests = Seq.newBuilder[DataFrame]
    var i = 1
    var exhausted = false
    while (i <= rounds && !exhausted) {
      val best = bpePairCounts(words)
        .orderBy(desc("n"), asc("l"), asc("r")).limit(1)
      // FUSED round (guide §2.4 / r18 verdict item): the argmax rides
      // the SAME execution as the word rebuild — broadcast into the
      // crossJoin and carried through as constant columns — so each
      // round materializes ONE checkpoint instead of two (the argmax
      // subtree executes inside the broadcast exchange). Every fused
      // row carries the identical (bl, br, n), so any row reproduces
      // the old 1-row best frame exactly.
      //
      // Guard: a corpus can run out of mergeable pairs before `rounds`
      // (every word reduced to one symbol). An empty `best` empties the
      // fused crossJoin — stop merging instead and keep the final word
      // frame intact (the fused frame's isEmpty is a cheap local scan
      // on the checkpointed RDD; non-empty words × non-empty best is
      // never empty, so exhaustion here means exactly "best was
      // empty"). The unrolled DuckDB oracle still assumes rounds ≤ the
      // corpus's merge capacity — see BpeMergeRounds.
      val fused = words
        .crossJoin(broadcast(best.select(col("l").as("bl"),
          col("r").as("br"), col("n"))))
        .select(col("cnt"), expr(
          "replace(s, concat('|', bl, '||', br, '|')," +
            " concat('|', bl, br, '|'))").as("s"),
          col("bl"), col("br"), col("n"))
        .localCheckpoint(true)
      if (fused.isEmpty) { exhausted = true }
      else {
        bests += fused.limit(1).select(lit(i.toLong).as("rank"),
          concat_ws(" ", col("bl"), col("br")).as("pair"), col("n"))
        words = fused.select("cnt", "s")
      }
      i += 1
    }
    (bests.result(), words)
  }

  /** BATCHED BPE training — the production-vocabulary-size path. The
    * sequential loop ([[bpeLoop]]) launches a fixed number of Spark jobs
    * PER MERGE; at a 32k-merge production vocabulary that is a
    * driver-loop bottleneck (32k sequential job waves). The standard
    * batching trick (used by every large-scale BPE trainer): per round,
    * select the top `batchSize` pairs by count that are pairwise
    * NON-INTERACTING (no shared symbol — merging `a b` cannot create,
    * destroy, or re-span an occurrence of `c d` when {a,b}∩{c,d}=∅), and
    * fold them all into the corpus in ONE pass. Job count becomes
    * O(rounds) = O(merges / batchSize). The result is the batched-BPE
    * merge table: within a round, selected pairs' counts are all
    * round-start counts (they cannot interact), so each round's merges
    * are exactly a valid greedy prefix under the freeze; across rounds
    * the table can deviate from strict 1-at-a-time greedy only where a
    * JUST-MERGED token would have immediately out-counted a batch
    * member — the documented batched-BPE approximation.
    *
    * Scale shape: candidate pool is a vocabulary-scale sort-limit
    * (`4·batchSize` rows); greedy selection runs INSIDE one executor
    * partition (never a driver collect); the fold-apply is a single
    * codegen'd `aggregate` expression over the broadcast merge array —
    * one job wave per round regardless of batchSize (spec-pinned via a
    * job-counting listener; batchSize=1 reproduces [[bpeTrainMerges]]
    * exactly, also spec-pinned).
    *
    * Output: (round, rank, pair, n) — rank is the global merge rank
    * across rounds, so `batchSize=1` output aligns with
    * [[bpeTrainMerges]]'s (rank, pair, n) modulo the round column.
    */
  def bpeTrainMergesBatched(spark: SparkSession, sfDir: String,
                            rounds: Int, batchSize: Int): DataFrame = {
    import spark.implicits._
    var words = bpeWordFrame(spark, sfDir)
    val out = Seq.newBuilder[DataFrame]
    var round = 1
    var rankBase = 0L
    var exhausted = false
    while (round <= rounds && !exhausted) {
      // round-start pair counts, pooled to 4×batch candidates (greedy
      // selection can skip at most batchSize-1 interacting better pairs
      // per accept in the worst case; 4× is comfortable for real corpora
      // and the selection degrades gracefully — an under-filled batch
      // just merges fewer pairs this round)
      val cand = bpePairCounts(words)
        .orderBy(desc("n"), asc("l"), asc("r")).limit(4 * batchSize)
      // greedy non-interacting selection on ONE executor partition over
      // the bounded candidate pool — same locality class as the 1-row
      // argmax, never a driver collect
      val m = batchSize
      val sel = cand.coalesce(1)
        .as[(String, String, Long)]
        .mapPartitions { it =>
          val used = scala.collection.mutable.HashSet.empty[String]
          val picked = scala.collection.mutable.ArrayBuffer
            .empty[(Int, String, String, Long)]
          it.foreach { case (l, r, n) =>
            if (picked.length < m && !used(l) && !used(r)) {
              picked += ((picked.length + 1, l, r, n))
              // block the pair's symbols AND its concatenation: a later
              // candidate whose symbol equals an earlier pick's merged
              // token would match occurrences CREATED mid-round by the
              // fold, breaking the round-start count freeze
              used += l; used += r; used += (l + r)
            }
          }
          picked.iterator
        }
        .toDF("bi", "l", "r", "n")
        .localCheckpoint(true)
      if (sel.isEmpty) { exhausted = true }
      else {
        out += sel.select((lit(round.toLong)).as("round"),
          (lit(rankBase) + col("bi")).as("rank"),
          concat_ws(" ", col("l"), col("r")).as("pair"), col("n"))
        rankBase += sel.count()
        // ONE fold expression applies the whole batch in rank order
        val merges = sel.agg(collect_list(struct(
          col("bi"), col("l"), col("r"))).as("ms"))
        words = words
          .crossJoin(broadcast(merges))
          .select(col("cnt"), expr(
            """aggregate(array_sort(ms, (x, y) -> x.bi - y.bi), s,
              |  (acc, x) -> replace(acc,
              |    concat('|', x.l, '||', x.r, '|'),
              |    concat('|', x.l, x.r, '|')))""".stripMargin).as("s"))
          .localCheckpoint(true)
      }
      round += 1
    }
    out.result().reduceOption(_ unionByName _).getOrElse(
      spark.emptyDataset[(Long, Long, String, Long)]
        .toDF("round", "rank", "pair", "n"))
      .orderBy("rank")
  }

  /** Spearman rank correlation between document length (n_chars) and
    * vocabulary richness (distinct token count) — the corpus-diagnostic
    * correlation ("are longer docs just repetitive?"), with the ENTIRE
    * gate in exact integers: ranks are row_numbers over the deterministic
    * (metric, doc_id) order, Σd² is a BIGINT, and ρ is reported as the
    * exact ppm floor of 1 − 6Σd²/(n(n²−1)). BOTH ranks are bucket-offset
    * ([[graft.ops.Analytics.globalRankDocs]]'s pattern): bucket by the
    * metric value (bounded cardinality — char lengths and type counts),
    * prefix-sum the bucket counts (a window over bucket-count rows only),
    * then rank locally within each bucket partition — identical ranks to
    * a global `row_number` by construction, with no unpartitioned window
    * over the document frame. At full-corpus scale the n³ ppm term moves
    * to DECIMAL.
    */
  def rankCorrelation(spark: SparkSession, sfDir: String): DataFrame = {
    val m = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"),
        size(array_distinct(split(col("text"), " "))).cast("long")
          .as("n_types"))
    // rank by (metric, doc_id) = bucket offset + doc_id-ordered local rank
    def bucketRank(df: DataFrame, metric: String, out: String): DataFrame = {
      val offsets = df.groupBy(metric).agg(count(lit(1)).as("cnt"))
        .withColumn("offset",
          coalesce(sum("cnt").over(
            Window.orderBy(metric).rowsBetween(
              Window.unboundedPreceding, -1)), lit(0L)).cast("long"))
        .select(col(metric), col("offset"))
      df.join(broadcast(offsets), Seq(metric))
        .withColumn(out,
          col("offset") + row_number().over(
            Window.partitionBy(metric).orderBy("doc_id")).cast("long"))
        .drop("offset")
    }
    val ranked = bucketRank(bucketRank(m, "n_chars", "r_chars"),
      "n_types", "r_types")
    ranked.agg(
      count(lit(1)).as("n"),
      sum((col("r_chars") - col("r_types")) *
        (col("r_chars") - col("r_types"))).cast("long").as("sum_d2"))
      .select(col("n"), col("sum_d2"),
        // int128-wide Spearman ppm: 6·Σd²·1e6 (and n³ itself past ~2M
        // rows) overflow BIGINT — found by the 20× fresh-fixture gate;
        // DECIMAL(38,0) keeps every intermediate exact, DIV floors, the
        // oracle mirrors through HUGEINT
        expr("CAST(1000000 - (CAST(6 AS DECIMAL(38,0)) * sum_d2 * 1000000)" +
          " DIV (CAST(n AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) * n" +
          " - 1)) AS BIGINT)").as("rho_ppm"))
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

  /** Perplexity band cutoffs for [[lmPerplexityBands]], in micro-nats of
    * average per-bigram negative log-likelihood — hoisted so operator and
    * oracle interpolate the SAME constants (the DsirBuckets anti-drift
    * discipline). Chosen to split the fixture corpus near its tertiles;
    * a production run would fit them on a held-out slice once and pin
    * them exactly like this (CCNet publishes its cutoffs per language).
    */
  val LmPpxHeadMicro: Long = 3374000L
  val LmPpxMiddleMicro: Long = 3399000L

  /** CCNet-style LM perplexity gate (Wenzek et al. 2019, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data",
    * arXiv:1911.00359 — public method): score every document by its
    * average per-bigram negative log-likelihood under a corpus bigram
    * model (Laplace-smoothed), then band the corpus into the published
    * head / middle / tail quality tiers at fixed cutoffs. Reported per
    * (source, band): doc and bigram counts plus the exact summed score
    * mass, so a mixture decision ("train on head+middle") reads straight
    * off the result.
    *
    * Determinism discipline (the [[TrainingSets.dsirImportance]] gate):
    * the only float work is ONE log per model bigram — vocab²-bounded —
    * and that log is [[graft.functions.PortableLn]] (only correctly-
    * rounded IEEE `+ - * /`, bit-identical cross-engine), floored to BIGINT
    * micro-nats at the source. Every downstream value (per-doc sums, the
    * integer-division average, band comparisons) is exact integer
    * arithmetic, so the hash gate has no boundary noise anywhere.
    * Smoothing: p(w2|w1) = (c12+1)/(c1+V) with V the corpus unigram
    * vocabulary; every scored bigram exists in the model by construction
    * (model and corpus are the same scan), so the unseen-bigram fallback
    * path never fires here — a held-out scorer would route those rows to
    * the 1/(c1+V) term the same way.
    *
    * Scale shape: bigram extraction is row-local ([[graft.functions
    * .WordNgrams]] codegen kernel); the model aggregates to ≤ vocab² rows
    * (map-side combine) and BROADCASTS back, so the corpus is shuffled
    * only by doc_id for the per-doc re-aggregate — one partial-agg
    * shuffle over the data at any corpus size, identical to the
    * production KenLM-scoring shape (model on every worker, one pass).
    */
  def lmPerplexityBands(spark: SparkSession, sfDir: String): DataFrame = {
    val docBi = docBigramStream(spark, sfDir)
    val c12 = bigramModel(spark, sfDir)
    val c1 = c12
      .groupBy(substring_index(col("m_bg"), " ", 1).as("m_w1"))
      .agg(sum(col("c12")).as("c1"))
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct("w").as("v"))
    // one portable ln per MODEL row, floored to micro-nats at the source:
    // everything after this line is exact integer arithmetic
    val modelX = c12
      .join(broadcast(c1), substring_index(col("m_bg"), " ", 1) === col("m_w1"))
      .crossJoin(broadcast(vocab))
      .select(col("m_bg"),
        ((col("c12") + 1L).cast("double") /
          (col("c1") + col("v")).cast("double")).as("x"))
    val terms = graft.functions.PortableLn.withLn(modelX, "x", "lnx")
      .select(col("m_bg"),
        (-floor(col("lnx") * lit(1e6))).cast("long").as("nll_micro"))
    val scored = docBi
      .join(broadcast(terms), col("bg") === col("m_bg"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("nll_micro").cast("long").as("nll_sum_micro"))
      .withColumn("avg_nll_micro",
        expr("nll_sum_micro DIV n_bigrams").cast("long"))
      .withColumn("band",
        when(col("avg_nll_micro") < LmPpxHeadMicro, "head")
          .when(col("avg_nll_micro") < LmPpxMiddleMicro, "middle")
          .otherwise("tail"))
    scored.groupBy("source", "band")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_bigrams").cast("long").as("sum_bigrams"),
        sum("nll_sum_micro").cast("long").as("sum_nll_micro"))
      .orderBy("source", "band")
  }

  /** Half-nat band width for [[textEntropyBands]], in micro-nats. */
  val EntropyBandMicro: Long = 500000L

  /** Shannon entropy of integer count groups, scaled exact: for each
    * key group of `cnt` (columns `keys` + a positive BIGINT `c`),
    * returns (keys…, n = Σc, ent_scaled = Σ c·(ln_micro(n) −
    * ln_micro(c))) — H·n in micro-nat·count units. The transcendental
    * work collapses to one [[graft.functions.PortableLn]] per DISTINCT
    * count value (a frame bounded by the largest group, broadcast into
    * both joins), floored to micro-nats at the source; floor is
    * monotone and n ≥ c, so every downstream difference and division
    * by n is nonnegative-exact. One definition serves
    * [[textEntropyBands]] (doc grain) and
    * [[TrainingSets.shardMixEntropy]] (shard grain) so the micro-nat
    * quantization contract lives in one place.
    */
  private[ops] def entropyScaled(cnt: DataFrame,
                                 keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    val tot = cnt.groupBy(kc: _*).agg(sum("c").cast("long").as("n"))
    val valsX = cnt.select(col("c").as("v"))
      .union(tot.select(col("n").as("v")))
      .distinct()
      .select(col("v"), col("v").cast("double").as("x"))
    val lnv = graft.functions.PortableLn.withLn(valsX, "x", "lnx")
      .select(col("v"), floor(col("lnx") * lit(1e6)).cast("long")
        .as("ln_micro"))
    val lnN = lnv.select(col("v").as("nv"), col("ln_micro").as("lnn"))
    cnt
      .join(broadcast(lnv), cnt("c") === lnv("v"))
      .select(kc :+ col("c") :+ col("ln_micro").as("lnc"): _*)
      .join(tot, keys)
      .join(broadcast(lnN), col("n") === col("nv"))
      .groupBy(kc :+ col("n"): _*)
      .agg(sum(col("c") * (col("lnn") - col("lnc"))).cast("long")
        .as("ent_scaled"))
  }

  /** Per-document token Shannon entropy, banded — the gibberish /
    * boilerplate detector of LLM curation stacks (low entropy = repeated
    * tokens, high = diverse vocabulary; standard information-theoretic
    * quality signal, Shannon 1948 — public knowledge).
    *
    * Exactness: H·len = Σ_w c_w·(ln len − ln c_w) needs only ln of
    * INTEGER token counts, so the transcendental work collapses to one
    * [[graft.functions.PortableLn]] per DISTINCT count value — a frame
    * bounded by the longest document, not the corpus — floored to
    * micro-nats and broadcast back. Every per-doc value (the
    * Σ c·(lnL−lnc) sum, the per-token micro-nat rate, the half-nat band
    * id) is then exact BIGINT arithmetic: lnL_micro ≥ lnc_micro because
    * floor is monotone and len ≥ c, so the rate DIV is
    * nonnegative-by-nonnegative everywhere and both engines agree.
    *
    * Scale shape: one corpus scan → (doc_id, w) map-side-combined
    * count → doc-level sum → band-count rows. The ln table is the
    * distinct-count-value frame (≤ max dl rows), built by its own tiny
    * aggregate and BROADCAST into both joins — no corpus-sized frame
    * ever meets the ladder.
    */
  def textEntropyBands(spark: SparkSession, sfDir: String): DataFrame = {
    val cnts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("doc_id", "w").agg(count(lit(1)).cast("long").as("c"))
    val ent = entropyScaled(cnts, Seq("doc_id"))
      .withColumnRenamed("n", "len")
      .withColumn("per_tok_micro", expr("ent_scaled DIV len").cast("long"))
      .withColumn("band",
        expr(s"per_tok_micro DIV $EntropyBandMicro").cast("long"))
    ent.groupBy("band")
      .agg(count(lit(1)).as("n_docs"),
        sum("len").cast("long").as("sum_tokens"),
        min("per_tok_micro").cast("long").as("min_ent_micro"),
        max("per_tok_micro").cast("long").as("max_ent_micro"))
      .orderBy("band")
  }

  /** Hash-bucket count for [[klSourceDrift]]'s token model — the
    * [[TrainingSets.DsirBuckets]] discipline (bounded model state at any
    * vocabulary size), hoisted so operator and oracle interpolate the
    * same constant. */
  val KlBuckets: Int = 64

  /** Pairwise Kullback–Leibler divergence between per-source token
    * distributions — the domain-drift / mixture-design statistic
    * (DoReMi-style domain reweighting reads exactly these pairwise
    * divergences; Kullback & Leibler 1951 — public knowledge). Tokens
    * hash into [[KlBuckets]] md5 buckets so the model is fixed-size at
    * any corpus scale; Laplace add-1 smoothing keeps every ratio
    * finite, including buckets a source never hits.
    *
    * Exactness: the per-(pair, bucket) log-ratio is one
    * [[graft.functions.PortableLn]] of an exact integer-product
    * quotient, floored to micro-nats; the reported divergence is the
    * UNNORMALIZED integer Σ_b (c_ab+1)·lw_b together with the smoothed
    * mass n_a + B it would be divided by — deliberately NOT divided,
    * because quantization can push a near-zero divergence a few
    * micro-nats negative and integer-division semantics on negatives
    * differ across engines; the two reported integers are exact and the
    * reader divides.
    *
    * Scale shape: corpus → (source, bucket) map-side-combined count
    * (S·B rows) → dense S×B grid (zero-filled via a broadcast
    * spark.range cross) → S²·B pair frame through the ladder — model
    * arithmetic only; the corpus is scanned once and never re-shuffled.
    * Int64 headroom: Σ_b (c+1)·|lw| ≤ n_s · max|lw| (~35e6 micro-nats),
    * so the accumulator is safe through ~2.6e11 tokens per source; a
    * larger corpus drops the micro scale one decade (one constant,
    * both engines) — the same headroom note as the DSIR estimator.
    */
  /** (source, bucket) token counts of a documents frame under the
    * [[KlBuckets]] md5 hash model — the map-side-combined model input
    * shared by [[klSourceDrift]] and the streaming drift probe (whose
    * per-batch partials are exactly these counts, additive across
    * batches). */
  private[graft] def tokenBucketCounts(docs: DataFrame): DataFrame = docs
    .select(col("source"), explode(split(col("text"), " ")).as("w"))
    .filter(length(col("w")) > 0)
    .select(col("source"),
      pmod(conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long"),
        lit(KlBuckets)).as("b"))
    .groupBy("source", "b").agg(count(lit(1)).cast("long").as("c"))

  /** Smoothed KL of each incoming source's bucket distribution against
    * ONE frozen history distribution (`hist`: per-bucket counts `ch`,
    * dense over all [[KlBuckets]] ids) — the drift-alarm core of the
    * streaming probe, same quantization contract as [[klSourceDrift]]
    * (unnormalized integer Σ(c+1)·lw beside the smoothed mass). */
  private[graft] def klAgainstHistory(incoming: DataFrame,
      hist: DataFrame): DataFrame = {
    val nB = KlBuckets
    val spark = incoming.sparkSession
    val ns = incoming.groupBy("source").agg(sum("c").cast("long").as("n"))
    val nh = hist.agg(sum("ch").cast("long").as("n_h"))
    val grid = ns
      .crossJoin(broadcast(spark.range(nB).select(col("id").as("b"))))
      .join(incoming, Seq("source", "b"), "left_outer")
      .na.fill(0L, Seq("c"))
      .join(broadcast(hist), Seq("b"))
      .crossJoin(broadcast(nh))
    val pairsX = grid.select(col("source"), col("c"), col("n"),
      ((col("c") + 1L) * (col("n_h") + nB)).cast("double")
        ./(((col("ch") + 1L) * (col("n") + nB)).cast("double")).as("x"))
    val terms = graft.functions.PortableLn.withLn(pairsX, "x", "lnx")
      .select(col("source"), col("n"),
        ((col("c") + 1L) * floor(col("lnx") * lit(1e6)).cast("long")).as("t"))
    terms.groupBy("source")
      .agg(first(col("n") + nB).cast("long").as("n_smoothed"),
        sum("t").cast("long").as("kl_scaled_micro"))
      .orderBy("source")
  }

  def klSourceDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val nB = KlBuckets
    val cnt = tokenBucketCounts(Tables.documents(spark, sfDir))
    val ns = cnt.groupBy("source").agg(sum("c").cast("long").as("n"))
    val grid = ns.select("source", "n")
      .crossJoin(broadcast(spark.range(nB).select(col("id").as("b"))))
      .join(cnt, Seq("source", "b"), "left_outer")
      .na.fill(0L, Seq("c"))
    val pairsX = grid.as("a")
      .join(grid.as("q"), col("a.b") === col("q.b") &&
        col("a.source") =!= col("q.source"))
      .select(col("a.source").as("source_a"), col("q.source").as("source_b"),
        col("a.b").as("b"), col("a.c").as("ca"), col("a.n").as("na"),
        ((col("a.c") + 1L) * (col("q.n") + nB)).cast("double")
          ./(((col("q.c") + 1L) * (col("a.n") + nB)).cast("double")).as("x"))
    val terms = graft.functions.PortableLn.withLn(pairsX, "x", "lnx")
      .select(col("source_a"), col("source_b"), col("na"),
        ((col("ca") + 1L) * floor(col("lnx") * lit(1e6)).cast("long"))
          .as("t"))
    terms.groupBy("source_a", "source_b")
      .agg(first(col("na") + nB).cast("long").as("n_smoothed_a"),
        sum("t").cast("long").as("kl_scaled_micro"))
      .orderBy("source_a", "source_b")
  }
}
