package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators over the `documents` corpus — the training-data
  * pipeline surface (builder brief; SURVEY.md §7.2 step 7). The reference's
  * natural dedup use case is its non-unique order_id
  * (`producers/sales_producer.py:89-93`, SURVEY.md §1.4); these operators
  * generalize that to content-level exact and near-duplicate detection.
  *
  * Every operator here is deterministic and engine-portable by construction:
  * hashes are md5 (identical bytes in Spark and DuckDB), similarity scores
  * are quotients of exact integer set sizes, and candidate generation uses
  * banding schemes whose output is a pure function of the input — so each
  * query carries a full SQL oracle.
  *
  * Scale posture (100 TB): nothing here is O(n²) on the full corpus.
  *   - exact: hash-groupBy, one shuffle on the digest.
  *   - MinHash: per-doc signatures (narrow), then a shuffle keyed on
  *     (band, signature) — candidates only where a band collides.
  *   - SimHash: 64→32-bit fingerprint, pigeonhole banding on 4 byte-chunks;
  *     only chunk-equal pairs are compared.
  *   - n-gram Jaccard: pairs restricted to docs sharing a shingle
  *     (inverted-index join), with a frequency cap to drop stop-shingles.
  */
object Dedup {

  /** Word n-gram shingle set (distinct, first-occurrence order). Runs as
    * the native codegen kernel [[graft.functions.WordShingles]]; empty for
    * docs shorter than n words.
    */
  def shingleCol(textCol: Column, n: Int = 3): Column =
    call_function("word_shingles", textCol, lit(n))

  /** Per-doc distinct shingle SET as a sorted array + its size — computed
    * row-local from `shingleCol` (no explode, no shuffle). Used for exact
    * Jaccard verification of candidate pairs via `array_intersect`, which
    * replaces two shingle-row shuffle joins + a groupBy with two doc-level
    * hash joins and a per-pair set intersection.
    */
  private def docShingleSets(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.spread(Tables.documents(spark, sfDir))
      .select(col("doc_id"), shingleCol(col("text")).as("ss"))
      .select(col("doc_id"), col("ss"), size(col("ss")).as("n"))
  }

  /** Exact-Jaccard verification of (doc_a, doc_b) candidate pairs over the
    * FULL shingle sets (caller-provided so candidate generation and
    * verification share one shingling frame); emits pairs meeting
    * `threshold`, ordered. Identical scores to the join-and-count
    * formulation (set intersection is set intersection), so oracles
    * mirroring that formulation hold unchanged.
    */
  private def verifyJaccardWith(sets: DataFrame, candidates: DataFrame,
                                threshold: Double): DataFrame = {
    candidates
      .join(sets.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sets.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("shared",
        size(array_intersect(col("sa.ss"), col("sb.ss"))).cast("long"))
      .select(col("doc_a"), col("doc_b"),
        (col("shared").cast("double") /
          (col("sa.n") + col("sb.n") - col("shared"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** Exact dedup: content-hash groupBy keeping the smallest doc_id — the
    * classic keep-first exact dedup, one shuffle on the digest.
    */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("content_hash")

  /** Keep-latest dedup — the read-side semantics of ClickHouse's
    * ReplacingMergeTree (the dedup sibling of the reference's
    * SummingMergeTree, `clickhouse/init/01_init.sql:44`): one surviving
    * row per key, the one with the highest version. Version here is
    * (ts, event_id) — event_id breaks timestamp ties deterministically.
    *
    * Implemented as a single argmax aggregate: `max(struct(version…,
    * payload…))` compares lexicographically on the version prefix, so the
    * whole operator is ONE partial-aggregating shuffle on the key — no
    * window sort, no per-key row_number pass; map-side combine keeps one
    * candidate row per key per partition, which is what makes it hold at
    * 100 TB (state ∝ distinct keys, not rows).
    */
  def dedupLatest(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
        col("value"))).as("last"))
      .select(col("user_id"),
        col("last.ts").as("last_ts"),
        col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_event_type"),
        // unrounded pass-through: round() diverges between engines at .xx5
        // decimal boundaries (Num.scala parity rule); the raw parquet double
        // is byte-identical in both
        col("last.value").as("last_value"))
      .orderBy("user_id")

  /** Per-source near-dup-rate report: how much of each source would be
    * dropped by near-dup pruning (cluster members that are not their
    * cluster's min-id representative) — the triage view that decides
    * which sources get curation attention first. Reuses the memoized
    * converged labels, so the report costs one broadcast join + a
    * source-keyed aggregate on top of clustering already paid elsewhere.
    */
  def dedupRateBySource(spark: SparkSession, sfDir: String): DataFrame = {
    val drops = clusterLabels(spark, sfDir)
      .filter(col("node") =!= col("label"))
      .select(col("node").as("doc_id"), lit(1L).as("is_dup"))
    Tables.documents(spark, sfDir)
      .join(drops, Seq("doc_id"), "left_outer")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_near_dup"))
      .select(col("source"), col("n_docs"), col("n_near_dup"),
        (col("n_near_dup").cast("double") / col("n_docs")).as("near_dup_rate"))
      .orderBy("source")
  }

  /** Cross-source near-dup matrix: which source pairs duplicate each
    * other — the "crawl A re-scraped crawl B" report a corpus audit reads
    * before deciding what to drop. One pair row per verified near-dup
    * pair, source-tagged from a broadcast doc→source map (sources ≪
    * corpus), keyed symmetric (least/greatest) so each unordered source
    * pair counts once. Costs two broadcast joins + a tiny aggregate on
    * top of the memoized pair pipeline.
    */
  def dedupSourceMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.documents(spark, sfDir).select("doc_id", "source")
    val sa = src.toDF("da", "source_a")
    val sb = src.toDF("db", "source_b")
    ngramJaccardPairs(spark, sfDir)
      .select("doc_a", "doc_b")
      .join(broadcast(sa), col("doc_a") === col("da"))
      .join(broadcast(sb), col("doc_b") === col("db"))
      .select(least(col("source_a"), col("source_b")).as("source_x"),
        greatest(col("source_a"), col("source_b")).as("source_y"))
      .groupBy("source_x", "source_y")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("source_x", "source_y")
  }

  /** n-gram Jaccard near-dup pairs — EXACT at the threshold, via prefix
    * filtering (the AllPairs/PPJoin family, Bayardo et al. WWW'07): sort
    * each doc's shingles by ascending global document frequency and index
    * only the first `n - ceil(t·n) + 1` of them. Any pair with Jaccard ≥ t
    * must collide inside these prefixes (pigeonhole on the required
    * overlap ceil(t·max(|A|,|B|))), so candidate generation is lossless
    * while skipping the frequent-shingle join fan-out entirely (measured
    * 26× candidate reduction on the dense sf0.1 corpus: 1.13M → 43k).
    * A size filter (t·|A| ≤ |B| ∧ t·|B| ≤ |A|, necessary for J ≥ t)
    * prunes further before verification over the full sets.
    *
    * At 100 TB: df table and window are shingle/doc-bounded, the only
    * quadratic-risk join runs on rare-by-construction prefix shingles, and
    * every stage is a standard shuffle — this is the published scale-out
    * algorithm, not a heuristic cap, so recall is exactly 1.
    *
    * Memoized per (session, sfDir, threshold) like [[clusterLabels]]: the
    * pair list feeds both the `dedup_ngram_jaccard` query and the
    * clustering behind `dedup_clusters`/`curation_pipeline`, and the input
    * parquet dir is immutable for a run — so the prefix-filter pipeline
    * executes once per process, and reuse reads materialized blocks.
    */
  def ngramJaccardPairs(spark: SparkSession, sfDir: String,
                        threshold: Double = 0.8): DataFrame =
    pairCache.getOrElseUpdate((spark, sfDir, threshold),
      computeNgramJaccardPairs(spark, sfDir, threshold))

  private val pairCache =
    Memo.registry[(SparkSession, String, Double)]

  private def computeNgramJaccardPairs(spark: SparkSession, sfDir: String,
                                       threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    // one logical shingle frame feeds candidate generation AND
    // verification (recomputed per consumer — the native kernel is
    // cheaper than columnar-caching string arrays, measured both ways);
    // the memo result is localCheckpointed HERE, eagerly materialized
    val sets = docShingleSets(spark, sfDir)
    // set size n rides along row-locally from the shingle array — no
    // count() window pass over the exploded rows
    val sh = sets.select(col("doc_id"), col("n"), explode(col("ss")).as("s"))
    val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy("doc_id")
    // df attaches by broadcast — the df table is bounded by the distinct
    // shingle vocabulary, tiny next to the exploded stream. AQE picks this
    // plan on its own at fixture scale (A/B measured no delta); the
    // explicit hint pins it so the exploded stream is never shuffled on
    // `s` merely to tag rows. For an open-vocabulary corpus where df
    // outgrows the broadcast threshold, drop the hint and AQE shuffles.
    val ranked = sh.join(broadcast(dfreq), "s")
      .withColumn("rk", row_number().over(byDoc.orderBy("df", "s")))
    val pfx = ranked.filter(
      col("rk") <= col("n") - ceil(col("n") * threshold) + 1)
    val candidates = pfx.as("a")
      .join(pfx.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n") >= col("a.n") * threshold &&
          col("a.n") >= col("b.n") * threshold)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyJaccardWith(sets, candidates, threshold).localCheckpoint(true)
  }

  /** Containment threshold in ppm (9/10), shared with the oracle. */
  val ContainTauPpm: Long = 900000L

  /** Asymmetric CONTAINMENT near-dup pairs — the subset-duplication
    * detector Jaccard misses (Broder 1997's containment measure: a
    * short doc fully embedded in a longer one scores C = |A∩B|/|A| = 1
    * but Jaccard ≈ n_a/n_b, far below any symmetric threshold; the
    * boilerplate-wrapping / quote-expansion case of corpus dedup).
    *
    * Plan: prefix filtering adapted to containment — a pair with
    * C(A→B) ≥ τ must share one of A's first n_a − ⌈τ·n_a⌉ + 1 shingles
    * in the global (df, s) order, so only the PROBE side is
    * prefix-thinned (df-ascending: rare shingles first) and it joins
    * the FULL shingle inverted index; exact verification by
    * array_intersect on the shared shingle-set frame. The prefix bound
    * uses exact integer arithmetic (⌈9n/10⌉ = (9n+9) DIV 10) — a
    * float ⌈n·0.9⌉ can round 9.000…002 up and silently shrink the
    * prefix below the theorem's bound. The containment score and the
    * threshold compare are pure integers (⌊10⁶·s/n_a⌋ ≥ 900000 ⟺
    * s/n_a ≥ 9/10 exactly). Production hardening at extreme scale is
    * hot-shingle salting on the index side — the probe side is rare
    * shingles by construction.
    */
  def containmentPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    val sets = docShingleSets(spark, sfDir)
    val sh = sets.select(col("doc_id"), col("n"), explode(col("ss")).as("s"))
    val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val ranked = sh.join(broadcast(dfreq), "s")
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy("df", "s")))
    val pfx = ranked
      .filter(col("rk") <= col("n") - expr("(9 * n + 9) DIV 10") + 1)
      .select(col("doc_id").as("doc_a"), col("n").as("n_a"), col("s"))
    val idx = sh.select(col("doc_id").as("doc_b"), col("n").as("n_b"),
      col("s"))
    val candidates = pfx.join(idx, Seq("s"))
      .filter(col("doc_a") =!= col("doc_b") &&
        (col("n_a") < col("n_b") ||
          (col("n_a") === col("n_b") && col("doc_a") < col("doc_b"))))
      .select("doc_a", "doc_b").distinct()
    candidates
      .join(sets.select(col("doc_id"), col("ss"), col("n").as("n_a")),
        col("doc_a") === col("doc_id")).drop("doc_id")
      .withColumnRenamed("ss", "ss_a")
      .join(sets.select(col("doc_id"), col("ss")),
        col("doc_b") === col("doc_id")).drop("doc_id")
      .withColumn("shared",
        size(array_intersect(col("ss_a"), col("ss"))).cast("long"))
      .withColumn("containment_ppm",
        expr("shared * 1000000 DIV n_a"))
      .filter(col("containment_ppm") >= ContainTauPpm)
      .select(col("doc_a").as("contained"), col("doc_b").as("container"),
        col("n_a").cast("long").as("n_contained"), col("shared"),
        col("containment_ppm"))
      .orderBy("contained", "container")
  }

  /** MinHash+LSH near-dup pairs: shingle → k=12 min-wise hashes → 6 bands ×
    * 2 rows → band-signature bucket join → exact-Jaccard verification of
    * candidates only.
    *
    * The hash family is double hashing (Kirsch-Mitzenmacher, ESA'06 —
    * "Less Hashing, Same Performance"): ONE md5 per shingle, split into
    * two 48-bit halves h1/h2 (h2 forced odd), draw i = h1 + i·h2. This
    * cuts k·|shingles| digest computations to |shingles| while keeping
    * per-draw min-wise uniformity, and stays bit-identical in any engine
    * with md5 + 64-bit integer arithmetic (the oracle mirrors it; values
    * stay < 2^52, so no overflow on either side). Candidate recall at
    * j=0.8 with r=2,b=6 is 1-(1-0.64)^6 ≈ 0.998; output is the
    * deterministic candidates∩(j≥threshold) — recall is a documented
    * property of the banding scheme.
    */
  def minhashPairs(spark: SparkSession, sfDir: String, threshold: Double = 0.8,
                   k: Int = 12, rowsPerBand: Int = 2): DataFrame = {
    // the same logical shingle frame serves signature generation and
    // verification (recomputing the native kernel beats caching arrays)
    val sets = docShingleSets(spark, sfDir)
    verifyJaccardWith(sets,
      minhashCandidates(sets, k, rowsPerBand), threshold)
  }

  /** The banding CANDIDATE stage of [[minhashPairs]], exposed so
    * [[minhashRecallEval]] can audit the un-verified candidate set —
    * callers that want dedup pairs use [[minhashPairs]], which verifies.
    */
  /** The (doc_id, band, bsig) banded-signature frame shared by the batch
    * candidate join and the streaming probe ([[graft.streaming
    * .StreamAssembly.streamDedupProbe]]). The whole k-draw signature
    * computes ROW-LOCAL in the minhash_sig codegen kernel (one md5 per
    * shingle, k running mins in-register) — the former explode → md5 →
    * hex-conv → k-column min-aggregate spent its time materializing 3.1M
    * exploded rows and a doc-keyed exchange for values a single pass over
    * the shingle array already determines. Shingle-less docs are dropped
    * BEFORE banding (their sentinel signature would otherwise bucket them
    * all together). Band signature = the band's min-hashes joined in i
    * order — equality of the concat is equality of the tuple, same
    * candidate set as the oracle's formulation.
    */
  private[graft] def bandedSignatures(sets: DataFrame, k: Int,
                                      rowsPerBand: Int): DataFrame = {
    val sig = sets.filter(col("n") > 0)
      .select(col("doc_id"),
        call_function("minhash_sig", col("ss"), lit(k)).as("sig"))
    val nBands = k / rowsPerBand
    val bandSigs = (0 until nBands).map { b =>
      concat_ws("|",
        (b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => element_at(col("sig"), i + 1)): _*)
        .as(s"b$b")
    }
    sig.select(col("doc_id") +: bandSigs: _*)
      .select(col("doc_id"),
        explode(array((0 until nBands).map(b =>
          struct(lit(b).as("band"), col(s"b$b").as("bsig"))): _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"),
        col("bs.bsig").as("bsig"))
  }

  private[graft] def minhashCandidates(sets: DataFrame, k: Int,
                                       rowsPerBand: Int): DataFrame = {
    val banded = bandedSignatures(sets, k, rowsPerBand)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** LSH banding QUALITY audit: the MinHash candidate set measured
    * against the exact-Jaccard ground truth (the prefix-filtered exact
    * pair op, which is lossless at the threshold) — candidate count,
    * true positives, missed pairs (fn: banding recall gaps, expected
    * ≈0.2% at j=0.8 with r=2,b=6) and sub-threshold candidates (fp:
    * wasted verification work). The counts every production LSH rollout
    * is tuned by, and the gate is all-integer: tp is a semi-join between
    * two deterministic pair sets, fn/fp are arithmetic. Plan shape:
    * reuses the MEMOIZED exact pair frame (shared with dedup_ngram /
    * clusters / curation) plus one banding pass; the three single-row
    * counts broadcast-combine via cross joins — no driver .count() loop.
    */
  def minhashRecallEval(spark: SparkSession, sfDir: String,
                        threshold: Double = 0.8, k: Int = 12,
                        rowsPerBand: Int = 2): DataFrame = {
    val exact = ngramJaccardPairs(spark, sfDir, threshold)
      .select("doc_a", "doc_b")
    val cand = minhashCandidates(docShingleSets(spark, sfDir), k, rowsPerBand)
    val tp = cand.join(exact, Seq("doc_a", "doc_b"), "left_semi")
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .crossJoin(tp.agg(count(lit(1)).as("tp")))
      .select(col("n_exact"), col("n_cand"), col("tp"),
        (col("n_exact") - col("tp")).as("fn"),
        (col("n_cand") - col("tp")).as("fp"))
  }

  /** Near-dup CLUSTERS from pair lists — the step that turns candidate
    * pairs into dedup decisions (keep the min-id member per connected
    * component). Iterative min-label propagation: every node starts
    * labeled with itself; each round it takes the min label over its
    * neighbourhood; converged when no label changes. Rounds are plain
    * shuffled joins (diameter-bounded, ≤ `maxIter`), so the algorithm is
    * the published map-reduce connected-components loop — no driver-side
    * graph. The oracle mirrors it with a recursive-CTE transitive closure
    * (viable at oracle scale; the ITERATIVE form is the 100 TB path).
    */
  /** Converged (node → min-member label) assignment for every node that
    * appears in a near-dup pair. The propagation loop behind
    * [[dedupClusters]] and the curation pipeline's near-dup pruning.
    *
    * Memoized per (session, sfDir): `dedup_clusters` and
    * `curation_pipeline` both need the converged labels, and the input
    * parquet dir is immutable for a run, so the expensive pair pipeline +
    * propagation executes ONCE per process. The cached frame is
    * `localCheckpoint`ed — materialized blocks, no lineage — so reuse costs
    * a block read, never a recompute.
    */
  def clusterLabels(spark: SparkSession, sfDir: String,
                    maxIter: Int = 20): DataFrame =
    labelCache.getOrElseUpdate((spark, sfDir),
      computeClusterLabels(spark, sfDir, maxIter))

  private val labelCache =
    Memo.registry[(SparkSession, String)]

  /** Drop ALL per-process memo state (pair pipeline, converged labels,
    * shingle frames — every [[Memo]]-registered cache) and release the
    * materialized blocks. The bench calls this between timed passes so
    * every pass pays the full cold cost — without it, pass 2 of a memoized
    * query would read pass 1's checkpointed blocks and report the memo-hit
    * price instead of the operator's.
    */
  def clearMemo(): Unit = Memo.clearAll()

  private def computeClusterLabels(spark: SparkSession, sfDir: String,
                                   maxIter: Int): DataFrame = {
    // pairs arrive memoized + localCheckpointed from ngramJaccardPairs —
    // the union branches and label init read materialized blocks
    val pairs = ngramJaccardPairs(spark, sfDir)
      .select("doc_a", "doc_b")
    val edges = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .toDF("src", "dst").persist()
    val init = edges.select(col("src").as("node"))
      .distinct().withColumn("label", col("node")).persist()
    val idType = init.schema("label").dataType
    var cached = init   // the persisted frame to release next round
    var labels = init   // schema (node, label)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val viaNeighbour = edges.join(labels, edges("dst") === labels("node"))
        .select(edges("src").as("node"), col("label"))
      // the node's previous label rides through the SAME aggregate (null on
      // neighbour rows; min ignores nulls), so convergence is checked every
      // round — including round 1 — without a separate join/count job
      val tagged = labels
        .select(col("node"), col("label"), col("label").as("old"))
        .union(viaNeighbour.withColumn("old", lit(null).cast(idType)))
      val next = tagged.groupBy("node")
        .agg(min("label").as("label"), min("old").as("old")).persist()
      converged = next.filter(col("label") =!= col("old")).isEmpty
      cached.unpersist()
      cached = next
      labels = next.drop("old")
      // persist caches blocks but the logical plan still grows per round;
      // truncate lineage every 3 rounds so deep graphs can't blow the
      // planner (localCheckpoint materializes from the fresh cache)
      if (!converged && i % 3 == 2) {
        val cp = labels.localCheckpoint(true)
        cached.unpersist()
        cached = cp
        labels = cp
      }
      i += 1
    }
    // hand the memo a lineage-free materialized frame and release the
    // loop-internal caches
    val out = labels.localCheckpoint(true)
    cached.unpersist()
    edges.unpersist()
    out
  }

  def dedupClusters(spark: SparkSession, sfDir: String,
                    maxIter: Int = 20): DataFrame =
    clusterLabels(spark, sfDir, maxIter)
      .groupBy(col("label").as("cluster"))
      .agg(count(lit(1)).as("n_members"), max("node").as("max_doc"))
      .orderBy("cluster")

  /** PageRank over the near-dup graph — centrality-based canonical-document
    * selection: within a duplicate component, the highest-rank member is
    * the most-connected ("most representative") variant, a standard
    * survivor-selection signal next to [[dedupSurvivors]]'s quality rule
    * (PageRank: Brin & Page 1998; public knowledge).
    *
    * INTEGER PageRank for engine portability: float PageRank sums
    * contributions in partition-merge order, so no two runs (let alone two
    * engines) agree bitwise. Here ranks live in integer micro-units
    * (1e6 = 1.0), contributions are floor-divided (`rank div deg`), and
    * the damping step is integer `(85 · Σ) div 100` — every operation is
    * exact and associative, so the result is independent of parallelism
    * and byte-identical to the single-threaded oracle. Determinism over
    * the last ulp of float precision: the right trade for a gate that
    * hashes bytes.
    *
    * Scale shape: pairs arrive memoized from the one prefix-filtered pair
    * computation per run; each iteration is one equi-join (edges ⋈ ranks
    * on src) + one aggregate (sum per dst) — the standard map-reduce
    * PageRank round, O(|E|) shuffled per round, no driver-side graph.
    */
  def dupPageRank(spark: SparkSession, sfDir: String,
                  iters: Int = 3): DataFrame = {
    val pairs = ngramJaccardPairs(spark, sfDir).select("doc_a", "doc_b")
    // pairs is memoized + localCheckpointed, so the per-iteration re-reads
    // of edges/deg below replay materialized blocks, not the pair pipeline;
    // a fixed 3 iterations keeps lineage shallow with no checkpoint needed
    val edges = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .toDF("src", "dst")
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    var rank = deg.withColumn("rank", lit(1000000L))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("rank div deg").as("c"))
      rank = deg
        .join(contrib.groupBy("node").agg(sum("c").as("s")),
          Seq("node"), "left_outer")
        .select(col("node"), col("deg"),
          (lit(150000L) + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
    }
    rank.orderBy(desc("rank"), asc("node"))
  }

  /** Blocked edit-distance fuzzy match over the distinct part-name
    * dictionary — the entity-resolution primitive (same-entity variant
    * detection) that record-linkage pipelines run before merging catalogs.
    * The standard blocking discipline (Christen, "Data Matching", 2012 —
    * public knowledge): candidates are generated per BLOCK (here the name's
    * last token; swap in phonetic/length keys per domain), so the quadratic
    * verify runs within blocks only — never all-pairs — and `levenshtein`
    * (codegen built-in) verifies candidates exactly. At 100 TB the
    * dictionary is distinct-aggregated first (names ≪ rows) and the block
    * join is an equi-shuffle on the block key; a skewed mega-block would
    * salt like any skewed join.
    */
  def fuzzyNamePairs(spark: SparkSession, sfDir: String,
                     maxDist: Int = 2): DataFrame = {
    val names = Tables.part(spark, sfDir).select("p_name").distinct()
      .withColumn("block", substring_index(col("p_name"), " ", -1))
    names.as("a")
      .join(names.as("b"),
        col("a.block") === col("b.block") &&
          col("a.p_name") < col("b.p_name"))
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
        levenshtein(col("a.p_name"), col("b.p_name")).as("edit_dist"))
      .filter(col("edit_dist") <= maxDist)
      .orderBy("name_a", "name_b")
  }

  /** Survivor selection — the step that turns near-dup clusters into a
    * dedup DECISION: per cluster keep the best document (longest, doc_id
    * tie-break) and account for what the dedup drops. This is the
    * "keep one representative" policy of published pipeline dedup stages
    * (e.g. the C4/RefinedWeb exact+fuzzy dedup write-ups — public
    * knowledge). Reuses the memoized converged labels, joins document
    * metadata (a broadcast at this cardinality — labels ∝ duplicated docs
    * only, never the corpus), and aggregates per cluster; the window runs
    * per-cluster over dup-doc rows only.
    */
  def dedupSurvivors(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = clusterLabels(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "n_chars")
    val labeled = labels
      .join(docs, col("node") === col("doc_id"))
      .select(col("label"), col("node"), col("n_chars"))
    val w = Window.partitionBy("label")
      .orderBy(desc("n_chars"), asc("node"))
    labeled
      .withColumn("rn", row_number().over(w))
      .groupBy(col("label").as("cluster"))
      .agg(
        count(lit(1)).as("n_members"),
        max(when(col("rn") === 1, col("node"))).as("survivor_doc"),
        max(when(col("rn") === 1, col("n_chars"))).as("chars_kept"),
        sum(when(col("rn") =!= 1, col("n_chars")).otherwise(lit(0L)))
          .cast("long").as("chars_dropped"))
      .orderBy("cluster")
  }

  /** Incremental dedup — the daily-ingest shape: treat the newest 20% of
    * doc_ids as the arriving batch and everything before as the indexed
    * historical corpus, then report per source how much of the batch is
    * (a) an exact copy of history (md5 semi-join against the historical
    * digest set) and (b) a near-dup of history (boundary-crossing pairs
    * from the memoized prefix-filter pipeline). This is how a crawl
    * pipeline runs dedup in production — new data against the index, never
    * all-pairs over the union — and both probes are hash/equi-joins, so
    * the incremental step stays a fraction of a full-corpus dedup at any
    * scale. The 80/20 boundary is itself computed from the data
    * ((max(doc_id)·4) div 5, a 1-row broadcast), keeping the query a pure
    * function of the input.
    */
  def dedupIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val kRow = docs.agg(expr("(max(doc_id) * 4) div 5").as("k"))
    val tagged = docs.crossJoin(broadcast(kRow))
    val histHashes = tagged.filter(col("doc_id") < col("k"))
      .select(md5(col("text")).as("h")).distinct()
    val batch = tagged.filter(col("doc_id") >= col("k"))
    val exactDup = batch.withColumn("h", md5(col("text")))
      .join(histHashes, Seq("h"), "left_semi")
      .select(col("doc_id")).withColumn("is_exact", lit(1L))
    val nearDup = ngramJaccardPairs(spark, sfDir)
      .select("doc_a", "doc_b").crossJoin(broadcast(kRow))
      // pairs are oriented doc_a < doc_b, so "crosses the boundary" is
      // exactly doc_a in history ∧ doc_b in batch
      .filter(col("doc_a") < col("k") && col("doc_b") >= col("k"))
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("is_near", lit(1L))
    batch
      .join(exactDup, Seq("doc_id"), "left_outer")
      .join(nearDup, Seq("doc_id"), "left_outer")
      .groupBy("source")
      .agg(count(lit(1)).as("n_new"),
        sum(coalesce(col("is_exact"), lit(0L))).cast("long").as("n_exact_dup"),
        sum(coalesce(col("is_near"), lit(0L))).cast("long").as("n_near_dup"))
      .orderBy("source")
  }

  /** Triangle census of the near-dup graph — the graph-analytics summary a
    * dedup audit reads to tell CHAINS (A≈B≈C but A≉C: border-case pairs,
    * risky to transitively merge) from CLIQUES (all three pairwise similar:
    * safe merges). Algorithm: the id-ordered edge list (doc_a < doc_b
    * already) joined to itself to enumerate wedges a<b<c, then a semi-join
    * against the edge list to close them — each triangle counted exactly
    * once at its smallest vertex. This is the standard two-shuffle
    * map-reduce triangle enumeration; at scale the orientation should be
    * by DEGREE, not id (Suri & Vassilvitskii, WWW'11 — bounds the wedge
    * fan-out at high-degree vertices), an orientation swap that changes no
    * other part of the plan. Near-dup graphs are near-cliques, so the
    * wedge set stays ∝ triangle count here.
    */
  def dedupTriangles(spark: SparkSession, sfDir: String): DataFrame = {
    val e = ngramJaccardPairs(spark, sfDir).select("doc_a", "doc_b")
    val wedges = e.as("e1")
      .join(e.as("e2"), col("e1.doc_b") === col("e2.doc_a"))
      .select(col("e1.doc_a").as("a"), col("e1.doc_b").as("b"),
        col("e2.doc_b").as("c"))
    // materialized: two aggregates (count + participating-node distinct)
    // read the triangle set, and the wedge enumeration is the dominant
    // cost — without this it would execute twice
    val triangles = wedges
      .join(e.as("e3"),
        col("a") === col("e3.doc_a") && col("c") === col("e3.doc_b"),
        "left_semi")
      .localCheckpoint(true)
    val nodes = e.select(col("doc_a").as("n"))
      .union(e.select(col("doc_b").as("n"))).distinct()
    val triNodes = triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("n"))
      .distinct()
    triangles.agg(count(lit(1)).as("n_triangles"))
      .crossJoin(triNodes.agg(count(lit(1)).as("n_tri_nodes")))
      .crossJoin(e.agg(count(lit(1)).as("n_edges")))
      .crossJoin(nodes.agg(count(lit(1)).as("n_nodes")))
  }

  /** Degree histogram of the near-dup graph — the shape diagnostic read
    * next to [[dedupTriangles]]: a dup graph of isolated pairs peaks at
    * degree 1, near-cliques push mass to high degrees, and a heavy tail
    * flags hub documents (boilerplate that near-matches everything — the
    * usual skew risk for any pairwise stage). Two bounded aggregates over
    * the memoized pair list: per-node degree, then nodes per degree.
    */
  def dupDegreeHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val e = ngramJaccardPairs(spark, sfDir).select("doc_a", "doc_b")
    e.select(col("doc_a").as("n"))
      .union(e.select(col("doc_b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
      .orderBy("degree")
  }

  /** Corpus-internal n-gram duplication profile — the "memorization risk"
    * histogram LLM data work reads before training (how much of each
    * document is boilerplate shared with the rest of the corpus; public
    * method, e.g. the duplicated-n-gram accounting of Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", ACL'22):
    * each document's distinct 3-gram shingles are scored against corpus
    * document frequency; a shingle with df ≥ 2 is "duplicated"; docs are
    * bucketed by the integer decile of their duplicated fraction
    * (`(bins·n_dup) div n_sh` — exact integer arithmetic, engine-safe).
    *
    * Scale shape: the inverted-index discipline end to end. One
    * shingle-keyed aggregate builds the df table, filtered to the
    * duplicated subset BEFORE the probe; the per-doc duplicated count is
    * a shingle-keyed left-semi join (never a pairwise doc join) and two
    * doc-keyed aggregates. Every join/agg is a plain hash shuffle on a
    * high-cardinality key — no global window, no all-pairs, nothing
    * single-partition.
    */
  /** Bin count shared with the registered DuckDB oracle (interpolated into
    * the SQL — the KmeansK pattern — so operator and oracle cannot drift).
    */
  val NgramNoveltyBins: Int = 10

  def ngramNovelty(spark: SparkSession, sfDir: String,
                   bins: Int = NgramNoveltyBins): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(shingleCol(col("text"))).as("s"))
    val dup = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2).select("s")
    val perDoc = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val dupPerDoc = sh.join(dup, Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    perDoc.join(dupPerDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("bin", expr(s"($bins * n_dup) div n_sh"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_sh").as("total_shingles"),
        sum("n_dup").as("dup_shingles"))
      .orderBy("bin")
  }

  /** Span length (in tokens) for [[exactSubstringSpans]] — interpolated
    * into the registered DuckDB oracle so operator and oracle cannot
    * drift (the KmeansK pattern).
    */
  val SpanK: Int = 5

  /** Cross-document EXACT-substring span accounting — the other half of
    * Lee et al. ACL'22 ("Deduplicating Training Data Makes Language
    * Models Better"): their ExactSubstr dedup removes every ≥50-token
    * span shared verbatim between documents (suffix-array driven in the
    * paper). The distributed re-expression: a token position is
    * DUPLICATED iff some [[SpanK]]-token window covering it appears
    * verbatim in at least one OTHER document — exactly the union of
    * cross-doc-duplicated k-gram spans, which equals the paper's
    * ≥k-token shared-span coverage (any shared span of length L ≥ k is
    * covered by its L−k+1 shared k-grams, and every shared k-gram is
    * itself a shared span). Reported per source: docs, docs carrying any
    * duplicated span, duplicated-token mass, total tokens — the
    * memorization-risk layer a 100 TB text pipeline audits before
    * training. Docs shorter than k tokens carry no window and are
    * excluded (mirrored in the oracle).
    *
    * Scale shape: the inverted-index discipline, never a suffix array in
    * memory and never a doc×doc join. One gram-keyed aggregate builds
    * the cross-doc df table (map-side combined), filtered to df ≥ 2
    * BEFORE the probe; the probe is a gram-keyed left-semi join; span
    * coverage is a bounded ×k position explode then a (doc, pos)
    * distinct — all hash shuffles on high-cardinality keys. The gate is
    * float-free: every output is an exact integer count.
    */
  def exactSubstringSpans(spark: SparkSession, sfDir: String,
                          k: Int = SpanK): DataFrame = {
    val docs = substrDocs(spark, sfDir, k)
    val dupTok = duplicatedPositions(spark, sfDir, k)
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_tok"))
    docs.select(col("doc_id"), col("source"), col("n_tok"))
      .join(dupTok, Seq("doc_id"), "left_outer")
      .withColumn("n_dup_tok", coalesce(col("n_dup_tok"), lit(0L)))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_dup_tok") > 0, 1L).otherwise(0L))
          .as("n_docs_with_dup"),
        sum("n_dup_tok").as("dup_tokens"),
        sum("n_tok").cast("long").as("total_tokens"))
      .orderBy("source")
  }

  /** The tokenized doc frame [[exactSubstringSpans]] and
    * [[duplicatedSpanHistogram]] share: docs with ≥ k tokens.
    */
  private def substrDocs(spark: SparkSession, sfDir: String,
                         k: Int): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= k)
      .select(col("doc_id"), col("source"), size(col("ws")).as("n_tok"),
        col("ws"))

  /** The DISTINCT (doc_id, p) duplicated-position frame: token position p
    * of a doc is covered by some cross-doc-duplicated k-gram window.
    */
  /** Memo for [[duplicatedPositions]] — the duplicated-position set is
    * the shared core of dedup_exact_substring AND dedup_span_histogram
    * (and the streaming substring probe's static index derives from the
    * same grams); each gated consumer re-ran the k-gram inverted-index
    * pass per query.
    */
  private val dupPosCache =
    Memo.registry[(org.apache.spark.SparkContext, String, Int)]

  private def duplicatedPositions(spark: SparkSession, sfDir: String,
                                  k: Int): DataFrame =
    dupPosCache.synchronized {
      dupPosCache.getOrElseUpdate((spark.sparkContext, sfDir, k),
        duplicatedPositionsBuild(spark, sfDir, k).localCheckpoint(true))
    }

  private[graft] def duplicatedPositionsBuild(spark: SparkSession, sfDir: String,
                                              k: Int): DataFrame = {
    val grams = substrDocs(spark, sfDir, k)
      .select(col("doc_id"), col("n_tok"),
        explode(expr(
          s"""transform(sequence(1, size(ws) - ${k - 1}),
             |  i -> struct(i AS start,
             |              array_join(slice(ws, i, $k), ' ') AS gram))"""
            .stripMargin)).as("g"))
      .select(col("doc_id"), col("n_tok"),
        col("g.start").as("start"), col("g.gram").as("gram"))
    val dupGrams = grams.groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("dn"))
      .filter(col("dn") >= 2).select("gram")
    grams.join(dupGrams, Seq("gram"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("start"), col("start") + lit(k - 1))).as("p"))
      .distinct()
  }

  /** Duplicated-RUN length distribution — the shape a Lee-et-al
    * ExactSubstr pass reads to pick its cut threshold: maximal
    * consecutive runs of duplicated token positions per doc
    * (gaps-and-islands: island = p − rank(p) within the doc), rolled up
    * to runs and longest-run-per-doc counts per length. Every run is ≥
    * [[SpanK]] tokens by construction (each duplicated position sits in
    * a full k-window whose k positions are all duplicated).
    *
    * Scale shape: the island window is PARTITIONED BY doc_id — per-doc
    * frames bounded by doc token counts, the sessionization discipline,
    * never a global window; the two rollups are plain hash aggregates.
    * All-integer gate.
    */
  def duplicatedSpanHistogram(spark: SparkSession, sfDir: String,
                              k: Int = SpanK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val runs = duplicatedPositions(spark, sfDir, k)
      .withColumn("grp", col("p") - row_number().over(
        Window.partitionBy("doc_id").orderBy("p")))
      .groupBy("doc_id", "grp")
      .agg(count(lit(1)).as("run_len"))
    val perLen = runs.groupBy("run_len")
      .agg(count(lit(1)).as("n_runs"))
    val perDocMax = runs.groupBy("doc_id")
      .agg(max("run_len").as("run_len"))
      .groupBy("run_len")
      .agg(count(lit(1)).as("n_docs_longest"))
    perLen.join(perDocMax, Seq("run_len"), "left_outer")
      .select(col("run_len"), col("n_runs"),
        coalesce(col("n_docs_longest"), lit(0L)).as("n_docs_longest"))
      .orderBy("run_len")
  }

  /** Connected components via alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — the provably O(log n)-round alternative to
    * min-label propagation for DEEP graphs. Each half-round is two plain
    * shuffles (a per-node min aggregate + a join back), and each
    * round at least halves long chains, where propagation pays one full
    * round per hop of graph diameter. Near-dup clusters here are
    * near-cliques (diameter ~2), so propagation wins on THIS workload;
    * both ship because the choice is a graph-shape call, and the
    * equivalence is spec-tested + oracle-checked (same fixpoint: every
    * node labeled with its component minimum).
    *
    *   - large-star: for each node u, connect every LARGER neighbour to
    *     m = min(Γ(u) ∪ u)
    *   - small-star: orient edges large→small; connect u and its smaller
    *     neighbours to their minimum
    *
    * Converged when the (canonically oriented) edge multiset fixes; the
    * final edges ARE the (node → component-min) star.
    */
  def starContractionLabels(spark: SparkSession, sfDir: String,
                            maxIter: Int = 30): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      nbrs.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
      val mins = dir.groupBy("u").agg(min("v").as("m"))
      dir.join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    var edges = ngramJaccardPairs(spark, sfDir)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
      .localCheckpoint(true)
    var prevCount = edges.count()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      // carry the previous round's count — one count job per round, not two
      val nextCount = next.count()
      converged = nextCount == prevCount && next.exceptAll(edges).isEmpty
      prevCount = nextCount
      edges = next
      i += 1
    }
    // star edges (u → component min) + the roots labeling themselves
    edges.select(col("u").as("node"), col("v").as("label"))
      .union(edges.select(col("v")).distinct()
        .select(col("v").as("node"), col("v").as("label")))
      .distinct()
  }

  /** [[dedupClusters]] computed through the star-contraction labels —
    * identical output (same fixpoint), oracle-checked against the same
    * transitive-closure SQL.
    */
  def dedupClustersStar(spark: SparkSession, sfDir: String): DataFrame =
    starContractionLabels(spark, sfDir)
      .groupBy(col("label").as("cluster"))
      .agg(count(lit(1)).as("n_members"), max("node").as("max_doc"))
      .orderBy("cluster")

  /** 32-bit SimHash per document over distinct tokens: token hash =
    * first 8 md5 hex chars; each bit contributes ±1; fingerprint bit j set
    * iff the signed sum is > 0.
    */
  def simhashFingerprints(spark: SparkSession, sfDir: String): DataFrame = {
    // per-doc distinct is row-local (array_distinct), not a global
    // .distinct() shuffle; the 32 signed bit-sums are 32 aggregate columns
    // in ONE groupBy (map-side partial agg), not a 32× explode
    val toks = Tables.spread(Tables.documents(spark, sfDir))
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
      .select(col("doc_id"),
        conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long").as("h"))
    val sumCols = (0 until 32).map(j =>
      sum(expr(s"CAST((h >> $j) & 1 AS BIGINT) * 2 - 1")).as(s"v$j"))
    toks.groupBy("doc_id").agg(sumCols.head, sumCols.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(j =>
          when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, found via
    * pigeonhole banding on the 4 bytes of the fingerprint: any pair within
    * Hamming 3 of each other agrees on at least one byte-band, so the
    * band join finds exactly the all-pairs result without O(n²) compare.
    *
    * The band self-join runs over DISTINCT fingerprints, not per-doc
    * rows: a twin-dense corpus (the sf1/sf2 replicates carry 10/20
    * exact copies of each doc, so every distinct near-dup fingerprint
    * pair becomes 100/400 doc pairs) would otherwise pay the twin
    * factor SQUARED in band-join candidates, each with its xor/bit
    * compare (measured 137 s at sf2). Matched distinct pairs — found
    * once, at their lowest agreeing band, so no distinct() over the
    * pair set — then materialize to doc pairs through two plain hash
    * joins on the fingerprint key: exactly the output rows, no
    * per-candidate compare work. Equal fingerprints (Hamming 0) pair
    * within their group directly — an equi-join on the hash. Identical
    * output to the per-doc banding by construction.
    */
  def simhashPairs(spark: SparkSession, sfDir: String, maxHamming: Int = 3): DataFrame =
    simhashPairFrame(spark, sfDir, maxHamming).orderBy("doc_a", "doc_b")

  /** The unsorted (doc_a, doc_b, hamming) pair frame shared by
    * [[simhashPairs]] (which adds the presentation sort) and
    * [[simhashDigest]] (which folds it to per-bucket digests so the
    * scale tiers never pay a global sort over the pair output).
    */
  private val simhashPairCache =
    Memo.registry[(org.apache.spark.SparkContext, String, Int)]

  private def simhashPairFrame(spark: SparkSession, sfDir: String,
                               maxHamming: Int): DataFrame =
    simhashPairCache.synchronized {
      simhashPairCache.getOrElseUpdate((spark.sparkContext, sfDir, maxHamming),
        Memo.scratchCheckpoint(
          simhashPairFrameBuild(spark, sfDir, maxHamming)))
    }

  private[graft] def simhashPairFrameBuild(spark: SparkSession, sfDir: String,
                                           maxHamming: Int): DataFrame = {
    // persisted: the fingerprint frame feeds the distinct-hash band
    // join, the probe side and the doc-expansion side
    val fp = simhashFingerprints(spark, sfDir).persist()
    val banded = fp.select(col("simhash")).distinct()
      .select(col("simhash"), explode(sequence(lit(0), lit(3))).as("bandidx"))
      .withColumn("bandval", expr("(simhash >> (bandidx * 8)) & 255"))
    val firstAgreeingBand = (0 until 3).map(j =>
        col("a.bandidx") <= j ||
          (shiftright(col("a.simhash").bitwiseXOR(col("b.simhash")), 8 * j)
            .bitwiseAND(255) =!= 0))
      .reduce(_ && _)
    val half = banded.as("a")
      .join(banded.as("b"),
        col("a.bandidx") === col("b.bandidx") &&
          col("a.bandval") === col("b.bandval") &&
          col("a.simhash") < col("b.simhash"))
      .filter(firstAgreeingBand)
      .select(col("a.simhash").as("f"), col("b.simhash").as("g"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
    // matched fingerprint pairs in BOTH directions plus the f = g
    // diagonal (Hamming 0): probing every doc's hash against this frame
    // with doc_a < doc_b emits each qualifying doc pair exactly once —
    // from the side holding the smaller doc — and spreads the pair
    // EXPANSION across probe rows (a hot fingerprint's pairs come out
    // of many probe tasks, not one hot join key; output skew from
    // multiplicity never lands on a single reducer).
    val matched = half
      .union(half.select(col("g").as("f"), col("f").as("g"), col("hamming")))
      .union(fp.select(col("simhash")).distinct()
        .select(col("simhash").as("f"), col("simhash").as("g"),
          lit(0).cast("int").as("hamming")))
    // only `matched` (distinct-pair-sized) takes a broadcast hint; the
    // per-doc id→hash frame carries NONE — a pinned broadcast of a
    // corpus-sized frame does not degrade gracefully (driver collect,
    // then OOM), it has to become a shuffle join on the fingerprint key
    // at scale (AQE still broadcasts it at spec scale on measured
    // size). A hot fingerprint (one degenerate hash over a huge doc
    // group) would then serialize its whole pair expansion on one
    // reducer — AQE's skew split sees INPUT partition sizes, not
    // output multiplicity — so the join is salted explicitly: probe
    // rows take salt = doc_a mod S (no replication on the
    // matched-degree-sized side), the slim id→hash side replicates
    // ×S, and every fingerprint's expansion spreads across S reducers
    // regardless of its doc multiplicity.
    val probe = fp.select(col("simhash").as("f"), col("doc_id").as("doc_a"))
      .join(broadcast(matched), "f")
      .withColumn("salt", pmod(col("doc_a"), lit(SimhashSaltBuckets))
        .cast("int"))
    val build = fp.select(col("simhash").as("g"), col("doc_id").as("doc_b"))
      .withColumn("salt",
        explode(sequence(lit(0), lit(SimhashSaltBuckets - 1))))
    probe.join(build, Seq("g", "salt"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Bucketed digest of the simhash near-dup pair set: the same pair
    * pipeline as [[simhashPairs]], folded to 64 per-bucket rows of
    * count / hamming mass / order-independent row checksum / doc_b
    * extrema. This is the gate the SCALE rehearsals run: at sf2 the
    * pair output is ~600M rows and `dedup_simhash`'s oracle-mandated
    * global sort costs more than finding the pairs — a production
    * dedup pipeline consumes the pairs via a keyed aggregate (cluster
    * fold, survivor pick), never a total order, so the digest is the
    * faithful scale measurement AND a full-strength correctness gate
    * (the md5 row checksum pins every (doc_a, doc_b, hamming) triple).
    * All integers; the checksum sum stays within BIGINT to ~2e9 pairs
    * per bucket (2^32-max addends) — far past the sf2 operating point.
    */
  def simhashDigest(spark: SparkSession, sfDir: String, maxHamming: Int = 3): DataFrame =
    simhashPairFrame(spark, sfDir, maxHamming)
      .groupBy(pmod(col("doc_a"), lit(64)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("hamming").cast("long")).as("sum_hamming"),
        sum(conv(substring(md5(concat(col("doc_a").cast("string"),
          lit(","), col("doc_b").cast("string"), lit(","),
          col("hamming").cast("string"))), 1, 8), 16, 10).cast("long"))
          .cast("long").as("checksum"),
        min("doc_b").as("min_doc_b"), max("doc_b").as("max_doc_b"))
      .orderBy("bucket")

  /** Salt fan-out for [[simhashPairs]]' doc-expansion join — wide
    * enough to spread a degenerate fingerprint's expansion across a
    * stage's worth of reducers, narrow enough that the ×S replication
    * of the slim id→hash frame stays noise against the pair output.
    */
  val SimhashSaltBuckets: Int = 16

  /** Embedding-cosine near-dup pairs (brute force over the bucketable
    * corpus; the ANN path for scale lives in [[Similarity]]). The dot
    * product is a sequential double fold over float→double casts — the
    * same IEEE operation order as the oracle's list_sum, hence
    * bit-identical.
    */
  def embeddingNearDups(spark: SparkSession, sfDir: String, threshold: Double = 0.4): DataFrame =
    exactCosinePairs(spark, sfDir, threshold).orderBy("vec_a", "vec_b")

  /** The brute-force pair frame behind [[embeddingNearDups]], memoized
    * per (context, dir, threshold) — it is the shared GROUND TRUTH of
    * every LSH recall audit (capped, multiprobe, banded, sampled), and
    * `lshRecallEval` alone referenced it twice in one plan. One O(n²)
    * pass per process instead of six.
    */
  private val cosinePairCache =
    Memo.registry[(org.apache.spark.SparkContext, String, Double)]

  private[graft] def exactCosinePairs(spark: SparkSession, sfDir: String,
                                      threshold: Double): DataFrame =
    cosinePairCache.synchronized {
      cosinePairCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, threshold), {
          graft.functions.GraftFunctions.register(spark)
          val e = Tables.embeddings(spark, sfDir)
            .select(col("vec_id"), col("embedding"),
              Similarity.norm2(col("embedding")).as("nrm"))
          // single-file corpus → single split: spread the streamed side
          // so the O(n²) dot products parallelize (see
          // embeddingNearDupsLsh)
          e.repartition(spark.sparkContext.defaultParallelism)
            .as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
            .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
              (Similarity.dot(col("a.embedding"), col("b.embedding")) /
                (col("a.nrm") * col("b.nrm"))).as("cosine"))
            .filter(col("cosine") >= threshold)
            .localCheckpoint(true)
        })
    }

  /** The 100 TB path for embedding near-dup: banded-LSH candidate join
    * instead of the all-pairs cross product. Signatures are the
    * deterministic hyperplane scheme of [[Similarity.lshSignature]]
    * (md5-parity plane signs, dim-ordered folds — bit-identical in the
    * oracle), cut into `nBands` independent tables of `bandBits` planes;
    * candidates are pairs agreeing on at least one band, emitted exactly
    * once (at their lowest agreeing band — no pair-set distinct), then
    * verified by exact cosine.
    *
    * Parameter discipline (the standard (b, L) banding calculus): a pair
    * at angle θ disagrees per plane with p = θ/π, collides per band with
    * (1-p)^b, and is missed with (1-(1-p)^b)^L. The defaults are tuned to
    * THIS corpus's density — exact pairs live at cosine 0.4–0.55
    * (p ≈ 0.31–0.37), so b=3, L=21 gives recall ≥ 1-(1-0.63³)²¹ ≈ 0.998
    * at the threshold (asserted ≥ 0.95 against the exact variant in
    * TrainingSetsSpec). At such a loose threshold the bands are
    * necessarily coarse (8 buckets each) — pruning is weak because
    * θ→66° pairs are barely more collision-prone than random, which is
    * exactly why the exact sibling is the right tool on a bucketable
    * corpus. At production near-dup thresholds (cosine ≥ 0.8, p ≤ 0.2)
    * the SAME machinery with b≈8, L≈17 gives 0.95+ recall with
    * 256-bucket selectivity per table — b grows with log(n) to keep
    * buckets small, L restores recall.
    */
  /** Signature + slim banded frames for the hyperplane-LSH family —
    * ONE construction for [[embeddingNearDupsLsh]],
    * [[embeddingNearDupsLshCapped]] and [[lshRecallEval]] so the
    * signature scheme and bucket math cannot drift between the three.
    * The banded frame stays SLIM (id, sig, band, bucket): embeddings
    * are re-fetched per candidate via single-match hash joins on
    * vec_id, which beats carrying 64-float arrays through the
    * many-match band join rows (measured 2.3× — array copies per
    * joined row dominate).
    */
  private def lshBandedFrames(spark: SparkSession, sfDir: String,
                              bandBits: Int,
                              nBands: Int): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(spark)
    val nPlanes = bandBits * nBands
    require(nPlanes <= 64, "signature is one 64-bit word")
    val mask = (1L << bandBits) - 1
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        Similarity.norm2(col("embedding")).as("nrm"),
        Similarity.lshSignature(col("embedding"), dim = 64, nPlanes = nPlanes)
          .as("sig"))
    val banded = e.select(col("vec_id"), col("sig"),
        explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("bucket", expr(s"(sig >> (band * $bandBits)) & $mask"))
    (e, banded)
  }

  /** [[embeddingNearDupsLsh]]'s fail-fast headroom: the uncapped query
    * refuses to run when its estimated candidate volume exceeds this
    * multiple of what the capped sibling would enumerate
    * (nBands·n·cap/2). Calibrated against MEASURED est/bound ratios on
    * the rehearsal fixtures (tools.Probe, r12): 0.25 at sf0.01, 1.0 at
    * sf0.1, 10.0 at sf1 (completed in ~22 s) and 20.0 at sf2 — where
    * the uncapped join died in 75 GB of spill after 294 s. With the
    * coarse 8-bucket bands the ratio grows linearly in n regardless of
    * twin density (every bucket holds ~n/8); 16 sits between the
    * survivable and the demonstrated-fatal point.
    */
  val LshGuardHeadroom: Long = 16L

  def embeddingNearDupsLsh(spark: SparkSession, sfDir: String,
                           threshold: Double = 0.4, bandBits: Int = 3,
                           nBands: Int = 21,
                           guardHeadroom: Long = LshGuardHeadroom): DataFrame = {
    val mask = (1L << bandBits) - 1
    val (e, banded) = lshBandedFrames(spark, sfDir, bandBits, nBands)
    // fail-fast density guard: one cheap aggregate over the banded
    // frame BEFORE the candidate join — Σ m·(m−1)/2 over (band, bucket)
    // is exactly the candidate count the join would enumerate; if it
    // exceeds guardHeadroom × the capped sibling's hard bound, this
    // query is the wrong tool for the corpus's duplication density and
    // dying in spill hours later helps nobody. The eager one-row action
    // is the guard itself, not a driver-side compute path.
    // integer-exact estimate: bn*(bn-1) DIV 2 through DECIMAL(38,0), so
    // the guard stays exact past 2^53 candidates — double division would
    // go approximate exactly in the density regime the guard protects
    val stats = banded.groupBy("band", "bucket")
      .agg(count(lit(1)).as("bn"))
      .agg(sum(expr("CAST(bn AS DECIMAL(38,0)) * (bn - 1) DIV 2"))
        .cast("decimal(38,0)").as("est"),
        sum("bn").cast("long").as("rows"))
      .first()
    val est = BigDecimal(stats.getDecimal(0))
    val nVecs = stats.getLong(1) / nBands
    val capBound = BigDecimal(nBands) * BigDecimal(nVecs) *
      BigDecimal(LshBucketCap) / 2
    if (est > BigDecimal(guardHeadroom) * capBound)
      throw new IllegalStateException(
        s"embeddingNearDupsLsh: estimated candidate volume $est exceeds " +
          s"$guardHeadroom x the capped bound $capBound — the corpus's " +
          "duplication density defeats uncapped banding (this exhausted " +
          "75 GB of spill at the 20-twin rehearsal). Run exact dedup " +
          "upstream or use embeddingNearDupsLshCapped, whose work is " +
          "hard-bounded at any density.")
    // emit each pair only at its lowest agreeing band: every lower band's
    // bits of the xor must be non-zero, so no distinct() over the pair set
    val firstAgreeingBand = (0 until nBands - 1).map(j =>
        col("x.band") <= j ||
          (shiftright(col("x.sig").bitwiseXOR(col("y.sig")), j * bandBits)
            .bitwiseAND(mask) =!= 0))
      .foldLeft(lit(true))(_ && _) // foldLeft: nBands=1 has no lower bands
    // the corpus parquet is a single small file → one input split; without
    // an explicit spread the all-broadcast pipeline (band join + verify)
    // runs as ONE task. Round-robin the slim probe side so the many-match
    // probes and per-candidate dot products use every core (measured 4×;
    // at real scale the scan has many splits and this is a no-op-cost
    // narrow shuffle of (id, sig) rows).
    val probe = banded.repartition(spark.sparkContext.defaultParallelism)
    val candidates = probe.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .filter(firstAgreeingBand)
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
    candidates
      .join(e.as("a"), col("vec_a") === col("a.vec_id"))
      .join(e.as("b"), col("vec_b") === col("b.vec_id"))
      .select(col("vec_a"), col("vec_b"),
        (Similarity.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("vec_a", "vec_b")
  }

  /** Overfull-bucket cap for [[embeddingNearDupsLshCapped]] — hoisted so
    * operator and oracle interpolate the same constant. */
  val LshBucketCap: Int = 256

  /** The BOUNDED-WORK variant of [[embeddingNearDupsLsh]]: identical
    * banding, but any (band, bucket) holding more than [[LshBucketCap]]
    * signatures is skipped — the standard overfull-bucket discipline of
    * production LSH indexes (a bucket that dense is either a degenerate
    * hash cell or a pile of exact duplicates that belongs to the exact
    * dedup pass upstream, not to pairwise enumeration). Candidate volume
    * is then hard-bounded by nBands · n · cap/2 REGARDLESS of corpus
    * duplication density; recall loss is confined to the skipped cells
    * and measurable against the uncapped sibling.
    *
    * Motivation measured, not hypothetical: on the 20-twin replicate sf2
    * rehearsal the uncapped query's candidate join (pair density ×400 vs
    * sf0.1) exhausted this host's 75 GB of spill — while the composed
    * curation pipeline (exact-dedup first) stayed flat. Capped banding
    * is the third leg: near-dup candidates with a work bound that holds
    * even when upstream hygiene failed. Because capping breaks the
    * lowest-agreeing-band emission trick (a pair's lowest band may be a
    * skipped cell), pairs dedup via a distinct over the CAPPED — hence
    * bounded — candidate set instead.
    *
    * Band width: capping only bites when buckets are SELECTIVE, so this
    * variant runs the scaladoc calculus's production setting — 7 bands
    * of 8 bits (256 buckets per band, 56 planes — p = 63 would put the
    * int64 sign bit in play on the SQL side; b grows with log n) — not the
    * sibling's recall-tuned (3, 21). At the loose 0.4 threshold the
    * fine bands trade recall for precision (the documented
    * 1-(1-(1-p)^b)^L curve); at production thresholds (≥ 0.8) they
    * recover 0.95+ — this is the high-selectivity tier, audited like
    * everything else by its exact sibling.
    */
  def embeddingNearDupsLshCapped(spark: SparkSession, sfDir: String,
                                 threshold: Double = 0.4, bandBits: Int = 8,
                                 nBands: Int = 7,
                                 cap: Int = LshBucketCap): DataFrame =
    cappedPairCache.synchronized {
      cappedPairCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, threshold, bandBits, nBands, cap),
        embeddingNearDupsLshCappedBuild(spark, sfDir, threshold, bandBits,
          nBands, cap).localCheckpoint(true))
    }

  /** Memo for the capped-banding pair frame — three gated consumers
    * (the op itself, the capped recall audit, the multiprobe audit's
    * baseline row) each re-ran the bucket self-join per query.
    */
  private val cappedPairCache = Memo.registry[
    (org.apache.spark.SparkContext, String, Double, Int, Int, Int)]

  private def embeddingNearDupsLshCappedBuild(
      spark: SparkSession, sfDir: String, threshold: Double, bandBits: Int,
      nBands: Int, cap: Int): DataFrame = {
    val (e, banded0) = lshBandedFrames(spark, sfDir, bandBits, nBands)
    val banded = banded0.select("vec_id", "band", "bucket")
    val sizes = banded.groupBy("band", "bucket")
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= cap)
    val kept = banded.join(broadcast(sizes.select("band", "bucket")),
      Seq("band", "bucket"))
    val probe = kept.repartition(spark.sparkContext.defaultParallelism)
    val candidates = probe.as("x")
      .join(kept.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    candidates
      .join(e.as("a"), col("vec_a") === col("a.vec_id"))
      .join(e.as("b"), col("vec_b") === col("b.vec_id"))
      .select(col("vec_a"), col("vec_b"),
        (Similarity.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("vec_a", "vec_b")
  }

  /** MULTI-PROBE variant of [[embeddingNearDupsLshCapped]] — the
    * standard production lever for recovering the recall a
    * high-selectivity banding pays (Lv et al. 2007, "Multi-probe LSH",
    * VLDB — public method): besides its home bucket, every signature
    * PROBES the `bandBits` neighboring buckets at Hamming distance 1
    * per band (flip one band bit per probe — the most-likely-miss
    * cells under the hyperplane model, where a near pair differs in
    * few plane signs). Stored side stays the cap-filtered home
    * buckets; the probe side expands to (1 + bandBits) buckets per
    * (vector, band), each probed only if it survived the cap — so the
    * candidate volume is hard-bounded by nBands · (1+bandBits) · n ·
    * cap at ANY duplication density, a (1+bandBits)× bound growth that
    * buys back most of the fine-band recall loss
    * ([[lshMultiprobeRecallEval]] prices it, gated). Pairs are
    * canonicalized (least, greatest) before the distinct because the
    * probe relation is asymmetric; exact-cosine verify as always.
    */
  def embeddingNearDupsLshMultiprobe(spark: SparkSession, sfDir: String,
                                     threshold: Double = 0.4,
                                     bandBits: Int = 8, nBands: Int = 7,
                                     cap: Int = LshBucketCap): DataFrame =
    multiprobePairCache.synchronized {
      multiprobePairCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, threshold, bandBits, nBands, cap),
        embeddingNearDupsLshMultiprobeBuild(spark, sfDir, threshold,
          bandBits, nBands, cap).localCheckpoint(true))
    }

  private val multiprobePairCache = Memo.registry[
    (org.apache.spark.SparkContext, String, Double, Int, Int, Int)]

  private def embeddingNearDupsLshMultiprobeBuild(
      spark: SparkSession, sfDir: String, threshold: Double, bandBits: Int,
      nBands: Int, cap: Int): DataFrame = {
    val (e, banded0) = lshBandedFrames(spark, sfDir, bandBits, nBands)
    val banded = banded0.select("vec_id", "band", "bucket")
    val sizes = banded.groupBy("band", "bucket")
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= cap)
    val kept = banded.join(broadcast(sizes.select("band", "bucket")),
      Seq("band", "bucket"))
    // home bucket + one flipped bit per probe; only cap-surviving
    // target cells are probed
    val probes = banded
      .select(col("vec_id"), col("band"),
        explode(array(col("bucket") +:
          (0 until bandBits).map(b =>
            col("bucket").bitwiseXOR(lit(1L << b))): _*)).as("bucket"))
      .join(broadcast(sizes.select("band", "bucket")), Seq("band", "bucket"))
      .repartition(spark.sparkContext.defaultParallelism)
    val candidates = probes.as("x")
      .join(kept.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(least(col("x.vec_id"), col("y.vec_id")).as("vec_a"),
        greatest(col("x.vec_id"), col("y.vec_id")).as("vec_b"))
      .distinct()
    candidates
      .join(e.as("a"), col("vec_a") === col("a.vec_id"))
      .join(e.as("b"), col("vec_b") === col("b.vec_id"))
      .select(col("vec_a"), col("vec_b"),
        (Similarity.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("vec_a", "vec_b")
  }

  /** Recall audit for the multi-probe scheme, side by side with the
    * capped home-bucket scheme it extends — one exact ground truth,
    * two variant rows ('capped', 'multiprobe'), so the gated numbers
    * read directly as "what the extra probes buy at what candidate
    * cost" (recall_ppm up, n_cand bounded by the documented
    * (1+bandBits)× growth).
    */
  def lshMultiprobeRecallEval(spark: SparkSession, sfDir: String,
                              threshold: Double = 0.4): DataFrame = {
    val exact = exactCosinePairs(spark, sfDir, threshold)
      .select("vec_a", "vec_b")
    // each candidate frame feeds BOTH its count and the tp semi-join —
    // checkpoint so the banding pipeline runs once, not per reference
    def row(variant: String, cand0: DataFrame): DataFrame = {
      val cand = cand0.localCheckpoint(true)
      val tp = cand.join(exact, Seq("vec_a", "vec_b"), "left_semi")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
        .crossJoin(tp.agg(count(lit(1)).as("tp")))
        .select(lit(variant).as("variant"),
          col("n_exact"), col("n_cand"), col("tp"),
          (col("n_exact") - col("tp")).as("fn"),
          when(col("n_exact") === 0L, lit(1000000L))
            .otherwise(expr("(tp * 1000000) DIV n_exact"))
            .cast("long").as("recall_ppm"))
    }
    row("capped",
        embeddingNearDupsLshCapped(spark, sfDir, threshold)
          .select("vec_a", "vec_b"))
      .unionByName(row("multiprobe",
        embeddingNearDupsLshMultiprobe(spark, sfDir, threshold)
          .select("vec_a", "vec_b")))
      .orderBy("variant")
  }

  /** The hyperplane-LSH banding audited against the exact-cosine ground
    * truth — the embedding-space sibling of [[minhashRecallEval]], and
    * the measurement behind [[embeddingNearDupsLsh]]'s documented
    * (b, L) recall calculus: candidate count, true positives, missed
    * pairs (fn) and sub-threshold candidates (fp), all integer. The
    * candidate set is recomputed from the SAME banding expressions as
    * the production op (one shared private builder would be tidier, but
    * the two frames differ in probe-spread plumbing; the oracle pins
    * both to identical values), the ground truth is the brute-force
    * cosine op — honest at audit scale, with the audit itself the tool
    * that licenses trusting the banded path at corpus scale.
    */
  def lshRecallEval(spark: SparkSession, sfDir: String,
                    threshold: Double = 0.4, bandBits: Int = 3,
                    nBands: Int = 21): DataFrame = {
    val mask = (1L << bandBits) - 1
    val (_, banded) = lshBandedFrames(spark, sfDir, bandBits, nBands)
    val firstAgreeingBand = (0 until nBands - 1).map(j =>
        col("x.band") <= j ||
          (shiftright(col("x.sig").bitwiseXOR(col("y.sig")), j * bandBits)
            .bitwiseAND(mask) =!= 0))
      .foldLeft(lit(true))(_ && _)
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .filter(firstAgreeingBand)
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
    val exact = exactCosinePairs(spark, sfDir, threshold)
      .select("vec_a", "vec_b")
    val tp = cand.join(exact, Seq("vec_a", "vec_b"), "left_semi")
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .crossJoin(tp.agg(count(lit(1)).as("tp")))
      .select(col("n_exact"), col("n_cand"), col("tp"),
        (col("n_exact") - col("tp")).as("fn"),
        (col("n_cand") - col("tp")).as("fp"))
  }

  /** [[lshRecallEval]] on a deterministic md5-coin stratum — the
    * executable form of the "sampled stratum at production" posture the
    * audit trilogy's scaladocs document: pairs are restricted by their
    * SMALLER endpoint's coin (vec_a is always the smaller id on both
    * the candidate and ground-truth sides, so one row-local predicate
    * restricts both identically), the larger side stays the full
    * corpus. Recall/precision over min-id-stratified pairs is an
    * unbiased estimate of the full confusion matrix, and the
    * brute-force ground truth — the audit's honest cost — drops to
    * pct% of the corpus² compute. Same portable coin as
    * [[TrainingSets.stratifiedSample]], so the oracle samples
    * identically and the gate stays integer-exact.
    */
  def lshRecallSampled(spark: SparkSession, sfDir: String,
                       threshold: Double = 0.4, bandBits: Int = 3,
                       nBands: Int = 21, pct: Int = 20): DataFrame = {
    val mask = (1L << bandBits) - 1
    val (e, banded) = lshBandedFrames(spark, sfDir, bandBits, nBands)
    val strat = TrainingSets.bucket100(col("vec_id")) < pct
    val firstAgreeingBand = (0 until nBands - 1).map(j =>
        col("x.band") <= j ||
          (shiftright(col("x.sig").bitwiseXOR(col("y.sig")), j * bandBits)
            .bitwiseAND(mask) =!= 0))
      .foldLeft(lit(true))(_ && _)
    val cand = banded.filter(strat).as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .filter(firstAgreeingBand)
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
    // stratified brute force: a-side is the stratum, b-side the full
    // corpus (spread like embeddingNearDups so the pct·n² dot products
    // parallelize past the single-file input split)
    val exact = e.filter(strat)
      .repartition(spark.sparkContext.defaultParallelism)
      .as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(Similarity.dot(col("a.embedding"), col("b.embedding")) /
        (col("a.nrm") * col("b.nrm")) >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
    val tp = cand.join(exact, Seq("vec_a", "vec_b"), "left_semi")
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .crossJoin(tp.agg(count(lit(1)).as("tp")))
      .select(col("n_exact"), col("n_cand"), col("tp"),
        (col("n_exact") - col("tp")).as("fn"),
        (col("n_cand") - col("tp")).as("fp"))
  }

  /** Recall/precision audit for [[embeddingNearDupsLshCapped]] — the
    * capped production scheme gets the same brute-force confusion
    * matrix every other approximation in the repo carries
    * ([[lshRecallEval]] audits the recall-tuned sibling). The capped
    * variant's candidate set is the VERIFIED pair output (cosine gate
    * already applied), so fp counts pairs whose bucket agreed but whose
    * bucket survived the cap and still failed nothing — by construction
    * 0; the interesting numbers are tp/fn: how much recall the
    * fine-band + cap trade actually costs on THIS corpus at the loose
    * 0.4 threshold (the scaladoc calculus predicts most of the loss
    * comes from the 8-bit bands, not the cap, at sf0.001–0.01
    * densities). All-integer gate; ground truth is the honest
    * brute-force (documented sampled-stratum at production scale).
    */
  def lshCappedRecallEval(spark: SparkSession, sfDir: String,
                          threshold: Double = 0.4): DataFrame = {
    val cand = embeddingNearDupsLshCapped(spark, sfDir, threshold)
      .select("vec_a", "vec_b")
    val exact = exactCosinePairs(spark, sfDir, threshold)
      .select("vec_a", "vec_b")
    val tp = cand.join(exact, Seq("vec_a", "vec_b"), "left_semi")
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .crossJoin(tp.agg(count(lit(1)).as("tp")))
      .select(col("n_exact"), col("n_cand"), col("tp"),
        (col("n_exact") - col("tp")).as("fn"),
        // vacuously complete when the ground truth is empty (the
        // post-exact-dedup corpus the capped variant is built for)
        when(col("n_exact") === 0L, lit(1000000L))
          .otherwise(expr("(tp * 1000000) DIV n_exact"))
          .cast("long").as("recall_ppm"))
  }
}
