package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** k-NN-graph construction by NN-descent (Dong, Moses & Li 2011,
  * "Efficient k-nearest neighbor graph construction for generic
  * similarity measures", WWW — public method): start every vertex with
  * a deterministic pseudo-random neighbor list, then iteratively
  * improve it on the observation that *a neighbor of my neighbor is
  * likely my neighbor* — each round proposes, for every vertex, the
  * neighbors-of-neighbors (forward AND reverse adjacency, the paper's
  * "general neighbors"), scores the proposals exactly, and keeps the k
  * best. The graph-based index family (NN-descent feeds HNSW/NSG-style
  * serving structures) — the third production ANN family next to the
  * repo's LSH and IVF/PQ tiers, and the natural composition with the
  * dedup-graph tier: the finished edge list is exactly what
  * `dedup_clusters`/`graph_pagerank` consume.
  *
  * Spark shape (the 100 TB posture):
  *  - the per-round candidate generator is a self-join of the adjacency
  *    list on its SOURCE key — per-vertex candidates are bounded by
  *    (2k)², so a round is O(n·k²) slim integer rows, never all-pairs;
  *  - scoring joins candidates to the corpus twice by equi-key (hash
  *    joins, corpus never cross-joined);
  *  - top-k selection is a `row_number` window partitioned by vertex —
  *    partitions are (k + (2k)²)-bounded, no global sort anywhere
  *    (final `orderBy` is presentation only);
  *  - each round's edge frame is localCheckpointed: round r+1's
  *    self-join references round r's frame four times, which without
  *    the checkpoint would re-execute the whole prior-round subtree
  *    per reference (the Lloyd/chi² discipline).
  *
  * Determinism/oracle: the initial graph replaces the paper's RNG with
  * the repo's md5 draw — neighbor j of vertex i is
  * `md5("i,j") mod n` — and rounds are a FIXED count, so the whole
  * construction is a pure function of the corpus and both engines
  * replay it bit-for-bit: distances are the standard x·x − 2·x·y + y·y
  * double fold (identical to DuckDB's `list_sum`), selection ties
  * break (dist, dst), and the gated output floors distances to BIGINT
  * micro-units at source.
  */
object KnnGraph {

  /** Neighbors kept per vertex. */
  val K: Int = 8

  /** Fixed NN-descent refinement rounds (0 = the md5-random init).
    * Convergence needs ~log_k(n) rounds (each round roughly halves the
    * graph-hop distance between a vertex and its true neighbors): 3
    * suffices at spec scale (n = 500, recall 0.75), production depth
    * is ⌈log_8 n⌉ (5–6 at the 20k/40k fixtures, ~12 at 10¹¹ vectors).
    * Env-overridable (GRAFT_KNNG_ROUNDS) with the oracle interpolating
    * the same constant at object init — the IvfPqCells discipline — so
    * the gate replays production depth at scale fixtures.
    */
  val Rounds: Int = graft.EnvKnobs.posInt("GRAFT_KNNG_ROUNDS", 3)

  /** Hash buckets for the init-draw rank domain (uniform ~n/B window
    * partitions; raise with corpus size).
    */
  val RankBuckets: Int = 256

  /** Beam width / fixed hop count / entry fan-out for the greedy
    * serving descent. Multi-entry seeding matters because the serving
    * graph's out-edges are DETERMINISTIC: exploration only grows when
    * the beam moves, so independent starting points (the standard
    * multi-seed search) buy coverage that a single entry cannot.
    * Env-overridable (the GRAFT_KNNG_ROUNDS / GRAFT_IVFPQ_* knob
    * discipline — the oracle interpolates the same constants at object
    * init, so one JVM run can never see drifted values): at 100 TB the
    * hop count must grow ~log n, which is a config change, not a code
    * edit.
    */
  val SearchBeam: Int = graft.EnvKnobs.posInt("GRAFT_GRAPH_BEAM", 8)
  val SearchHops: Int = graft.EnvKnobs.posInt("GRAFT_GRAPH_HOPS", 5)
  val SearchEntries: Int = graft.EnvKnobs.posInt("GRAFT_GRAPH_ENTRIES", 8)

  /** Out-degree of an INSERTED vector (the NSW insertion fan-out): the
    * k best vertices its own search finds, bounded by what the beam can
    * carry. One shared constant binds the engine's write-path filter
    * and the oracle's beam-row bound — tuning [[SearchBeam]] alone can
    * never desynchronize them.
    */
  val InsertFanout: Int = math.min(K, SearchBeam)

  /** Finished graphs keyed (context, dir, rounds, population) — shared
    * by the build query, the recall audit, the serving descent, and
    * any graph-tier consumer.
    */
  private val graphCache =
    Memo.registry[(org.apache.spark.SparkContext, String, Int, String)]

  private def corpus(spark: SparkSession, sfDir: String): DataFrame = {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        Similarity.dot(col("embedding"), col("embedding")).as("sq"))
  }

  /** Exact squared-L2 for each (src, dst) pair — two corpus-keyed hash
    * joins, the bit-portable double fold. Join order is dst THEN src
    * (identical inner-join rows and arithmetic) so that when the src
    * join shuffles at scale the output is clustered by src — exactly
    * the distribution [[topK]]'s window needs, saving one exchange
    * (guide §2.4: share the partitioning two keyed operations agree on).
    */
  private def withDist(pairs: DataFrame, e: DataFrame): DataFrame =
    pairs
      .join(e.select(col("vec_id").as("dst"), col("embedding").as("d_emb"),
        col("sq").as("d_sq")), "dst")
      .join(e.select(col("vec_id").as("src"), col("embedding").as("s_emb"),
        col("sq").as("s_sq")), "src")
      .select(col("src"), col("dst"),
        (col("s_sq") + col("d_sq") -
          lit(2.0) * Similarity.dot(col("s_emb"), col("d_emb"))).as("dist"))

  /** The deterministic init adjacency over the ACTUAL id set, vec_ids
    * being arbitrary (a mod-n draw on raw ids silently under-fills
    * neighbor lists wherever the id space is sparse): build a dense
    * 0..n−1 rank with the bucket-offset idiom (globalRankDocs — the
    * cumsum window runs over B bucket-count rows, per-bucket windows
    * are uniform ~n/B hash slices, no global single-partition sort),
    * draw md5("i,j") mod n in RANK space, then map rank → vec_id with
    * one corpus-keyed join. Besides seeding the descent rounds, these
    * md5-random lists double as the serving graph's LONG-RANGE links
    * ([[servingGraph]]).
    */
  private def initEdges(e: DataFrame): DataFrame = {
    // one explicit bkt clustering feeds BOTH the bucket-count aggregate
    // and the per-bucket rank window (guide §2.4: two operations keyed
    // the same way share one exchange); AQE reuses the stage across the
    // main chain and the two broadcast subtrees
    val withB = e.select(col("vec_id"),
      pmod(conv(substring(md5(col("vec_id").cast("string")), 1, 8),
        16, 10).cast("long"), lit(RankBuckets)).as("bkt"))
      .repartition(col("bkt"))
    val counts = withB.groupBy("bkt").agg(count(lit(1)).as("cnt"))
    val offsets = counts.withColumn("offset",
      coalesce(sum("cnt").over(
        Window.orderBy("bkt").rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
    val rankMap = withB
      .join(broadcast(offsets.select(col("bkt"), col("offset"))), "bkt")
      .select((col("offset") + row_number().over(
          Window.partitionBy("bkt").orderBy("vec_id")).cast("long") -
          1L).as("rnk"),
        col("vec_id").as("dst"))
    val nRow = counts.agg(sum("cnt").as("n"))
    // neighbor j of vertex i sits at rank md5("i,j") mod n
    e.select(col("vec_id").as("src"))
      .crossJoin(broadcast(nRow))
      .select(col("src"),
        explode(sequence(lit(0), lit(K - 1))).as("j"), col("n"))
      .select(col("src"),
        pmod(conv(substring(md5(concat_ws(",", col("src"), col("j"))),
          1, 8), 16, 10).cast("long"), col("n")).as("rnk"))
      .join(rankMap, "rnk")
      .select(col("src"), col("dst"))
      .filter(col("dst") =!= col("src"))
      // src clustering serves the dedup (ClusteredDistribution(src,
      // dst) is satisfied by hash(src)) AND survives the memo
      // checkpoint into every consumer's first src-keyed window/top-k
      // (guide §2.4) — one exchange does both jobs
      .repartition(col("src"))
      .distinct()
  }

  /** [[initEdges]] over a NAMED population, memoized and checkpointed —
    * every build-plus-serve pair on the same population (the cold graph
    * seeds with the md5-random draw AND the serving set unions the same
    * draw back in as long-range links) previously executed the whole
    * bucket-offset rank-map pipeline twice (r18 profile: ~8 scheduled
    * jobs per execution). One materialization serves both consumers.
    */
  private def initEdgesShared(spark: SparkSession, sfDir: String,
                              key: String, e: DataFrame): DataFrame =
    graphCache.synchronized {
      graphCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, Rounds, key),
        initEdges(e).localCheckpoint(true))
    }

  /** Keep each vertex's k best (dist, dst) — bounded partitions. */
  private def topK(scored: DataFrame): DataFrame =
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("src").orderBy(col("dist"), col("dst"))))
      .filter(col("rank") <= K)

  /** The NN-descent graph after `rounds` refinement rounds:
    * (src, dst, dist, rank), k rows per vertex.
    */
  private[graft] def graph(spark: SparkSession, sfDir: String,
                           rounds: Int = Rounds): DataFrame =
    graphCache.synchronized {
      graphCache.getOrElseUpdate((spark.sparkContext, sfDir, rounds, "full"),
        graphOf(corpus(spark, sfDir), rounds))
    }

  /** The even-half serving graph (index side of the probe family —
    * the streamPqProbe convention: even vec_ids are the frozen index,
    * odd ones the query fleet).
    */
  private[graft] def probeGraph(spark: SparkSession,
                                sfDir: String): DataFrame =
    graphCache.synchronized {
      graphCache.getOrElseUpdate((spark.sparkContext, sfDir, Rounds, "even"), {
        val even = corpus(spark, sfDir).filter(col("vec_id") % 2 === 0)
        graphOf(even, Rounds,
          Some(initEdgesShared(spark, sfDir, "init-even", even)))
      })
    }

  /** The SERVING edge set: refined k-NN edges ∪ the md5-random init
    * links — the NSW small-world augmentation (Malkov et al. keep
    * construction-time long links for exactly this): a pure k-NN graph
    * over clustered data is disconnected by cluster, so greedy descent
    * could never leave the entry's component; the deterministic
    * long-range links restore global navigability while adding only
    * k rows per vertex.
    */
  private[graft] def servingGraph(spark: SparkSession,
                                  sfDir: String): DataFrame =
    graphCache.synchronized {
      graphCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, Rounds, "even-serve"), {
          val even = corpus(spark, sfDir).filter(col("vec_id") % 2 === 0)
          servingEdgesOf(even, probeGraph(spark, sfDir),
            Some(initEdgesShared(spark, sfDir, "init-even", even)))
        })
    }

  /** [[servingGraph]] over arbitrary frames — shared with the spec. */
  private[graft] def servingEdgesOf(e: DataFrame, knn: DataFrame,
                                    init: Option[DataFrame] = None): DataFrame =
    knn.select(col("src"), col("dst"))
      .union(init.getOrElse(initEdges(e)))
      .distinct()
      .localCheckpoint(true)

  /** [[graph]] over an arbitrary (vec_id, embedding, sq) frame — the
    * spec runs it on a planted-cluster corpus to assert convergence
    * where local structure exists (the gated fixtures are
    * near-isotropic by design, where NO neighbor-descent method beats
    * explored-fraction recall — that honest number is exactly what
    * [[knnGraphRecall]] reports).
    */
  private[graft] def graphOf(e0: DataFrame, rounds: Int,
                             init: Option[DataFrame] = None): DataFrame =
    refineRounds(e0,
      topK(withDist(init.getOrElse(initEdges(e0)), e0)), rounds)

  /** The NN-descent refinement loop from an ARBITRARY scored starting
    * adjacency — shared by the cold build ([[graphOf]], md5-random
    * init) and the WARM rebuild ([[warmRebuildOf]], accreted-edge
    * init).
    */
  private def refineRounds(e: DataFrame, edges0: DataFrame,
                           rounds: Int): DataFrame = {
        var edges = Memo.scratchCheckpoint(edges0)
        for (_ <- 1 to rounds) {
          val fwd = edges.select(col("src"), col("dst"))
          // general neighbors: forward ∪ reverse adjacency
          val gen = fwd.union(
            edges.select(col("dst").as("src"), col("src").as("dst")))
          // neighbors-of-neighbors through the shared pivot, ∪ current
          // edges (distances are pure functions of the pair, so
          // re-scoring survivors costs n·k extra dot products and keeps
          // the round one uniform score+select pass). Dedup stays
          // BEFORE scoring here — unlike the serving descent, a pair is
          // regenerated once per shared pivot (up to 2k times), so
          // pre-score distinct removes ~k× of the scoring joins' work
          // for the price of its one slim exchange.
          // the explicit src clustering serves BOTH the candidate
          // distinct (ClusteredDistribution(src, dst) is satisfied by
          // hash(src)) and — at spec scale, where the corpus joins
          // broadcast — topK's src window: one exchange per round
          // instead of two (guide §2.4); at corpus scale the dst/src
          // shuffle joins re-cluster anyway and the window still rides
          // the src join (the r18 withDist ordering)
          val cand = gen.as("g1").join(gen.as("g2"), Seq("src"))
            .select(col("g1.dst").as("src"), col("g2.dst").as("dst"))
            .filter(col("src") =!= col("dst"))
            .union(fwd)
            .repartition(col("src"))
            .distinct()
          edges = Memo.scratchCheckpoint(topK(withDist(cand, e)))
        }
        edges
  }

  /** WARM incremental rebuild — the fold that closes the index
    * lifecycle (the reference's background part merge,
    * `clickhouse/init/01_init.sql:27-31`, as an index operation):
    * instead of restarting NN-descent from the md5-random draw, seed
    * it with the ACCRETED edge set (base k-NN ∪ long-range links ∪
    * segment forward edges ∪ derived back-links — exactly what serving
    * already composes), score that adjacency once, and refine for
    * `rounds` (1 at the gate) over the merged population. The base
    * vertices start at their already-converged neighborhoods and the
    * inserted vertices start at their descent beams, so one round of
    * general-neighbor exchange is enough to stitch both sides — vs
    * ⌈log_k n⌉ rounds from random init (Round16Spec proves the gap on
    * planted clusters). At 100 TB this is the difference between a
    * nightly full rebuild and a cheap rolling fold.
    */
  private[graft] def warmRebuildOf(e: DataFrame, accEdges: DataFrame,
                                   rounds: Int): DataFrame =
    refineRounds(e,
      topK(withDist(accEdges.filter(col("src") =!= col("dst")), e)),
      rounds)

  /** The gated build: the finished graph's edge list, distances floored
    * to micro-units at source.
    */
  def knnGraphBuild(spark: SparkSession, sfDir: String): DataFrame =
    graph(spark, sfDir)
      .select(col("src").as("vec_id"), col("rank").cast("long").as("rank"),
        col("dst").as("nbr"),
        floor(col("dist") * lit(1e6)).cast("long").as("dist_u"))
      .orderBy("vec_id", "rank")

  /** Greedy graph-descent serving — how a graph index ANSWERS queries
    * (the search layer of HNSW/NSG-style structures, reduced to its
    * deterministic core): every query starts a beam at a fixed entry
    * vertex (the index's minimum id), and each of [[SearchHops]] hops
    * expands the beam's graph neighbors, scores candidates exactly,
    * and keeps the [[SearchBeam]] best — best-first descent with a
    * bounded frontier. Per hop the work is beam·k slim integer rows
    * per query: two equi-joins (edges, index embeddings) and a
    * beam-bounded window — no scan of the index ever happens, which
    * is the entire point of serving from a graph.
    *
    * Returns one row per query: (q_id, v, dist) at beam rank 1..B —
    * callers pick rank 1 for the answer. Deterministic: fixed entry,
    * fixed hops, exact double folds, (dist, v) ties.
    */
  private[graft] def greedySearch(qs: DataFrame, idx: DataFrame,
                                  edges: DataFrame): DataFrame = {
    val entry = idx.orderBy("vec_id").limit(SearchEntries)
      .select(col("vec_id").as("v"))
    greedySearchFrom(qs, idx, edges,
      qs.select(col("q_id")).crossJoin(broadcast(entry)))
  }

  /** [[greedySearch]] from an ARBITRARY per-query entry frame
    * (q_id, v) — the hierarchical descent's lower stage enters the base
    * layer at the upper layer's per-query winners instead of the global
    * min-id entries.
    */
  /** The descent is ONE linear query execution (r18): expansion goes
    * through self-loop-augmented edges (neighbors(v) ∪ {v} per beam
    * row — the union-with-frontier of the loop form without a second
    * frontier reference, which keeps the unrolled plan linear in
    * hops), duplicate candidates are dropped AFTER scoring by a
    * (q_id, v) window riding the same explicit q_id clustering the
    * beam window needs (dupes carry identical dist, so the kept rows
    * are bit-identical to the pre-score `.distinct()`), and the static
    * sides (edges, index embeddings, query fleet) each shuffle or
    * broadcast ONCE per descent — AQE reuses their stages across all
    * hops — instead of once per hop. One eager checkpoint materializes
    * the final beam (callers re-reference it freely; the gated frames
    * stay projections over a checkpointed leaf). Measured on the
    * r18 profile harness: graph_fold_decision 395 → ~1/3 the scheduled
    * jobs, zero corpus re-scans mid-descent.
    */
  private[graft] def greedySearchFrom(qs: DataFrame, idx: DataFrame,
                                      edges: DataFrame,
                                      entries: DataFrame): DataFrame = {
    val ev = idx.select(col("vec_id").as("v"), col("embedding").as("v_emb"),
      col("sq").as("v_sq"))
    // neighbors(v) ∪ {v}: every index vertex carries a self-loop, so a
    // single equi-join expands a beam row to its neighborhood AND keeps
    // the row itself in the candidate set
    val esLoop = edges.select(col("src"), col("dst"))
      .union(ev.select(col("v").as("src"), col("v").as("dst")))
    val q = qs.select(col("q_id"), col("q_emb"), col("q_sq"))
    // dedup is a (q_id, v) hash aggregate, not a window: dupes carry
    // identical dist (dist is a pure function of the pair), so
    // min(dist) keeps rows bit-identical to the dup-rank filter — and
    // ClusteredDistribution(q_id, v) is satisfied by ANY q_id hash
    // clustering, so after hop 1's window exchange establishes
    // hash(q_id), every later hop's aggregate AND beam window ride it
    // with ZERO new exchanges (r18 paid one explicit repartition per
    // hop; guide §2.4 — two operations keyed the same way share one
    // exchange, applied across the unrolled hops)
    def score(cand: DataFrame): DataFrame =
      cand
        .join(ev, "v")
        .join(q, "q_id")
        .select(col("q_id"), col("v"),
          (col("q_sq") + col("v_sq") -
            lit(2.0) * Similarity.dot(col("q_emb"), col("v_emb")))
            .as("dist"))
        .groupBy(col("q_id"), col("v")).agg(min(col("dist")).as("dist"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("q_id").orderBy(col("dist"), col("v"))))
        .filter(col("rn") <= SearchBeam)
        .select(col("q_id"), col("v"), col("dist"), col("rn"))
    var frontier = score(entries.select(col("q_id"), col("v")))
    for (_ <- 1 to SearchHops) {
      val cand = frontier.select(col("q_id"), col("v").as("src"))
        .join(esLoop, "src")
        .select(col("q_id"), col("dst").as("v"))
      frontier = score(cand)
    }
    // scratch-enrolled so clearAll reclaims beams whose consumers are
    // not themselves memo entries (persist-serve, recall flats, the
    // streaming probes' per-batch descents)
    Memo.scratchCheckpoint(frontier)
  }

  /** Query-fleet builders — ONE definition per fleet so every memoized
    * beam and its stratified consumers agree on the exact frame.
    */
  private def fleetOf(spark: SparkSession, sfDir: String,
                      pred: org.apache.spark.sql.Column): DataFrame =
    corpus(spark, sfDir).filter(pred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("sq").as("q_sq"))

  private def oddFleet(spark: SparkSession, sfDir: String): DataFrame =
    fleetOf(spark, sfDir, col("vec_id") % 2 === 1)

  private[graft] def q3Fleet(spark: SparkSession, sfDir: String): DataFrame =
    fleetOf(spark, sfDir, col("vec_id") % 4 === 3)

  /** The md5-coin stratum restriction on a beam/entry frame — greedy
    * descent is PER-QUERY independent (every join, window and union in
    * [[greedySearchFrom]] is keyed by q_id), so a stratum's descent
    * equals the full fleet's restricted to the stratum: the memoized
    * full-fleet beams below serve their stratified audit siblings by
    * filter instead of a second descent. Exactness is pinned by
    * Round18Spec.
    */
  private def stratum(df: DataFrame, pct: Int): DataFrame =
    df.filter(TrainingSets.bucket100(col("q_id")) < pct)

  /** The full odd fleet's flat descent beam over the frozen even
    * serving graph, memoized — shared by the flat serving gate
    * ([[graphSearch]]) and its stratified recall audit
    * ([[graphSearchRecall]]).
    */
  private def flatOddBeam(spark: SparkSession, sfDir: String): DataFrame =
    graphCache.synchronized {
      graphCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, Rounds, "flat-odd-beam"),
        greedySearch(oddFleet(spark, sfDir),
          corpus(spark, sfDir).filter(col("vec_id") % 2 === 0),
          servingGraph(spark, sfDir)))
    }

  /** Shape a rank-1 beam row into the gated serving output. */
  private def serveShape(beam: DataFrame): DataFrame =
    beam.filter(col("rn") === 1)
      .select(col("q_id").as("vec_id"), col("v").as("match_id"),
        floor(col("dist") * lit(1e6)).cast("long").as("dist_u"))
      .orderBy("vec_id")

  /** The gated serving query: every odd vector greedy-descends the
    * frozen even-half graph; one (query, match, dist) row each.
    */
  def graphSearch(spark: SparkSession, sfDir: String): DataFrame =
    serveShape(flatOddBeam(spark, sfDir))

  /** Upper-layer sample share (percent, md5 coin) for the hierarchical
    * descent — HNSW's exponentially-decaying layer assignment reduced
    * to its deterministic two-layer core: a vertex belongs to the
    * upper layer iff its md5 bucket < this. Env-knobbed like the other
    * geometry constants; production tunes it ∝ 1/log n so the upper
    * layer stays descent-cheap while covering every region.
    */
  val HierPct: Int = graft.EnvKnobs.posInt("GRAFT_GRAPH_HIER_PCT", 10)

  private[graft] def upperOf(e: DataFrame): DataFrame =
    e.filter(TrainingSets.bucket100(col("vec_id")) < HierPct)

  /** The upper layer's own serving graph (NN-descent + long-range
    * links over the md5-coin sample of the even index) — memoized like
    * every graph-family model.
    */
  private[graft] def upperServingGraph(spark: SparkSession,
                                       sfDir: String): DataFrame =
    graphCache.synchronized {
      graphCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, Rounds, "even-upper"), {
          val l1 = upperOf(corpus(spark, sfDir)
            .filter(col("vec_id") % 2 === 0))
          val init = Memo.scratchCheckpoint(initEdges(l1))
          servingEdgesOf(l1, graphOf(l1, Rounds, Some(init)), Some(init))
        })
    }

  /** HIERARCHICAL graph serving — the HNSW shape that retires "hops
    * must grow ~log n" as a flat-graph cost: queries first descend the
    * SMALL upper layer (≈ [[HierPct]]% of the index — its own
    * NN-descent graph, standard min-id entries), and the upper beam's
    * [[SearchEntries]] best vertices become PER-QUERY entries into the
    * full base-layer descent. Entries start near the query's true
    * neighborhood, so the base descent spends its fixed hop budget
    * refining locally instead of crossing the space — the measured
    * effect is recall at the SAME hop count strictly above the flat
    * descent's (see `graph_search_hier_recall` vs
    * `graph_search_recall`). Upper-layer cost is beam·k rows per hop
    * over a 10% population: asymptotically free, and both layers'
    * structures are the same deterministic builds the oracle replays.
    */
  def graphSearchHier(spark: SparkSession, sfDir: String): DataFrame =
    serveShape(hierOddBeam(spark, sfDir))

  /** The full odd fleet's TWO-STAGE (upper entries → base) descent
    * beam, memoized — shared by the hier gate and its stratified
    * recall audit.
    */
  private def hierOddBeam(spark: SparkSession, sfDir: String): DataFrame =
    graphCache.synchronized {
      graphCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, Rounds, "hier-odd-beam"), {
          val qs = oddFleet(spark, sfDir)
          greedySearchFrom(qs,
            corpus(spark, sfDir).filter(col("vec_id") % 2 === 0),
            servingGraph(spark, sfDir), hierEntriesOdd(spark, sfDir))
        })
    }

  /** The hierarchical ENTRY stage alone: the query fleet descends the
    * upper-layer graph (md5-coin sample of the even base) and each
    * query's [[SearchEntries]] best upper vertices become its
    * base-layer entries. Shared by the hier gate (via the memoized
    * [[hierEntriesOdd]]/[[hierEntriesQ3]] fleet frames) AND the lifecycle
    * serving paths ([[graft.streaming.StreamAssembly]]'s accreted /
    * delete-masked / full-CRUD graph serves, r17): production reads
    * enter near the query's neighborhood instead of the global min-id
    * vertices, so the fixed hop budget refines locally — the knob that
    * at 100× otherwise had to grow ~log n exactly on the live CRUD
    * read path. Upper vertices are base vertices, so the entries are
    * valid in every serving population (accreted ⊇ base; tombstoned
    * entries still ROUTE and are masked at result time, the Lucene
    * posture).
    */
  private[graft] def hierEntries(spark: SparkSession, sfDir: String,
                                 qs: DataFrame): DataFrame =
    hierEntriesFrom(qs,
      upperOf(corpus(spark, sfDir).filter(col("vec_id") % 2 === 0)),
      upperServingGraph(spark, sfDir))

  /** [[hierEntries]] for the full odd query fleet, memoized — the hier
    * gate and its recall audit share ONE upper-layer descent (the
    * audit's stratum entries are the memoized frame filtered, exact by
    * per-query independence).
    */
  private[graft] def hierEntriesOdd(spark: SparkSession,
                                    sfDir: String): DataFrame =
    graphCache.synchronized {
      graphCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, Rounds, "hier-entries-odd"),
        hierEntries(spark, sfDir, oddFleet(spark, sfDir)))
    }

  /** [[hierEntries]] for the full ≡ 3 mod 4 query fleet, memoized —
    * shared by every lifecycle serving read (accreted / delete-masked /
    * full-CRUD in [[graft.streaming.StreamAssembly]]), the fold
    * decision's serve branch and the accreted recall audit: five gated
    * consumers previously each re-ran the 5-hop upper-layer descent.
    */
  private[graft] def hierEntriesQ3(spark: SparkSession,
                                   sfDir: String): DataFrame =
    graphCache.synchronized {
      graphCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, Rounds, "hier-entries-q3"),
        hierEntries(spark, sfDir, q3Fleet(spark, sfDir)))
    }

  /** The entry stage over an ARBITRARY upper layer — the post-fold
    * serve enters through a REFRESHED upper layer built on the live
    * merged population instead of the frozen even base.
    */
  private[graft] def hierEntriesFrom(qs: DataFrame, l1: DataFrame,
                                     upperGraph: DataFrame): DataFrame =
    greedySearch(qs, l1, upperGraph)
      .filter(col("rn") <= SearchEntries)
      .select(col("q_id"), col("v"))

  /** Hierarchical-serving recall on the md5-coin stratum — the same
    * audit as [[graphSearchRecall]], so the two gated numbers compare
    * directly at identical hops/beam: what the smart entries buy. The
    * descent side is the memoized full-fleet beam restricted to the
    * stratum (exact — see [[stratum]]); only the brute-force ground
    * truth runs stratum-fresh.
    */
  def graphSearchHierRecall(spark: SparkSession, sfDir: String,
                            pct: Int = 20): DataFrame = {
    val greedy = stratum(hierOddBeam(spark, sfDir), pct)
      .filter(col("rn") === 1)
      .select(col("q_id"), col("v").as("g_id"))
    top1Compare(greedy, bfOddEven(spark, sfDir, pct))
  }

  /** The exact ground-truth side alone — split out so a two-variant
    * audit ([[graphServeAccretedRecall]]) prices BOTH descents against
    * ONE materialized brute-force pass.
    */
  private def bfTop1(qs: DataFrame, idx: DataFrame): DataFrame =
    qs
      .withColumn("blk",
        explode(sequence(lit(0), lit(Similarity.BlockCrossSalt - 1))))
      .join(idx.select(col("vec_id").as("m_id"), col("embedding").as("m_emb"),
          col("sq").as("m_sq"))
        .withColumn("blk",
          pmod(col("m_id"), lit(Similarity.BlockCrossSalt)).cast("int"))
        .hint("shuffle_hash"), "blk")
      .withColumn("dist",
        col("q_sq") + col("m_sq") -
          lit(2.0) * Similarity.dot(col("q_emb"), col("m_emb")))
      .groupBy("q_id")
      .agg(min(struct(col("dist"), col("m_id"))).as("best"))
      .select(col("q_id"), col("best.m_id").as("bf_id"))

  private def top1Compare(greedy: DataFrame, bf: DataFrame): DataFrame = {
    greedy.join(bf, "q_id")
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("g_id") === col("bf_id"), 1L).otherwise(0L))
          .as("n_top1_match"))
      .withColumn("recall_ppm", expr(
        """CASE WHEN n_queries = 0 THEN NULL
          ELSE CAST(CAST(n_top1_match AS DECIMAL(38,0)) * 1000000
            DIV n_queries AS BIGINT) END"""))
  }

  /** The ACCRETED serving edge set — the read side of the graph-index
    * write path ([[graft.streaming.StreamAssembly.streamGraphInsert]]),
    * the MergeTree contract ("reads see the union of parts",
    * `clickhouse/init/01_init.sql:27-31`) applied to the index tier:
    * the frozen base edges ∪ the segments' forward edges (inserted
    * vector → its descent beam) ∪ the DERIVED back-links (beam member →
    * inserted vector). L2 is symmetric, so each stored
    * (vec_id, nbr, dist_u) row carries BOTH directions of the NSW
    * bidirectional link (Malkov et al.) — no extra segment rows, and
    * the reverse direction is pruned AT READ to the [[K]] best inserted
    * vectors per base vertex by exact integer (dist_u, vec_id) — the
    * deterministic eviction a mutable NSW applies at insert, moved to
    * compose time because base segments are immutable here. Back-links
    * are what make a FRESH vector routable before any rebuild: without
    * them no descent can ever move toward an inserted vertex.
    *
    * `seg` is the drained segment frame (vec_id, rank, nbr, dist_u);
    * compose cost is one bounded window over segment rows (k per
    * insert) — never touches the base graph beyond the final union.
    */
  private[graft] def accretedEdges(base: DataFrame,
                                   seg: DataFrame): DataFrame = {
    val fwd = seg.select(col("vec_id").as("src"), col("nbr").as("dst"))
    val rev = seg
      .withColumn("rr", row_number().over(
        Window.partitionBy("nbr").orderBy(col("dist_u"), col("vec_id"))))
      .filter(col("rr") <= K)
      .select(col("nbr").as("src"), col("vec_id").as("dst"))
    base.select(col("src"), col("dst"))
      .union(fwd).union(rev)
      // src clustering shared by the dedup and the warm fold's first
      // src-keyed top-k window (rides through the checkpoint leaf)
      .repartition(col("src"))
      .distinct()
      .localCheckpoint(true)
  }

  /** The gated warm rebuild: inserts (vec_id ≡ 1 mod 4) NSW-descend
    * the frozen even graph (the batch twin of the drain's segments —
    * the drain itself is gated by `stream_graph_insert` /
    * `stream_graph_serve_accreted`), the accreted edge set seeds
    * [[warmRebuildOf]] over the merged population, and ONE refinement
    * round yields the folded index's edge list.
    */
  def knnGraphWarmRebuild(spark: SparkSession, sfDir: String): DataFrame =
    warmRebuildGate(spark, sfDir, liveOnly = false)

  /** The ACCRETED population a between-folds read serves — the even
    * base ∪ the pending insert fleet (≡ 1 mod 4) — and its edge set
    * (base serving graph + segment attachment edges from the memoized
    * insert twin). ONE definition each, shared by the recall audit,
    * the fold-decision serve-on branch, and the non-live warm fold, so
    * a change to the accreted geometry cannot silently diverge between
    * the three reads that claim to serve the same index state.
    */
  private def accretedPopulation(spark: SparkSession,
                                 sfDir: String): DataFrame =
    corpus(spark, sfDir)
      .filter(col("vec_id") % 2 === 0 || col("vec_id") % 4 === 1)

  private def accretedIndexEdges(spark: SparkSession,
                                 sfDir: String): DataFrame =
    graphCache.synchronized {
      graphCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, Rounds, "acc-idx-edges"),
        accretedEdges(servingGraph(spark, sfDir),
          insertSegTwin(spark, sfDir)))
    }

  /** The insert fleet's (vec_id ≡ 1 mod 4) drained-segment batch twin —
    * descent beams against the frozen even graph, fan-out bounded to
    * [[InsertFanout]], distances floored to micro-units — ONE
    * definition shared by both warm folds and [[graphAttachStats]], so
    * a change to the insert-segment replay (fan-out, encoding) cannot
    * silently diverge between them and the drain they all claim to
    * replay. Memoized in [[graphCache]] like the graphs themselves:
    * three gated consumers (both warm folds and the stats query) share
    * one materialized descent instead of each re-running the
    * 5-hop × beam insert-fleet search (the r16 plan-audit finding —
    * a one-row stats query was paying the full descent).
    */
  private def insertSegTwin(spark: SparkSession, sfDir: String): DataFrame =
    graphCache.synchronized {
      graphCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, Rounds, "insert-seg"), {
          val base = corpus(spark, sfDir).filter(col("vec_id") % 2 === 0)
          val inserted = corpus(spark, sfDir).filter(col("vec_id") % 4 === 1)
          greedySearch(
              inserted.select(col("vec_id").as("q_id"),
                col("embedding").as("q_emb"), col("sq").as("q_sq")),
              base, servingGraph(spark, sfDir))
            .filter(col("rn") <= InsertFanout)
            .select(col("q_id").as("vec_id"), col("v").as("nbr"),
              floor(col("dist") * lit(1e6)).cast("long").as("dist_u"))
        })
    }

  /** The LIVE merged population — (even base ∖ the tombstoned quarter)
    * ∪ the inserted fleet: what the index holds after both pending
    * CRUD letters are folded.
    */
  private[graft] def liveMerged(spark: SparkSession,
                                sfDir: String): DataFrame =
    corpus(spark, sfDir).filter(
      (col("vec_id") % 2 === 0 && col("vec_id") % 8 =!= 6) ||
        col("vec_id") % 4 === 1)

  /** The combined-fold k-NN graph over the live merged population —
    * memoized like every graph-family model: the fold gate
    * ([[knnGraphWarmRebuildLive]]), the post-fold hier serve
    * ([[graphServeFoldedHier]]) and the fold-decision loop all consume
    * THE SAME folded edge frame.
    */
  private[graft] def foldedLiveGraph(spark: SparkSession,
                                     sfDir: String): DataFrame =
    graphCache.synchronized {
      graphCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, Rounds, "warm-live"),
        warmRebuildOf(liveMerged(spark, sfDir),
          accretedIndexEdges(spark, sfDir), 1))
    }

  /** Shared body of the two warm folds: accreted seed from the
    * insert-segment twin, scored over the full or live merged
    * population, one refinement round.
    */
  private def warmRebuildGate(spark: SparkSession, sfDir: String,
                              liveOnly: Boolean): DataFrame = {
    val g =
      if (liveOnly) foldedLiveGraph(spark, sfDir)
      else warmRebuildOf(accretedPopulation(spark, sfDir),
        accretedIndexEdges(spark, sfDir), 1)
    g.select(col("src").as("vec_id"), col("rank").cast("long").as("rank"),
        col("dst").as("nbr"),
        floor(col("dist") * lit(1e6)).cast("long").as("dist_u"))
      .orderBy("vec_id", "rank")
  }

  /** The PRODUCTION rolling fold — one warm NN-descent round absorbing
    * BOTH pending CRUD letters at once: the accreted edge set (base ∪
    * insert segments ∪ derived back-links, [[knnGraphWarmRebuild]]'s
    * seed) is scored over the LIVE merged population (base minus the
    * tombstoned quarter, plus the inserted fleet), so edges touching a
    * deleted vertex vanish in the scoring join — no explicit edge
    * surgery — and one general-neighbor exchange re-stitches the holes
    * the deletions tear AND attaches the inserts, exactly what a
    * MergeTree merge does to a part carrying both new rows and a
    * delete mask. This is the fold an operator schedules off
    * [[graphAttachStats]]: at 100 TB the alternative is a ⌈log_k n⌉
    * full rebuild per maintenance window.
    */
  def knnGraphWarmRebuildLive(spark: SparkSession, sfDir: String): DataFrame =
    warmRebuildGate(spark, sfDir, liveOnly = true)

  /** The folded index's SERVING edge set: the combined-fold k-NN edges
    * IN BOTH DIRECTIONS ∪ fresh md5-random long-range links over the
    * LIVE population. The symmetry is load-bearing, not cosmetic — the
    * r16 back-link lesson applied to the fold: a freshly-stitched
    * insert's k-NN list points INTO its own region (siblings + the
    * nearest base vertex), while no base vertex elects an insert among
    * its k best, so a fold that emitted only out-edges would strand
    * exactly the regions the fold just attached (Round17Spec measures
    * 20/32 planted probes routable out-edges-only vs 32/32 with the
    * NSW bidirectional links Malkov et al. keep). Cost is ≤ 2k+k slim
    * rows per vertex, same order as the cold serving set.
    */
  private[graft] def foldedServeEdges(spark: SparkSession,
                                      sfDir: String): DataFrame =
    graphCache.synchronized {
      graphCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, Rounds, "warm-live-serve"),
        servingEdgesSymOf(liveMerged(spark, sfDir),
          foldedLiveGraph(spark, sfDir)))
    }

  /** [[servingEdgesOf]] with the refined edges kept BIDIRECTIONAL —
    * the fold's serving composition (see [[foldedServeEdges]]).
    */
  private[graft] def servingEdgesSymOf(e: DataFrame,
                                       knn: DataFrame): DataFrame =
    knn.select(col("src"), col("dst"))
      .union(knn.select(col("dst").as("src"), col("src").as("dst")))
      .union(initEdges(e))
      .distinct()
      .localCheckpoint(true)

  /** The REFRESHED upper layer — the r16 staleness item: the hier
    * entry layer was built once on the even base, so inserts never
    * entered it and after enough fold cycles the entries no longer
    * sample the index they route into. The fold's serving product
    * therefore rebuilds the upper layer over the LIVE MERGED
    * population (same md5 coin, so ~[[HierPct]]% of base survivors AND
    * inserts land in it) — entries keep covering what the index now
    * holds, at the same bounded upper-layer cost.
    */
  private[graft] def liveUpperServingGraph(spark: SparkSession,
                                           sfDir: String): DataFrame =
    graphCache.synchronized {
      graphCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, Rounds, "live-upper"), {
          val l1 = upperOf(liveMerged(spark, sfDir))
          val init = Memo.scratchCheckpoint(initEdges(l1))
          servingEdgesOf(l1, graphOf(l1, Rounds, Some(init)), Some(init))
        })
    }

  /** POST-FOLD HIERARCHICAL SERVING — the state of the index AFTER the
    * operator schedules the combined fold ([[knnGraphWarmRebuildLive]])
    * and the read path the r17 composition ships end to end: the query
    * fleet (vec_id ≡ 3 mod 4) enters through the REFRESHED upper layer
    * ([[liveUpperServingGraph]] — built over base survivors ∪ inserts,
    * so a probe whose true NN arrived as an INSERT can be routed to
    * from entries that sample the insert's own region) and descends
    * the folded graph + fresh long-range links over the live
    * population. Tombstoned vectors are GONE — the fold retired the
    * delete letter physically, so serving needs no mask and pays no
    * dead hops; inserted ones are first-class vertices with converged
    * neighborhoods. One (query, match, dist) row each, the same shape
    * as every serving gate, hash-replayed by the oracle end to end
    * (fold + refreshed upper build + both descents).
    */
  def graphServeFoldedHier(spark: SparkSession, sfDir: String): DataFrame =
    serveShape(foldedHierBeam(spark, sfDir))

  /** The post-fold hierarchical descent beam for the FULL ≡ 3 mod 4
    * fleet (refreshed upper entries → folded serve edges over the live
    * population), memoized — the gated folded serve and the
    * fold-decision loop's fold branch share one descent (the branch's
    * canary stratum is the memoized beam filtered, exact by per-query
    * independence).
    */
  private def foldedHierBeam(spark: SparkSession, sfDir: String): DataFrame =
    graphCache.synchronized {
      graphCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, Rounds, "folded-hier-beam"), {
          val live = liveMerged(spark, sfDir)
          val qs = q3Fleet(spark, sfDir)
          val entries = hierEntriesFrom(qs, upperOf(live),
            liveUpperServingGraph(spark, sfDir))
          greedySearchFrom(qs, live, foldedServeEdges(spark, sfDir), entries)
        })
    }

  /** The PHYSICAL delete fold: rebuild the even-half index graph over
    * the LIVE population only (vec_id ≢ 6 mod 8 — the quarter the
    * tombstone drain deleted, [[graft.streaming.StreamAssembly
    * .tombstoneFixture]]), which is what a MergeTree merge does to
    * masked rows (`clickhouse/init/01_init.sql:27-31` + lightweight
    * DELETE: the mask is applied at SELECT until a merge rewrites the
    * part WITHOUT the deleted rows) and what an HNSW rebuild does to
    * tombstoned vertices. After the fold no edge touches a deleted
    * vertex — serving needs no mask and pays no dead routing hops.
    * Same cold NN-descent as [[knnGraphBuild]], 25% smaller
    * population; the gated edge list proves the fold end-to-end
    * against the oracle's replay over the identical live set.
    */
  def knnGraphRebuildDeleted(spark: SparkSession, sfDir: String): DataFrame =
    graphCache.synchronized {
      graphCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, Rounds, "even-live"),
        graphOf(corpus(spark, sfDir)
          .filter(col("vec_id") % 2 === 0 && col("vec_id") % 8 =!= 6),
          Rounds))
    }
      .select(col("src").as("vec_id"), col("rank").cast("long").as("rank"),
        col("dst").as("nbr"),
        floor(col("dist") * lit(1e6)).cast("long").as("dist_u"))
      .orderBy("vec_id", "rank")

  /** Attachment-capacity monitoring for the accreted index — the
    * operational health query behind the read-side back-link bound:
    * each base vertex serves at most [[K]] reverse links, so when many
    * inserts attach to the same neighborhood the overflow is EVICTED
    * (deterministically) and those inserts lose routability until the
    * warm fold. This reports the insert fan-in distribution over
    * attachment vertices and how many links the K-bound evicts — the
    * number an operator watches to schedule [[warmRebuildOf]], exactly
    * as a ClickHouse operator watches part counts to judge merge
    * pressure (`01_init.sql:27-31`). One row of exact integers.
    */
  def graphAttachStats(spark: SparkSession, sfDir: String): DataFrame = {
    val seg = insertSegTwin(spark, sfDir)
      .select(col("vec_id"), col("nbr"))
    val fan = seg.groupBy("nbr").agg(count(lit(1)).as("fan_in"))
    fan.agg(
        count(lit(1)).as("n_attach_vertices"),
        sum(col("fan_in")).as("n_links"),
        max(col("fan_in")).as("max_fan_in"),
        sum(when(col("fan_in") > K, 1L).otherwise(0L))
          .as("n_overflow_vertices"),
        sum(when(col("fan_in") > K, col("fan_in") - K).otherwise(0L))
          .as("n_evicted_links"))
      .crossJoin(broadcast(
        seg.agg(countDistinct(col("vec_id")).as("n_inserts"))))
  }

  /** Evicted-link tolerance for the fold scheduler: the combined fold
    * is DUE once [[graphAttachStats]]' `n_evicted_links` reaches this
    * (every evicted link is an insert that lost routability until the
    * fold — the tolerance is the recall slack an operator accepts
    * between maintenance windows). Env-knobbed like the geometry
    * constants; the oracle interpolates the same value at object init.
    */
  val FoldEvictThreshold: Int =
    graft.EnvKnobs.posInt("GRAFT_GRAPH_FOLD_EVICT", 1)

  /** THE FOLD-SCHEDULING LOOP, EXECUTED — not just described by the
    * operator playbook: one plan reads the attachment stats, decides
    * fold-vs-serve on [[FoldEvictThreshold]], and emits the
    * POST-DECISION serving rows for the md5-coin canary stratum of the
    * query fleet (the replay an operator runs before flipping serving
    * over). Fold due (`fold_due` = 1): rows come from the fold's
    * serving product — folded live graph, bidirectional serve edges,
    * REFRESHED upper layer ([[graphServeFoldedHier]]'s path). Not due
    * (= 0): rows come from the standing full-CRUD read — accreted
    * graph, frozen-even hier entries, tombstones masked late. The
    * decision is data (a one-row broadcast both branches filter on),
    * never a driver-side collect, so the whole loop is one
    * deterministic plan both engines replay — including the decision
    * itself.
    */
  def graphFoldDecision(spark: SparkSession, sfDir: String): DataFrame =
    graphFoldDecisionAt(spark, sfDir, FoldEvictThreshold)

  /** The accreted-twin hierarchical descent beam on the md5-coin
    * canary stratum, memoized — the fold-decision loop's serve branch
    * and the accreted recall audit's hier variant run the IDENTICAL
    * descent (same fleet stratum, same accreted graph, same entries).
    */
  private def accTwinHierBeam(spark: SparkSession, sfDir: String,
                              pct: Int): DataFrame =
    graphCache.synchronized {
      graphCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, Rounds, s"acc-hier-beam-s$pct"),
        greedySearchFrom(stratum(q3Fleet(spark, sfDir), pct),
          accretedPopulation(spark, sfDir),
          accretedIndexEdges(spark, sfDir),
          stratum(hierEntriesQ3(spark, sfDir), pct)))
    }

  /** [[graphFoldDecision]] at an explicit threshold — the spec drives
    * BOTH branches through it (a tolerance below the fixture's evicted
    * count folds; an astronomically high one serves on).
    */
  private[graft] def graphFoldDecisionAt(spark: SparkSession, sfDir: String,
                                         threshold: Long): DataFrame = {
    val decision = graphAttachStats(spark, sfDir)
      .select(when(col("n_evicted_links") >= threshold, 1L)
        .otherwise(0L).as("fold_due"))
    val foldRows = stratum(foldedHierBeam(spark, sfDir), 20)
      .filter(col("rn") === 1)
      .select(col("q_id"), col("v"), col("dist"))
    // the standing read: tombstones still route, masked late (the
    // serveGraphMasked discipline; the ≡ 6 mod 8 fixture is the batch
    // twin of the drained tombstone set)
    val accRows = accTwinHierBeam(spark, sfDir, 20)
      .filter(col("v") % 8 =!= 6)
      .groupBy("q_id")
      .agg(min(struct(col("dist"), col("v"))).as("best"))
      .select(col("q_id"), col("best.v").as("v"), col("best.dist").as("dist"))
    def shape(df: DataFrame): DataFrame =
      df.select(col("q_id").as("vec_id"), col("v").as("match_id"),
        floor(col("dist") * lit(1e6)).cast("long").as("dist_u"))
    shape(foldRows).crossJoin(broadcast(decision))
      .filter(col("fold_due") === 1L)
      .unionByName(shape(accRows).crossJoin(broadcast(decision))
        .filter(col("fold_due") === 0L))
      .orderBy("vec_id")
  }

  /** The odd-stratum exact top-1 over the even index, memoized — the
    * flat, hier and tower serving audits all price against this ONE
    * brute-force pass.
    */
  private def bfOddEven(spark: SparkSession, sfDir: String,
                        pct: Int): DataFrame =
    graphCache.synchronized {
      graphCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, Rounds, s"bf-odd-even-s$pct"),
        bfTop1(stratum(oddFleet(spark, sfDir), pct),
          corpus(spark, sfDir).filter(col("vec_id") % 2 === 0))
          .localCheckpoint(true))
    }

  /** Serving recall: the md5-coin stratum's greedy top-1 vs its exact
    * brute-force top-1 over the even index (the annProbeRecall shape
    * instantiated on the graph family — prices what the bounded-beam
    * descent gives up).
    */
  def graphSearchRecall(spark: SparkSession, sfDir: String,
                        pct: Int = 20): DataFrame = {
    val greedy = stratum(flatOddBeam(spark, sfDir), pct)
      .filter(col("rn") === 1)
      .select(col("q_id"), col("v").as("g_id"))
    top1Compare(greedy, bfOddEven(spark, sfDir, pct))
  }

  /** Recall-at-identical-hops on the ACCRETED index — the number that
    * justifies the r17 hier-entry composition on the path production
    * actually serves: the md5-coin stratum of the query fleet
    * (vec_id ≡ 3 mod 4) descends the accreted graph (base ∪ insert
    * segments ∪ back-links, the batch twin of the drain) TWICE at the
    * SAME hops/beam — once from the flat min-id entries (the pre-r17
    * serving path), once through the hierarchical upper layer — and
    * both top-1 answers are priced against ONE exact brute-force pass
    * over the accreted population. Two rows (variant 'flat' / 'hier');
    * the hier row ≥ flat row is the claim, measured not asserted (the
    * `graph_search_hier_recall` protocol moved onto the lifecycle
    * index).
    */
  def graphServeAccretedRecall(spark: SparkSession, sfDir: String,
                               pct: Int = 20): DataFrame = {
    val acc = accretedIndexEdges(spark, sfDir)
    val aidx = accretedPopulation(spark, sfDir)
    val qs = stratum(q3Fleet(spark, sfDir), pct)
    val bf = bfTop1(qs, aidx).localCheckpoint(true)
    val flat = greedySearch(qs, aidx, acc)
      .filter(col("rn") === 1).select(col("q_id"), col("v").as("g_id"))
    val hier = accTwinHierBeam(spark, sfDir, pct)
      .filter(col("rn") === 1).select(col("q_id"), col("v").as("g_id"))
    top1Compare(flat, bf).withColumn("variant", lit("flat"))
      .unionByName(top1Compare(hier, bf).withColumn("variant", lit("hier")))
      .select("variant", "n_queries", "n_top1_match", "recall_ppm")
      .orderBy("variant")
  }

  /** Recall audit on the deterministic md5-coin stratum (default 20%):
    * the stratum's TRUE k-NN edges by brute force (stratum × corpus —
    * pct·quadratic BY DEFINITION, the recall-audit family; the stratum
    * coin is the production lever) left-joined against the graph's
    * edges. One row: how much of the true neighborhood the descent
    * found.
    */
  def knnGraphRecall(spark: SparkSession, sfDir: String,
                     pct: Int = 20): DataFrame =
    recallOf(spark, sfDir, graph(spark, sfDir), pct)

  /** Recall of an arbitrary edge frame vs the brute-force stratum —
    * shared by the gated audit and the spec's init-vs-refined
    * improvement assertion.
    */
  private[graft] def recallOf(spark: SparkSession, sfDir: String,
                              g: DataFrame, pct: Int): DataFrame =
    recallOfFrames(corpus(spark, sfDir), g, pct)

  private[graft] def recallOfFrames(e: DataFrame, g: DataFrame,
                                    pct: Int): DataFrame = {
    val qs = e.filter(TrainingSets.bucket100(col("vec_id")) < pct)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("sq").as("q_sq"))
    // salt-keyed block join (annProbeRecallStratum's exact-side shape):
    // no broadcast hint on the corpus side, shuffle_hash keeps the
    // low-cardinality join out of sort-merge
    val bf = qs
      .withColumn("blk",
        explode(sequence(lit(0), lit(Similarity.BlockCrossSalt - 1))))
      .join(e.select(col("vec_id").as("m_id"), col("embedding").as("m_emb"),
          col("sq").as("m_sq"))
        .withColumn("blk",
          pmod(col("m_id"), lit(Similarity.BlockCrossSalt)).cast("int"))
        .hint("shuffle_hash"), "blk")
      .filter(col("m_id") =!= col("q_id"))
      .withColumn("dist",
        col("q_sq") + col("m_sq") -
          lit(2.0) * Similarity.dot(col("q_emb"), col("m_emb")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("dist"), col("m_id"))))
      .filter(col("rn") <= K)
    bf.select(col("q_id").as("src"), col("m_id").as("dst"))
      .join(g.select(col("src"), col("dst"), lit(1L).as("hit")),
        Seq("src", "dst"), "left")
      .agg(
        countDistinct(col("src")).as("n_queries"),
        count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("k", lit(K.toLong))
      .withColumn("recall_ppm", expr(
        """CASE WHEN n_true = 0 THEN NULL
          ELSE CAST(CAST(n_hit AS DECIMAL(38,0)) * 1000000
            DIV n_true AS BIGINT) END"""))
      .select("k", "n_queries", "n_true", "n_hit", "recall_ppm")
  }

  // ====================================================================
  // The fold loop, BRANCHED (the production form)
  // ====================================================================

  /** [[graphFoldDecision]]'s PRODUCTION sibling: the decision frame is
    * ONE row bounded at any corpus scale (an aggregate over the segment
    * stats), so a real operator collects it driver-side and executes
    * ONLY the chosen branch — half the work of the gated both-branch
    * form, same rows (Round18Spec proves the equivalence on both
    * thresholds). The gated form stays registered because it is the
    * oracle-replayable one (a driver-side collect has no SQL twin); the
    * one-row `.first()` here is the same bounded-action discipline as
    * the LSH density guard (`Dedup.scala`), documented as such.
    */
  def graphFoldDecisionBranched(spark: SparkSession,
                                sfDir: String): DataFrame =
    graphFoldDecisionBranchedAt(spark, sfDir, FoldEvictThreshold)

  private[graft] def graphFoldDecisionBranchedAt(spark: SparkSession,
                                                 sfDir: String,
                                                 threshold: Long): DataFrame = {
    val foldDue = graphAttachStats(spark, sfDir)
      .select(when(col("n_evicted_links") >= threshold, 1L)
        .otherwise(0L).as("fold_due"))
      .first().getLong(0)
    val rows =
      if (foldDue == 1L)
        stratum(foldedHierBeam(spark, sfDir), 20)
          .filter(col("rn") === 1)
          .select(col("q_id"), col("v"), col("dist"))
      else
        accTwinHierBeam(spark, sfDir, 20)
          .filter(col("v") % 8 =!= 6)
          .groupBy("q_id")
          .agg(min(struct(col("dist"), col("v"))).as("best"))
          .select(col("q_id"), col("best.v").as("v"),
            col("best.dist").as("dist"))
    rows
      .select(col("q_id").as("vec_id"), col("v").as("match_id"),
        floor(col("dist") * lit(1e6)).cast("long").as("dist_u"),
        lit(foldDue).as("fold_due"))
      .orderBy("vec_id")
  }

  // ====================================================================
  // The log-depth entry TOWER (HNSW proper)
  // ====================================================================

  /** Upper levels above the base layer (level 0). Level 1 is the
    * standing [[HierPct]]% layer; each further level keeps [[HierPct]]%
    * of the one below via an independent salted md5 coin, so the level
    * populations NEST (HNSW's geometric layer assignment made
    * deterministic) and level t holds ~(HierPct/100)^t of the index.
    * Env-knobbed: production sets it to ⌈log_{100/HierPct} n⌉ − O(1) so
    * the TOP layer is O(1) rows and entry cost stays flat as the index
    * grows — the knob that retires the 2-layer hier's own scale flag
    * (a single upper level is itself corpus-proportional).
    */
  val TowerLevels: Int = graft.EnvKnobs.posInt("GRAFT_GRAPH_TOWER_LEVELS", 2)

  /** Membership coin for tower level `t ≥ 1` — the conjunction of the
    * level-1 coin (identical to [[upperOf]], so level 1 IS the standing
    * upper layer and shares its memoized graph) and one salted coin per
    * further level (the shared [[TrainingSets.bucket100]] encoding).
    */
  private[graft] def towerCoin(level: Int): org.apache.spark.sql.Column =
    (1 to level).map {
      case 1 => TrainingSets.bucket100(col("vec_id")) < HierPct
      case t => TrainingSets.bucket100(col("vec_id"), s"t$t:") < HierPct
    }.reduce(_ && _)

  private def towerLayerIdx(spark: SparkSession, sfDir: String,
                            t: Int): DataFrame =
    corpus(spark, sfDir)
      .filter(col("vec_id") % 2 === 0 && towerCoin(t))

  /** Level t's own serving graph (NN-descent + long links over the
    * level population) — level 1 reuses [[upperServingGraph]]; deeper
    * levels memoize their own (geometrically smaller) builds.
    */
  private def towerLayerGraph(spark: SparkSession, sfDir: String,
                              t: Int): DataFrame =
    if (t == 1) upperServingGraph(spark, sfDir)
    else graphCache.synchronized {
      graphCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, Rounds, s"even-tower-l$t"), {
          val l = towerLayerIdx(spark, sfDir, t)
          val init = Memo.scratchCheckpoint(initEdges(l))
          servingEdgesOf(l, graphOf(l, Rounds, Some(init)), Some(init))
        })
    }

  /** TOWER DESCENT — HNSW's level-by-level search made deterministic:
    * the query fleet enters the TOP level at its min-id entries,
    * descends that level's graph, and each level's [[SearchEntries]]
    * best vertices become the per-query entries into the level below,
    * down to the base-layer descent. Per-level cost is beam·k rows per
    * hop over a geometrically shrinking population, so TOTAL entry cost
    * is O(top level) + a constant per level — flat in corpus size once
    * [[TowerLevels]] tracks log n, which is exactly the claim the
    * 2-layer hier could not make.
    */
  def graphSearchTower(spark: SparkSession, sfDir: String): DataFrame =
    serveShape(towerOddBeam(spark, sfDir))

  /** The full odd fleet's tower-descent beam, memoized — shared by the
    * tower gate and its recall audit.
    */
  private def towerOddBeam(spark: SparkSession, sfDir: String): DataFrame =
    graphCache.synchronized {
      graphCache.getOrElseUpdate(
        (spark.sparkContext, sfDir, Rounds, "tower-odd-beam"), {
          val qs = oddFleet(spark, sfDir)
          var entries: DataFrame = null
          for (t <- TowerLevels to 1 by -1) {
            val idx = towerLayerIdx(spark, sfDir, t)
            val g = towerLayerGraph(spark, sfDir, t)
            val beam =
              if (t == TowerLevels) greedySearch(qs, idx, g)
              else greedySearchFrom(qs, idx, g, entries)
            entries = beam.filter(col("rn") <= SearchEntries)
              .select(col("q_id"), col("v"))
          }
          greedySearchFrom(qs,
            corpus(spark, sfDir).filter(col("vec_id") % 2 === 0),
            servingGraph(spark, sfDir), entries)
        })
    }

  /** Tower recall at identical base hops/beam, side by side with the
    * 2-layer hier row — the [[graphServeAccretedRecall]] protocol on
    * the entry-structure axis: one exact ground truth, two variant
    * rows, the claim (tower ≥ hier at flat entry cost) measured, not
    * asserted.
    */
  def graphTowerRecall(spark: SparkSession, sfDir: String,
                       pct: Int = 20): DataFrame = {
    val bf = bfOddEven(spark, sfDir, pct)
    def top1(beam: DataFrame): DataFrame =
      stratum(beam, pct).filter(col("rn") === 1)
        .select(col("q_id"), col("v").as("g_id"))
    top1Compare(top1(hierOddBeam(spark, sfDir)), bf)
      .withColumn("variant", lit("hier"))
      .unionByName(top1Compare(top1(towerOddBeam(spark, sfDir)), bf)
        .withColumn("variant", lit("tower")))
      .select("variant", "n_queries", "n_top1_match", "recall_ppm")
      .orderBy("variant")
  }

  /** Per-level tower geometry — the entry-cost sheet an operator reads
    * (descending level t costs beam·k·|edges ∋ frontier| rows per hop;
    * the level populations ARE the cost): one row per level, level 0 =
    * the base layer with its full serving edge set.
    */
  def graphTowerStats(spark: SparkSession, sfDir: String): DataFrame = {
    def levelRow(t: Int, idx: DataFrame, edges: DataFrame): DataFrame =
      idx.agg(count(lit(1)).as("n_vertices"))
        .crossJoin(broadcast(edges.agg(count(lit(1)).as("n_serve_edges"))))
        .select(lit(t.toLong).as("level"), col("n_vertices"),
          col("n_serve_edges"))
    val base = levelRow(0,
      corpus(spark, sfDir).filter(col("vec_id") % 2 === 0),
      servingGraph(spark, sfDir))
    (1 to TowerLevels).map(t =>
        levelRow(t, towerLayerIdx(spark, sfDir, t),
          towerLayerGraph(spark, sfDir, t)))
      .foldLeft(base)(_ unionByName _)
      .orderBy("level")
  }

  // ====================================================================
  // Index-model persistence (build once, WRITE, serve from the artifact)
  // ====================================================================

  /** BUILD → WRITE → LOAD → SERVE, one gated plan — the graph family's
    * durability gate ([[graft.storage.Storage.writeIndex]] scaladoc has
    * the MergeTree contract): the serving edge set and the upper-layer
    * edge set are written as named artifacts, read back through the
    * manifest check, and the md5-coin stratum of the odd fleet runs the
    * standard hierarchical descent ENTIRELY from the loaded frames —
    * the rows are bit-identical to the in-session hier serve (edges are
    * long pairs; parquet round-trips them exactly), which Round18Spec
    * proves with the memo tier killed.
    */
  def graphIndexPersistServe(spark: SparkSession, sfDir: String,
                             pct: Int = 20): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_graph_index").toString
    graft.storage.Storage.writeIndex(
      servingGraph(spark, sfDir), root, "serve_edges")
    graft.storage.Storage.writeIndex(
      upperServingGraph(spark, sfDir), root, "upper_edges")
    serveGraphFromArtifacts(spark, sfDir, root, pct)
  }

  /** The serve-from-loaded-artifacts read, split out so the spec can
    * run it against a root written in an earlier "session" (memo tier
    * cleared) and compare bit-for-bit.
    */
  private[graft] def serveGraphFromArtifacts(spark: SparkSession,
                                             sfDir: String, root: String,
                                             pct: Int): DataFrame = {
    val serve = graft.storage.Storage.loadIndex(spark, root, "serve_edges")
    val upper = graft.storage.Storage.loadIndex(spark, root, "upper_edges")
    val idx = corpus(spark, sfDir).filter(col("vec_id") % 2 === 0)
    val qs = stratum(oddFleet(spark, sfDir), pct)
    val entries = hierEntriesFrom(qs, upperOf(idx), upper)
    serveShape(greedySearchFrom(qs, idx, serve, entries))
  }
}
