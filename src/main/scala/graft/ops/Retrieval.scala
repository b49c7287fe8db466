package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PortableLn

/** Lexical retrieval over the document corpus: quantized Okapi BM25
  * (Robertson & Walker 1994; the +1 idf form of Lucene — public
  * method), the ranking function a training-data pipeline uses to mine
  * topical slices and to power the lexical arm of hybrid search.
  *
  * Reference tie-in: the reference's dead `query-ch` CLI entry point
  * (`pyproject.toml:33`) promises an ad-hoc query surface it never
  * shipped; ranked retrieval over the corpus is that surface's natural
  * LLM-era extension, and it composes with the existing vector arm
  * ([[Similarity]]) the way `hybrid_search` already demonstrates.
  *
  * Determinism discipline (the [[TrainingSets.dsirImportance]] gate,
  * applied to BM25): the only transcendental is one ln per QUERY TERM
  * — computed by [[graft.functions.PortableLn]] (bit-identical across
  * engines) and floored to BIGINT micro-nats at the source. The tf
  * saturation is re-derived as exact integer arithmetic: with
  * k1 = 6/5, b = 3/4,
  *
  *   S(tf, dl) = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *             = 22·tf / (10·tf + 3 + 9·dl/avgdl)
  *
  * and dl/avgdl is quantized once to ppm as an integer floor-division
  * (`dl·N·1e6 DIV Σdl`), so the per-term score
  *
  *   score = 22 · ((idf_micro · tf · 1e6) DIV (10·tf·1e6 + 3e6 + 9·dlr))
  *
  * is pure BIGINT arithmetic — order-independent and identical in
  * Spark and DuckDB (idf_micro ≤ ~3e7 even at 1e12 docs, so
  * idf_micro·tf·1e6 fits int64 for any dl < 1e5; the dl·N·1e6
  * quantizer bounds N·dl < 9.2e12 — a larger corpus drops the ppm
  * scale one decade, a one-constant change). The top-k
  * boundary compares exact integers with a doc_id tie-break, so the
  * LIMIT is deterministic in both engines.
  *
  * Scale shape: the corpus is scanned once; the only shuffle of
  * corpus-sized data is the (doc_id) length aggregate and the
  * (doc_id, term) tf aggregate — and the tf frame is pre-filtered by a
  * BROADCAST semi-join against the |Q|-term query, so only matching
  * postings shuffle (the inverted-index discipline: candidates ∝
  * postings of the query terms, never the corpus). idf and corpus
  * stats are |Q|-row / 1-row broadcasts; the final rank is a top-k
  * (TakeOrderedAndProject), never a global sort.
  */
object Retrieval {

  /** The fixed probe query — hoisted so operator and oracle SQL
    * interpolate the SAME terms (the Similarity.KmeansK anti-drift
    * discipline). */
  val Bm25QueryTerms: Seq[String] = Seq("table", "query", "merge", "vector")

  /** Result depth for [[bm25TopK]]. */
  val Bm25K: Int = 10

  private def tokensOf(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), col("source"),
      explode(split(col("text"), " ")).as("w"))
    .filter(length(col("w")) > 0)

  /** Frozen retrieval model from a model corpus: per-query-term
    * micro-nat idf (Robertson +1 form: ln((N−df+0.5)/(df+0.5)+1) =
    * ln((2N+2)/(2df+1)) — strictly positive, exact-integer quotient
    * into the portable ln, floored to micro-nats) and the 1-row corpus
    * stats (N, Σdl) the length normalizer reads. Both frames are
    * |Q|-row / 1-row — broadcast-sized at any corpus scale. A query
    * term absent from the model corpus has no idf row and contributes
    * nothing downstream (unseen-in-index semantics).
    */
  private[graft] def bm25Model(modelDocs: DataFrame): (DataFrame, DataFrame) = {
    import modelDocs.sparkSession.implicits._
    val toks = tokensOf(modelDocs)
    val corpus = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("dl").cast("long").as("sum_dl"))
    val dfreq = toks.join(broadcast(Bm25QueryTerms.toDF("w")), Seq("w"))
      .groupBy("w").agg(countDistinct("doc_id").cast("long").as("df"))
    val idfX = dfreq.crossJoin(broadcast(corpus))
      .select(col("w"),
        ((col("n_docs") * 2L + 2L).cast("double") /
          (col("df") * 2L + 1L).cast("double")).as("x"))
    val idf = PortableLn.withLn(idfX, "x", "lnx")
      .select(col("w"), floor(col("lnx") * lit(1e6)).cast("long")
        .as("idf_micro"))
    (idf, corpus)
  }

  /** Scores `scoredDocs` against a frozen model (idf + corpus stats
    * from [[bm25Model]]): one row per document matching ≥1 query term,
    * with the quantized integer score from the scaladoc formula. The
    * broadcast semi-join against the |Q|-term query keeps the shuffled
    * tf frame ∝ matching postings, not the corpus. */
  private[graft] def bm25ScoreAgainst(scoredDocs: DataFrame,
      idf: DataFrame, corpus: DataFrame): DataFrame = {
    import scoredDocs.sparkSession.implicits._
    val toks = tokensOf(scoredDocs)
    val dl = toks.groupBy("doc_id").agg(
      first("source").as("source"), count(lit(1)).cast("long").as("dl"))
    val tf = toks.join(broadcast(Bm25QueryTerms.toDF("w")), Seq("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).cast("long").as("tf"))
    tf.join(broadcast(idf), Seq("w"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .withColumn("dlr", expr("(dl * n_docs * 1000000) DIV sum_dl"))
      .withColumn("term_score", lit(22L) *
        expr("(idf_micro * tf * 1000000) DIV " +
          "(10 * tf * 1000000 + 3000000 + 9 * dlr)"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).cast("long").as("n_terms_hit"),
        sum("term_score").cast("long").as("score_micro"))
  }

  /** Top-[[Bm25K]] documents for [[Bm25QueryTerms]] under quantized
    * BM25 (k1 = 1.2, b = 0.75): the corpus scored against its own
    * model. Columns: doc_id, source, n_terms_hit, score_micro. */
  def bm25TopK(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val (idf, corpus) = bm25Model(docs)
    bm25ScoreAgainst(docs, idf, corpus)
      .orderBy(desc("score_micro"), asc("doc_id")).limit(Bm25K)
  }

  /** RRF dampening constant (Cormack, Clarke & Buettcher 2009 — the
    * standard k = 60). */
  val RrfC: Int = 60

  /** Query id for [[rrfFusion]]'s vector arm — the same probe vector
    * [[Similarity.hybridSearch]] uses, so the two hybrid shapes are
    * comparable. */
  val RrfQueryId: Long = 7L

  /** Reciprocal-rank fusion of the lexical and vector retrieval arms
    * (Cormack et al. 2009 — public method; the fusion step every hybrid
    * search stack runs between BM25 and ANN). Each arm contributes
    * `1e6 DIV (C + rank)` ppm for its top-[[Bm25K]] ranking; documents
    * appearing in only one arm score with the other contribution 0.
    *
    * Exactness: ranks are row_numbers over total orders — the BM25 arm
    * orders exact integers, the vector arm orders cosines that are
    * bit-identical across engines (left-to-right double folds, the
    * [[Similarity]] discipline) — and each reciprocal is one integer
    * floor-division, so the fused score is BIGINT everywhere and the
    * final top-k boundary is deterministic (doc_id tie-break).
    *
    * Scale shape: both arms end in TakeOrderedAndProject top-k frames
    * (k rows each); ranking and fusion run on those k-row frames only —
    * the unpartitioned row_number windows consume k rows by
    * construction, never a corpus-scale input.
    */
  def rrfFusion(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = Bm25K
    // k-row arm frames: the windows below are bounded by construction
    val lexR = bm25TopK(spark, sfDir)
      .select(col("doc_id"), col("score_micro"))
      .withColumn("rank_lex", row_number()
        .over(Window.orderBy(desc("score_micro"), asc("doc_id")))
        .cast("long"))
      .select("doc_id", "rank_lex")
    val vecR = Similarity.bruteForceTopK(spark, sfDir, RrfQueryId, k)
      .select(col("vec_id").as("doc_id"), col("cosine"))
      .withColumn("rank_vec", row_number()
        .over(Window.orderBy(desc("cosine"), asc("doc_id")))
        .cast("long"))
      .select("doc_id", "rank_vec")
    lexR.join(vecR, Seq("doc_id"), "full_outer")
      .withColumn("rrf_ppm",
        coalesce(expr(s"1000000 DIV ($RrfC + rank_lex)"), lit(0L)) +
          coalesce(expr(s"1000000 DIV ($RrfC + rank_vec)"), lit(0L)))
      .orderBy(desc("rrf_ppm"), asc("doc_id"))
      .limit(k)
  }

  /** Picks and pool size shared with the oracle (anti-drift). */
  val MmrK: Int = 5
  val MmrPool: Int = 50
  val MmrQueryId: Long = 1L

  /** Maximal Marginal Relevance diversified top-k (Carbonell &
    * Goldstein 1998 — public method): after ranking a candidate pool
    * by relevance to the query vector, greedily select k documents
    * maximizing λ·rel(d) − (1−λ)·max_{s∈S} sim(d,s) with λ = 1/2 —
    * the standard redundancy-pruning rerank of a retrieval pipeline
    * (RAG context assembly, dedup-at-serve-time).
    *
    * Scale shape: the corpus appears ONLY in the pool stage (one
    * TakeOrderedAndProject over exact cosines — at index scale, an
    * ANN probe); everything after runs on the ≤ [[MmrPool]]-row pool —
    * its pairwise sim frame ([[MmrPool]]² rows) and [[MmrK]] greedy
    * rounds are driver-tiny checkpointed frames, never corpus-sized.
    * Portability: rel/sim are the shared left-to-right cosine folds;
    * the MMR score is λ·rel − (1−λ)·maxsim on bit-identical doubles
    * (two IEEE multiplies and a subtract), argmax tiebroken by doc id.
    */
  def mmrDiversifiedTopk(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import Similarity.{dot, norm2}
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        norm2(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") === MmrQueryId)
      .select(col("embedding").as("qemb"), col("nrm").as("qnrm"))
    val pool = e.filter(col("vec_id") =!= MmrQueryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("m_id"), col("embedding"), col("nrm"),
        (dot(col("embedding"), col("qemb")) /
          (col("nrm") * col("qnrm"))).as("rel"))
      .orderBy(desc("rel"), asc("m_id")).limit(MmrPool)
      .localCheckpoint(true)
    val sims = pool.select(col("m_id").as("a_id"),
        col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
      .crossJoin(broadcast(pool.select(col("m_id").as("b_id"),
        col("embedding").as("b_emb"), col("nrm").as("b_nrm"))))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        (dot(col("a_emb"), col("b_emb")) /
          (col("a_nrm") * col("b_nrm"))).as("sim"))
      .localCheckpoint(true)
    val rels = pool.select(col("m_id"), col("rel"))
    var selected = rels
      .orderBy(desc("rel"), asc("m_id")).limit(1)
      .select(lit(1L).as("rank"), col("m_id"), col("rel"),
        col("rel").as("score"))
      .localCheckpoint(true)
    for (r <- 2 to MmrK) {
      val pick = rels
        .join(selected.select(col("m_id")), Seq("m_id"), "left_anti")
        .join(sims.join(selected.select(col("m_id").as("b_id")), "b_id")
          .groupBy("a_id").agg(max("sim").as("maxsim"))
          .withColumnRenamed("a_id", "m_id"), "m_id")
        .select(lit(r.toLong).as("rank"), col("m_id"), col("rel"),
          (lit(0.5) * col("rel") - lit(0.5) * col("maxsim")).as("score"))
        .orderBy(desc("score"), asc("m_id")).limit(1)
      selected = selected.unionByName(pick).localCheckpoint(true)
    }
    selected.orderBy("rank")
  }

  // ------------------------------------------------------------------
  // Ranking-quality metrics: nDCG@k + MRR over a fixed eval fleet
  // ------------------------------------------------------------------

  /** Fixed evaluation query fleet for the ranking-quality audit —
    * hoisted so operator and oracle interpolate the SAME queries (the
    * [[Bm25QueryTerms]] discipline). Terms span the vocabulary's
    * frequency range (`dup` is the one rare term, df ≈ 5% — the query
    * whose metrics actually discriminate).
    */
  val NdcgQueries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("join", "hash", "row"),
    2L -> Seq("vector", "merge", "table", "query"),
    3L -> Seq("dup", "scan"),
    4L -> Seq("stream", "window", "batch"),
    5L -> Seq("sort", "fast", "slow", "key"),
    6L -> Seq("spark", "agg"))

  /** Evaluation depth (nDCG@10 / MRR@10). */
  val NdcgK: Int = 10

  /** Rank discounts 1/log₂(rank+1) in ppm, PRECOMPUTED once here and
    * interpolated verbatim into the oracle SQL — the gate never
    * evaluates a transcendental at query time in either engine (the
    * PortableLn rule, solved by constant folding: rank is a small
    * bounded integer, so the whole discount table is ten literals).
    */
  val NdcgWeightsPpm: Seq[Long] = (1 to NdcgK).map(i =>
    math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0))).toLong)

  /** Ranking-quality audit of the BM25 ranker (Järvelin & Kekäläinen
    * 2002 nDCG; MRR — public metrics): each fleet query ranks the
    * corpus under the SAME quantized BM25 as [[bm25TopK]], graded
    * pseudo-qrels label each candidate with gain = #distinct query
    * terms it contains (deterministic — no human judgments, the
    * standard weak-supervision stand-in), and the audit reports per
    * query: DCG@k, ideal DCG@k, nDCG (ppm), the first fully-matching
    * rank, and its reciprocal (ppm). Integer-exact end to end: gains
    * are term-hit counts, discounts are the [[NdcgWeightsPpm]]
    * literals, nDCG/RR are nonneg integer floor divisions.
    *
    * Scale shape: the corpus shuffles only as query-term postings
    * (broadcast semi-join against the fleet's term list); ranking and
    * ideal-ranking windows partition by query over postings-bounded
    * candidate sets; everything after is |fleet|-row frames.
    */
  def retrievalNdcg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val qterms = NdcgQueries
      .flatMap { case (q, ws) => ws.map(w => (q, w)) }.toDF("qid", "w")
    val qlen = NdcgQueries
      .map { case (q, ws) => (q, ws.size.toLong) }.toDF("qid", "qlen")
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).cast("long").as("dl"))
    val corpus = dl.agg(count(lit(1)).cast("long").as("n_docs"),
      sum("dl").cast("long").as("sum_dl"))
    val dfreq = toks
      .join(broadcast(qterms.select("w").distinct()), Seq("w"))
      .groupBy("w").agg(countDistinct("doc_id").cast("long").as("df"))
    val idf = PortableLn.withLn(
        dfreq.crossJoin(broadcast(corpus))
          .select(col("w"), ((col("n_docs") * 2L + 2L).cast("double") /
            (col("df") * 2L + 1L).cast("double")).as("x")),
        "x", "lnx")
      .select(col("w"),
        floor(col("lnx") * lit(1e6)).cast("long").as("idf_micro"))
    val tf = toks.join(broadcast(qterms), Seq("w"))
      .groupBy("qid", "doc_id", "w").agg(count(lit(1)).cast("long").as("tf"))
    val scored = tf.join(broadcast(idf), Seq("w"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .withColumn("dlr", expr("(dl * n_docs * 1000000) DIV sum_dl"))
      .withColumn("term_score", lit(22L) *
        expr("(idf_micro * tf * 1000000) DIV " +
          "(10 * tf * 1000000 + 3000000 + 9 * dlr)"))
      .groupBy("qid", "doc_id")
      .agg(count(lit(1)).cast("long").as("gain"),
        sum("term_score").cast("long").as("score_micro"))
      // three consumers (rank, ideal rank, candidate count) would each
      // re-plan the postings/model subtree — checkpoint the slim
      // (qid, doc, gain, score) candidate frame once
      .localCheckpoint(true)
    val wts = NdcgWeightsPpm.zipWithIndex
      .map { case (w, i) => ((i + 1).toLong, w) }.toDF("rnk", "wppm")
    import org.apache.spark.sql.expressions.Window
    val ranked = scored
      .withColumn("rnk", row_number().over(Window.partitionBy("qid")
        .orderBy(desc("score_micro"), asc("doc_id"))).cast("long"))
      .filter(col("rnk") <= NdcgK)
      .localCheckpoint(true)
    val dcg = ranked.join(broadcast(wts), Seq("rnk"))
      .groupBy("qid")
      .agg(sum(col("gain") * col("wppm")).cast("long").as("dcg_ppm"))
    val ideal = scored
      .withColumn("irnk", row_number().over(Window.partitionBy("qid")
        .orderBy(desc("gain"), asc("doc_id"))).cast("long"))
      .filter(col("irnk") <= NdcgK)
      .join(broadcast(wts.select(col("rnk").as("irnk"), col("wppm"))),
        Seq("irnk"))
      .groupBy("qid")
      .agg(sum(col("gain") * col("wppm")).cast("long").as("idcg_ppm"))
    val nCand = scored.groupBy("qid")
      .agg(count(lit(1)).cast("long").as("n_cand"))
    val firstFull = ranked.join(broadcast(qlen), Seq("qid"))
      .filter(col("gain") === col("qlen"))
      .groupBy("qid").agg(min("rnk").as("first_full_rank"))
    qlen
      .join(nCand, Seq("qid"), "left")
      .join(dcg, Seq("qid"), "left")
      .join(ideal, Seq("qid"), "left")
      .join(firstFull, Seq("qid"), "left")
      .select(col("qid"), col("qlen"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("dcg_ppm"), lit(0L)).as("dcg_ppm"),
        coalesce(col("idcg_ppm"), lit(0L)).as("idcg_ppm"),
        expr("""CASE WHEN coalesce(idcg_ppm, 0) = 0 THEN NULL
          ELSE CAST(CAST(dcg_ppm AS DECIMAL(38,0)) * 1000000
            DIV idcg_ppm AS BIGINT) END""").as("ndcg_ppm"),
        col("first_full_rank"),
        expr("""CASE WHEN first_full_rank IS NULL THEN 0
          ELSE 1000000 DIV first_full_rank END""").cast("long").as("rr_ppm"))
      .orderBy("qid")
  }
}
