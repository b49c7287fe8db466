package graft

import org.apache.spark.sql.functions._

import graft.ops.{CorpusStats, Retrieval, TrainingSets}

/** Round-11 retrieval / information-theory additions: quantized BM25,
  * entropy banding, pairwise KL drift, preference-pair mining —
  * structural invariants plus libm cross-checks of the PortableLn
  * micro-nat quantities the hash gates ride on.
  */
class RetrievalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bm25: returns k rows, scores strictly ordered with doc_id " +
       "tie-break, every hit matches at least one query term") {
    val rows = Retrieval.bm25TopK(spark, sf).collect()
    assert(rows.length === Retrieval.Bm25K)
    rows.sliding(2).foreach { case Array(a, b) =>
      val (sa, sb) = (a.getAs[Long]("score_micro"), b.getAs[Long]("score_micro"))
      assert(sa > sb ||
        (sa == sb && a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_terms_hit") >= 1L)
      assert(r.getAs[Long]("score_micro") > 0L)
    }
    val hitIds = rows.map(_.getAs[Long]("doc_id")).toSet
    val matching = Tables.documents(spark, sf)
      .filter(col("doc_id").isin(hitIds.toSeq: _*))
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(array_intersect(col("ws"),
        array(Retrieval.Bm25QueryTerms.map(lit(_)): _*))) > 0)
      .count()
    assert(matching === hitIds.size.toLong)
  }

  test("bm25: the portable-ln idf agrees with libm within 1 micro-nat " +
       "and the quantized score agrees with a double-BM25 rescore") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val n = docs.select("doc_id").distinct().count()
    val sumDl = docs.count()
    val dl = docs.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dl")).toMap
    val tf = docs.filter(col("w").isin(Retrieval.Bm25QueryTerms: _*))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("w")) ->
        r.getAs[Long]("tf")).toMap
    val df = tf.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
    // reference double-arithmetic BM25 (k1=1.2, b=0.75, Robertson +1 idf)
    val avgdl = sumDl.toDouble / n
    def refScore(doc: Long): Double =
      Retrieval.Bm25QueryTerms.flatMap { w =>
        tf.get((doc, w)).map { t =>
          val idf = math.log((n - df(w) + 0.5) / (df(w) + 0.5) + 1.0)
          idf * t * 2.2 / (t + 1.2 * (0.25 + 0.75 * dl(doc) / avgdl))
        }
      }.sum
    val rows = Retrieval.bm25TopK(spark, sf).collect()
    rows.foreach { r =>
      val got = r.getAs[Long]("score_micro").toDouble / 1e6
      val want = refScore(r.getAs[Long]("doc_id"))
      // quantization: dlr ppm floor + per-term micro floor + 22·DIV —
      // all sub-1e-4 relative at these magnitudes
      assert(math.abs(got - want) < 0.01,
        s"doc ${r.getAs[Long]("doc_id")}: $got vs $want")
    }
    // and the top of the quantized ranking is the top of the double ranking
    val refTop = dl.keys.toSeq.map(d => (refScore(d), d))
      .sortBy { case (s, d) => (-s, d) }.head._2
    assert(rows.head.getAs[Long]("doc_id") === refTop)
  }

  test("rrf fusion: reciprocal contributions recompute exactly from the " +
       "two arm rankings, ranks bounded by k, fusion order correct") {
    val rows = ops.Retrieval.rrfFusion(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= ops.Retrieval.Bm25K)
    // independent arm rankings
    val lex = ops.Retrieval.bm25TopK(spark, sf).collect()
      .sortBy(r => (-r.getAs[Long]("score_micro"), r.getAs[Long]("doc_id")))
      .zipWithIndex.map { case (r, i) => r.getAs[Long]("doc_id") -> (i + 1L) }
      .toMap
    val vec = ops.Similarity
      .bruteForceTopK(spark, sf, ops.Retrieval.RrfQueryId, ops.Retrieval.Bm25K)
      .collect()
      .sortBy(r => (-r.getAs[Double]("cosine"), r.getAs[Long]("vec_id")))
      .zipWithIndex.map { case (r, i) => r.getAs[Long]("vec_id") -> (i + 1L) }
      .toMap
    val c = ops.Retrieval.RrfC
    rows.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val want = lex.get(d).map((r: Long) => 1000000L / (c + r)).getOrElse(0L) +
        vec.get(d).map((r: Long) => 1000000L / (c + r)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_ppm") === want, s"doc $d")
      assert(Option(r.getAs[Any]("rank_lex"))
        .forall(v => lex(d) == v.asInstanceOf[Long]))
      assert(Option(r.getAs[Any]("rank_vec"))
        .forall(v => vec(d) == v.asInstanceOf[Long]))
    }
    // the fused list is the global top of the union by (rrf, doc_id)
    val expect = (lex.keySet ++ vec.keySet).toSeq
      .map(d => (lex.get(d).map((r: Long) => 1000000L / (c + r)).getOrElse(0L) +
        vec.get(d).map((r: Long) => 1000000L / (c + r)).getOrElse(0L), d))
      .sortBy { case (s, d) => (-s, d) }
      .take(rows.length).map(_._2)
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq === expect)
  }

  test("stream bm25 probe: the drained per-batch scores equal the batch " +
       "odd-vs-even replay exactly (batch-boundary independence)") {
    val drained = graft.streaming.StreamAssembly
      .streamBm25Probe(spark, sf, nFiles = 3).collect()
    val docs = Tables.documents(spark, sf)
    val (idf, corpus) = Retrieval.bm25Model(
      docs.filter(col("doc_id") % 2 === 0))
    val direct = Retrieval.bm25ScoreAgainst(
        docs.filter(col("doc_id") % 2 === 1), idf, corpus)
      .orderBy("doc_id").collect()
    assert(drained.length === direct.length)
    drained.zip(direct).foreach { case (a, b) =>
      assert(a.getAs[Long]("doc_id") === b.getAs[Long]("doc_id"))
      assert(a.getAs[Long]("score_micro") === b.getAs[Long]("score_micro"))
      assert(a.getAs[Long]("n_terms_hit") === b.getAs[Long]("n_terms_hit"))
    }
  }

  test("stream kl probe: drained additive partials reproduce the batch " +
       "odd-vs-even drift replay exactly, and more batches change nothing") {
    val drained = graft.streaming.StreamAssembly
      .streamKlProbe(spark, sf, nFiles = 3).collect()
    val docs = Tables.documents(spark, sf)
    val incoming = CorpusStats.tokenBucketCounts(
      docs.filter(col("doc_id") % 2 === 1))
    val hist = spark.range(CorpusStats.KlBuckets).select(col("id").as("b"))
      .join(CorpusStats.tokenBucketCounts(docs.filter(col("doc_id") % 2 === 0))
        .groupBy("b").agg(sum("c").cast("long").as("ch")), Seq("b"),
        "left_outer")
      .na.fill(0L, Seq("ch"))
    val direct = CorpusStats.klAgainstHistory(incoming, hist).collect()
    assert(drained.length === direct.length)
    drained.zip(direct).foreach { case (a, b) =>
      assert(a.getAs[String]("source") === b.getAs[String]("source"))
      assert(a.getAs[Long]("kl_scaled_micro") === b.getAs[Long]("kl_scaled_micro"))
      assert(a.getAs[Long]("n_smoothed") === b.getAs[Long]("n_smoothed"))
    }
    // batch-boundary independence: a different file split folds identically
    val drained1 = graft.streaming.StreamAssembly
      .streamKlProbe(spark, sf, nFiles = 1).collect()
    assert(drained1.map(r => (r.getAs[String]("source"),
        r.getAs[Long]("kl_scaled_micro"))).toSeq ===
      drained.map(r => (r.getAs[String]("source"),
        r.getAs[Long]("kl_scaled_micro"))).toSeq)
  }

  test("stream image probe: the drained band-joined probe equals the " +
       "direct brute-force odd-vs-even Hamming probe") {
    val drained = graft.streaming.StreamAssembly
      .streamImageProbe(spark, sf, nFiles = 3).collect()
    val dh = graft.multimodal.Multimodal.imageDhash(spark, sf)
    val o = dh.filter(col("doc_id") % 6 === 3)
      .select(col("doc_id"), col("dhash"))
    val b = dh.filter(col("doc_id") % 6 === 0)
      .select(col("doc_id").as("idoc"), col("dhash").as("ih"))
    val direct = o.crossJoin(b)
      .filter(expr("bit_count(dhash ^ ih) <= 6"))
      .groupBy("doc_id")
      .agg(countDistinct("idoc").cast("long").as("n_index_matches"),
        min("idoc").cast("long").as("first_match"),
        min(expr("bit_count(dhash ^ ih)")).cast("long").as("min_hamming"))
      .orderBy("doc_id").collect()
    assert(drained.length === direct.length)
    drained.zip(direct).foreach { case (x, y) =>
      Seq("doc_id", "n_index_matches", "first_match", "min_hamming")
        .foreach(f => assert(x.getAs[Long](f) === y.getAs[Long](f), f))
    }
  }

  test("entropy bands: partition the corpus, bounds ordered, and a " +
       "direct libm entropy of every doc lands in its band envelope") {
    val rows = CorpusStats.textEntropyBands(spark, sf)
      .orderBy("band").collect()
    // count docs with ≥1 non-empty TOKEN (a whitespace-only text has
    // length > 0 but no tokens, and lands in no band)
    val nDocs = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select("doc_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Long]("min_ent_micro"), r.getAs[Long]("max_ent_micro"))
      val band = r.getAs[Long]("band")
      assert(lo >= 0 && lo <= hi)
      assert(lo / CorpusStats.EntropyBandMicro === band)
      assert(hi / CorpusStats.EntropyBandMicro === band)
    }
    // libm cross-check of the whole banding: recompute every doc's
    // per-token entropy with Math.log; each must fall inside [band·w,
    // (band+1)·w) up to the ≤(len+1)/len micro-nat floor slack
    val perDoc = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c")).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val w = CorpusStats.EntropyBandMicro
    val bandsOf = rows.map(_.getAs[Long]("band")).toSet
    perDoc.foreach { case (_, rs) =>
      val cs = rs.map(_.getAs[Long]("c").toDouble)
      val len = cs.sum
      val h = cs.map(c => c * (math.log(len) - math.log(c))).sum / len * 1e6
      val cand = (h / w).toLong
      assert(bandsOf.contains(cand) || bandsOf.contains(cand - 1) ||
        bandsOf.contains(cand + 1))
    }
  }

  test("jl distortion: histogram covers every adjacent pair once, and a " +
       "manually projected pair reproduces the kernel's cosines") {
    val rows = ops.Similarity.embeddingJlDistortion(spark, sf).collect()
    val ids = Tables.embeddings(spark, sf).select("vec_id").collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val expectPairs = ids.count(v => ids.contains(v + 1))
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === expectPairs.toLong)
    // manual replay of pair (0, 1) with the public sign-matrix scheme
    val emb = Tables.embeddings(spark, sf)
      .filter(col("vec_id").isin(0L, 1L))
      .orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val m = ops.Similarity.JlDims
    def sign(p: Int, d: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$p,$d".getBytes("UTF-8"))
      if ((md(0) & 1) == 0) 1.0 else -1.0
    }
    def proj(v: Array[Double]): Array[Double] =
      Array.tabulate(m)(p => v.indices.foldLeft(0.0)((a, d) =>
        a + sign(p, d) * v(d)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val band01 = math.floor(
      (cos(proj(emb(0)), proj(emb(1))) - cos(emb(0), emb(1))) * 20.0).toLong
    val hit = rows.find(r => r.getAs[Long]("first_pair") <= 0L &&
      r.getAs[Long]("last_pair") >= 0L && r.getAs[Long]("band") == band01)
    assert(hit.isDefined, s"pair (0,1) band $band01 not found")
  }

  test("shard mix entropy: shards partition the corpus and every mix " +
       "rate sits inside [0, ln(n_sources)]") {
    val rows = TrainingSets.shardMixEntropy(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    rows.foreach { r =>
      val perDoc = r.getAs[Long]("per_doc_mix_micro")
      assert(perDoc >= 0L)
      val cap = (math.log(r.getAs[Long]("n_sources").toDouble) * 1e6).toLong
      assert(perDoc <= cap + 2L,
        s"shard ${r.getAs[Long]("shard")}: $perDoc > $cap")
    }
  }

  test("kl drift: S·(S−1) ordered pairs, self-pairs absent, and the " +
       "quantized divergence respects the exact Gibbs lower bound") {
    val rows = CorpusStats.klSourceDrift(spark, sf).collect()
    val s = Tables.documents(spark, sf).select("source").distinct().count()
    assert(rows.length === (s * (s - 1)).toInt)
    rows.foreach { r =>
      assert(r.getAs[String]("source_a") !== r.getAs[String]("source_b"))
      // true KL ≥ 0 and each bucket floor loses < 1 micro-nat weighted
      // by (c+1): quantized sum ≥ −Σ(c+1) = −n_smoothed_a exactly
      assert(r.getAs[Long]("kl_scaled_micro") >= -r.getAs[Long]("n_smoothed_a"))
    }
    // drift is asymmetric in general but both directions exist
    val pairs = rows.map(r =>
      (r.getAs[String]("source_a"), r.getAs[String]("source_b"))).toSet
    pairs.foreach { case (a, b) => assert(pairs.contains((b, a))) }
  }

  test("capped lsh: emitted pairs are exactly the uncapped fine-banding " +
       "set when no bucket binds, and every pair passes the cosine gate") {
    val capped = ops.Dedup.embeddingNearDupsLshCapped(spark, sf).collect()
    val unbounded = ops.Dedup
      .embeddingNearDupsLshCapped(spark, sf, cap = Int.MaxValue).collect()
    def keys(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    // at sf0.001 no 7×8-bit bucket exceeds the cap, so the two agree
    assert(keys(capped) === keys(unbounded))
    capped.foreach(r => assert(r.getAs[Double]("cosine") >= 0.4))
    // and a tiny cap must only SHRINK the pair set (bounded-work contract)
    val tiny = ops.Dedup
      .embeddingNearDupsLshCapped(spark, sf, cap = 2).collect()
    assert(keys(tiny).subsetOf(keys(capped)))
  }

  test("capped lsh recall audit: precision is 1 by construction and the " +
       "confusion counts are self-consistent") {
    val r = ops.Dedup.lshCappedRecallEval(spark, sf).collect().head
    val (ne, nc, tp, fn, ppm) = (r.getAs[Long]("n_exact"),
      r.getAs[Long]("n_cand"), r.getAs[Long]("tp"),
      r.getAs[Long]("fn"), r.getAs[Long]("recall_ppm"))
    assert(nc === tp) // cosine-verified candidates are all true pairs
    assert(ne === tp + fn)
    assert(ppm === tp * 1000000L / ne)
    assert(ppm >= 0L && ppm <= 1000000L)
  }

  test("bpe compression by source: per-source masses conserve the global " +
       "tokenize-stats totals exactly") {
    val bySource = CorpusStats.bpeCompressionBySource(spark, sf).collect()
    val global = CorpusStats.bpeTokenizeStats(spark, sf).collect()
    assert(bySource.map(_.getAs[Long]("token_mass")).sum ===
      global.map(_.getAs[Long]("token_mass")).sum)
    assert(bySource.map(_.getAs[Long]("char_mass")).sum ===
      global.map(_.getAs[Long]("char_mass")).sum)
    assert(bySource.map(_.getAs[Long]("n_word_occurrences")).sum ===
      global.map(_.getAs[Long]("n_occurrences")).sum)
    bySource.foreach { r =>
      // a token never spans words, so rate ∈ [1, max word length] chars
      val ppm = r.getAs[Long]("chars_per_token_ppm")
      assert(ppm >= 1000000L && ppm <= 20000000L)
    }
  }

  test("preference pairs: per-source extremes with nonnegative margins, " +
       "rank-1 chosen is the true per-source diversity argmax") {
    val rows = TrainingSets.preferencePairs(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("pair_rank") >= 1L &&
        r.getAs[Long]("pair_rank") <= TrainingSets.PrefPairsPerSource.toLong)
      assert(r.getAs[Long]("margin_micro") >= 0L)
      assert(r.getAs[Long]("chosen_doc") !== r.getAs[Long]("rejected_doc"))
    }
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.values.forall(_.length <= TrainingSets.PrefPairsPerSource))
    // independent argmax check for one source
    val scored = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        // drop empty tokens like the operator (length(w) > 0), or a
        // doc with doubled/leading spaces would score differently here
        array_remove(split(col("text"), " "), "").as("ws"))
      .select(col("doc_id"), col("source"),
        size(col("ws")).cast("long").as("nt"),
        size(array_distinct(col("ws"))).cast("long").as("nd"))
      .withColumn("score", expr("(nd * 1000000) DIV nt"))
      .collect()
    val src = rows.head.getAs[String]("source")
    val best = scored.filter(_.getAs[String]("source") == src)
      .map(r => (r.getAs[Long]("score"), r.getAs[Long]("doc_id")))
      .sortBy { case (sc, id) => (-sc, id) }.head._2
    val got = rows.filter(r => r.getAs[String]("source") == src &&
      r.getAs[Long]("pair_rank") == 1L).head.getAs[Long]("chosen_doc")
    assert(got === best)
  }
}
