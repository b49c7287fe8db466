package graft

import org.apache.spark.sql.functions._

/** Round-14 additions: the IVFADC+R re-rank stage's exactness
  * contract, the write-path/build-path coding agreement behind the
  * streaming index-append drain, and the rerank-dominance invariant
  * the two recall audits must satisfy together.
  */
class Round14Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("online coding reproduces the batch build bit-for-bit: every " +
       "index vector recoded against the frozen model gets its own " +
       "(cell, codeword) rows back") {
    import graft.ops.Similarity
    graft.ops.Memo.clearAll()
    val (cents, cb, codes) = Similarity.ivfpqProbeModel(spark, sf)
    val even = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"), col("embedding"))
    val recoded = Similarity.ivfpqCode(even, cents, cb)
    // symmetric difference must be empty — the write path (streaming
    // append) and the build path (batch train+assign) agree exactly
    val modelRows = codes.select("vec_id", "cell", "s", "cid")
    val diff = recoded.exceptAll(modelRows)
      .unionAll(modelRows.exceptAll(recoded))
    assert(diff.isEmpty, "online ivfpqCode diverged from the model's codes")
    graft.ops.Memo.clearAll()
  }

  test("the re-rank stage is EXACT over its candidates: with R covering " +
       "every probed-cell member, rerank top-k equals brute-force L2 " +
       "top-k restricted to the probed cells") {
    import graft.ops.Similarity
    graft.ops.Memo.clearAll()
    val n = graft.Tables.embeddings(spark, sf).count().toInt
    // R >= corpus: the ADC top-R cut keeps ALL probed-cell candidates,
    // so the re-rank must return the exact-L2 answer over that set
    val rr = Similarity.ivfpqRerankTopK(spark, sf, queryId = 0L, k = 5,
        r = n)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val (cents, cb, codes) = Similarity.ivfpqModel(spark, sf)
    val q = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 0L)
      .select(col("embedding").as("qe"))
    val probed = Similarity.cellResidualTables(
        graft.Tables.embeddings(spark, sf).filter(col("vec_id") === 0L)
          .select(col("vec_id").as("q_id"), col("embedding")), cents, cb)
      .select("cell").distinct().collect().map(_.getLong(0)).toSet
    val exact = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") =!= 0L)
      .join(codes.filter(col("s") === 0)
        .filter(col("cell").isin(probed.toSeq: _*)).select("vec_id"),
        "vec_id")
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (graft.ops.Similarity.dot(col("qe"), col("qe")) -
          lit(2.0) * graft.ops.Similarity.dot(col("qe"), col("embedding")) +
          graft.ops.Similarity.dot(col("embedding"), col("embedding")))
          .as("d"))
      .orderBy(asc("d"), asc("vec_id")).limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rr.toSeq == exact.toSeq,
      s"rerank ${rr.toSeq} != exact-over-probed ${exact.toSeq}")
    graft.ops.Memo.clearAll()
  }

  test("the NB classifier LEARNS when the corpus is separable: " +
       "disjoint per-language vocabularies classify near-perfectly " +
       "(the testdata corpus is lang-independent by construction, so " +
       "its gated matrix measures arithmetic, not separability)") {
    import spark.implicits._
    val langs = Seq("aa", "bb", "cc", "dd", "ee")
    val docs = (0 until 300).map { i =>
      val lang = langs(i % langs.size)
      // 20 tokens from the language's OWN 7-word vocabulary
      val text = (0 until 20)
        .map(k => s"${lang}_w${(i + k) % 7}").mkString(" ")
      (i.toLong, lang, text)
    }.toDF("doc_id", "lang", "text")
    val dest = s"target/spec-scale/nb-sep-${System.nanoTime()}"
    docs.write.parquet(s"$dest/documents.parquet")
    val m = graft.ops.TrainingSets.nbLangidClassifier(spark, dest)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val total = m.values.sum
    val correct = m.collect { case ((t, p), n) if t == p => n }.sum
    assert(total > 0)
    assert(correct.toDouble / total > 0.9,
      s"separable-fixture accuracy ${correct}/$total — the trained " +
        "model failed to separate disjoint vocabularies")
  }

  test("the quality filter separates when a signal exists: with " +
       "disjoint hq/lq source vocabularies every hq-source tertile " +
       "sum is positive and every lq-source one negative (margin " +
       "sign = learned class; the gated corpus itself is " +
       "source-independent, so its matrix measures arithmetic)") {
    import spark.implicits._
    // derive each source's hq/lq parity from the engine's OWN coin so
    // the fixture cannot drift from TrainingSets.qualityClass
    val srcs = (0 until 6).map(i => s"src$i")
    val parity = srcs.toDF("source")
      .withColumn("hq", graft.ops.TrainingSets.qualityClass === "hq")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(parity.values.exists(identity) && parity.values.exists(!_),
      "fixture needs both classes among the sources")
    val docs = (0 until 300).map { i =>
      val src = srcs(i % srcs.size)
      val v = if (parity(src)) "hqw" else "lqw"
      val text = (0 until 20).map(k => s"$v${(i + k) % 7}").mkString(" ")
      (i.toLong, "xx", text, src)
    }.toDF("doc_id", "lang", "text", "source")
    val dest = s"target/spec-scale/nb-qual-${System.nanoTime()}"
    docs.write.parquet(s"$dest/documents.parquet")
    val rows = graft.ops.TrainingSets.nbQualityTertiles(spark, dest)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, tertile, sumMargin) =>
      if (parity(src))
        assert(sumMargin > 0L,
          s"hq source $src tertile $tertile margin $sumMargin <= 0")
      else
        assert(sumMargin < 0L,
          s"lq source $src tertile $tertile margin $sumMargin >= 0")
    }
  }

  test("the Rocchio centroid classifier separates clustered embeddings: " +
       "with per-label orthogonal directions every held-out vector " +
       "classifies to its own label (the gated corpus's labels are " +
       "embedding-independent, so its matrix measures arithmetic)") {
    import spark.implicits._
    val rows = (0 until 400).map { i =>
      val lab = i % 8
      // dominant orthogonal direction per label + small deterministic
      // jitter — separable by construction
      val emb = (0 until 64).map { d =>
        val base = if (d == lab * 8) 10.0f else 0.0f
        base + ((i * 31 + d * 7) % 5) * 0.1f
      }.toArray
      (i.toLong, emb, lab)
    }.toDF("vec_id", "embedding", "label")
    val dest = s"target/spec-scale/rocchio-${System.nanoTime()}"
    rows.write.parquet(s"$dest/embeddings.parquet")
    val m = graft.ops.Similarity.centroidClassifier(spark, dest)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val total = m.values.sum
    val offDiag = m.collect { case ((t, p), n) if t != p => n }.sum
    assert(total > 0L)
    assert(offDiag == 0L,
      s"confusion matrix has $offDiag/$total off-diagonal assignments " +
        "on a separable fixture")
  }

  test("Davies–Bouldin reads separation: on the orthogonal " +
       "planted-cluster fixture (one seed lands in each cluster) every " +
       "cluster's worst-partner ratio is far below 1 — scatter is " +
       "dwarfed by centroid separation") {
    import spark.implicits._
    val rows = (0 until 400).map { i =>
      val lab = i % 8
      val emb = (0 until 64).map { d =>
        val base = if (d == lab * 8) 10.0f else 0.0f
        base + ((i * 31 + d * 7) % 5) * 0.1f
      }.toArray
      (i.toLong, emb, lab)
    }.toDF("vec_id", "embedding", "label")
    val dest = s"target/spec-scale/db-${System.nanoTime()}"
    rows.write.parquet(s"$dest/embeddings.parquet")
    val q = graft.ops.Similarity.clusterQuality(spark, dest).collect()
    assert(q.length == 8)
    q.foreach { r =>
      assert(r.getAs[Long]("scatter_u") >= 0L)
      assert(r.getAs[Long]("worst_partner") != r.getAs[Long]("cluster"))
      assert(r.getAs[Long]("db_ratio_ppm") < 1000000L,
        s"cluster ${r.getAs[Long]("cluster")} DB ratio " +
          s"${r.getAs[Long]("db_ratio_ppm")} ppm >= 1 on a separable fixture")
    }
  }

  test("squared-distance silhouette reads cohesion: on the orthogonal " +
       "planted-cluster fixture every cluster's WORST point scores " +
       "strongly positive (within-cluster scatter is dwarfed by the " +
       "nearest-other-cluster distance), and the point count balances") {
    import spark.implicits._
    val rows = (0 until 400).map { i =>
      val lab = i % 8
      val emb = (0 until 64).map { d =>
        val base = if (d == lab * 8) 10.0f else 0.0f
        base + ((i * 31 + d * 7) % 5) * 0.1f
      }.toArray
      (i.toLong, emb, lab)
    }.toDF("vec_id", "embedding", "label")
    val dest = s"target/spec-scale/sil-${System.nanoTime()}"
    rows.write.parquet(s"$dest/embeddings.parquet")
    val s = graft.ops.Similarity.silhouetteSq(spark, dest).collect()
    assert(s.length == 8)
    assert(s.map(_.getAs[Long]("n")).sum == 400L)
    s.foreach { r =>
      assert(r.getAs[Long]("min_s_ppm") > 500000L,
        s"cluster ${r.getAs[Long]("cluster")} worst silhouette " +
          s"${r.getAs[Long]("min_s_ppm")} ppm <= 0.5 on a separable fixture")
      assert(r.getAs[Long]("max_s_ppm") <= 1000000L)
    }
  }

  test("power iteration finds a planted principal axis: with one " +
       "dimension carrying ~100x the variance of every other, the " +
       "dominant loading lands on it (|loading| = 1e6, all others " +
       "small) and it explains >90% of total variance") {
    import spark.implicits._
    val rows = (0 until 500).map { i =>
      val emb = (0 until 64).map { d =>
        val jitter = ((i * 31 + d * 7) % 5 - 2) * 0.05f
        if (d == 5) (if (i % 2 == 0) 10.0f else -10.0f) + jitter
        else jitter
      }.toArray
      (i.toLong, emb)
    }.toDF("vec_id", "embedding")
    val dest = s"target/spec-scale/pca-${System.nanoTime()}"
    rows.write.parquet(s"$dest/embeddings.parquet")
    val r = graft.ops.Similarity.pcaPowerComponent(spark, dest).collect()
    assert(r.length == 64)
    val byDim = r.map(x => x.getAs[Long]("dim") ->
      x.getAs[Long]("loading_ppm")).toMap
    assert(math.abs(byDim(5L)) == 1000000L,
      s"dominant loading ${byDim(5L)} not at the planted axis")
    byDim.filter(_._1 != 5L).foreach { case (d, l) =>
      assert(math.abs(l) < 100000L, s"dim $d loading $l too large")
    }
    assert(r(0).getAs[Long]("var_explained_ppm") > 900000L,
      s"explained ${r(0).getAs[Long]("var_explained_ppm")} ppm")
  }

  test("filtered vector search on aligned metadata loses nothing: with " +
       "labels equal to the planted orthogonal clusters, every sampled " +
       "query's own-label cell is its top probe — no empty probes, " +
       "recall at least 0.9") {
    import spark.implicits._
    val rows = (0 until 400).map { i =>
      val lab = (i / 2) % 8 // labels present in BOTH index and query halves
      val emb = (0 until 64).map { d =>
        val base = if (d == lab * 8) 10.0f else 0.0f
        base + ((i * 31 + d * 7) % 5) * 0.1f
      }.toArray
      (i.toLong, emb, lab)
    }.toDF("vec_id", "embedding", "label")
    val dest = s"target/spec-scale/fann-${System.nanoTime()}"
    rows.write.parquet(s"$dest/embeddings.parquet")
    val r = graft.ops.Similarity.annFilteredRecall(spark, dest).head()
    assert(r.getAs[Long]("n_queries") > 0L)
    assert(r.getAs[Long]("n_empty_probe") == 0L,
      s"aligned labels produced ${r.getAs[Long]("n_empty_probe")} " +
        "empty probes")
    assert(r.getAs[Long]("recall_ppm") >= 900000L,
      s"recall ${r.getAs[Long]("recall_ppm")} ppm on an aligned fixture")
  }

  test("containment catches subset-duplication Jaccard misses: a short " +
       "doc fully embedded in a 3x-longer one scores containment 1e6 " +
       "ppm and is reported, while the symmetric Jaccard pair set " +
       "at 0.8 stays empty") {
    import spark.implicits._
    val core = (0 until 40).map(i => s"core$i").mkString(" ")
    val wrap = (0 until 90).map(i => s"wrap$i").mkString(" ")
    val filler = (0 until 8).map { d =>
      (100L + d, (0 until 50).map(i => s"f${d}x$i").mkString(" "), "en", "w")
    }
    val rows = (Seq((1L, core, "en", "w"),
      (2L, s"$core $wrap", "en", "w")) ++ filler)
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val dest = s"target/spec-scale/contain-${System.nanoTime()}"
    rows.write.parquet(s"$dest/documents.parquet")
    val pairs = graft.ops.Dedup.containmentPairs(spark, dest).collect()
    assert(pairs.length == 1, s"expected the planted pair, got " +
      s"${pairs.length}")
    assert(pairs(0).getAs[Long]("contained") == 1L &&
      pairs(0).getAs[Long]("container") == 2L)
    assert(pairs(0).getAs[Long]("containment_ppm") == 1000000L)
    val jac = graft.ops.Dedup.ngramJaccardPairs(spark, dest).collect()
    assert(jac.isEmpty, s"jaccard unexpectedly found ${jac.length} pairs")
    graft.ops.Memo.clearAll()
  }

  test("MMR prunes redundancy: with ten identical top-relevance clones " +
       "and a pool of mutually-diverse alternatives, exactly one clone " +
       "survives the diversified top-5 (pure relevance would pick five)") {
    import spark.implicits._
    def vec(pairs: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0.0f)
      pairs.foreach { case (d, x) => a(d) = x }
      a
    }
    val q = Seq((graft.ops.Retrieval.MmrQueryId, vec(0 -> 1.0f, 1 -> 0.5f)))
    val clones = (10 until 20).map(i => (i.toLong, vec(0 -> 1.0f)))
    val others = (0 until 40).map(k =>
      (100L + k, vec(0 -> 0.6f, (2 + k) % 62 + 2 -> 0.8f)))
    val rows = (q ++ clones ++ others).toDF("vec_id", "embedding")
    val dest = s"target/spec-scale/mmr-${System.nanoTime()}"
    rows.write.parquet(s"$dest/embeddings.parquet")
    val picks = graft.ops.Retrieval.mmrDiversifiedTopk(spark, dest)
      .collect().map(_.getAs[Long]("m_id"))
    assert(picks.length == 5 && picks.distinct.length == 5)
    val nClones = picks.count(id => id >= 10L && id < 20L)
    assert(nClones == 1, s"expected exactly one clone pick, got $nClones " +
      s"in ${picks.mkString(",")}")
  }

  test("truncation recall prices prefix width: with all signal in the " +
       "tail dims, narrow prefixes collapse to the tiebreak (recall " +
       "near zero) while the full width is exact by construction") {
    import spark.implicits._
    val rows = (0 until 600).map { i =>
      val emb = (0 until 64).map { d =>
        if (d < 32) 1.0f // constant prefix: every prefix cosine ties
        else ((i * 31 + d * 7) % 97 - 48) * 0.1f
      }.toArray
      (i.toLong, emb)
    }.toDF("vec_id", "embedding")
    val dest = s"target/spec-scale/mrl-${System.nanoTime()}"
    rows.write.parquet(s"$dest/embeddings.parquet")
    val r = graft.ops.Similarity.mrlTruncationRecall(spark, dest)
      .collect().map(x => x.getAs[Long]("width") ->
        x.getAs[Long]("recall_ppm")).toMap
    assert(r.keySet == Set(8L, 16L, 32L, 64L))
    assert(r(64L) == 1000000L, s"full width ${r(64L)}")
    assert(r(8L) < 100000L, s"tied prefix recall ${r(8L)} not collapsed")
    assert(r(32L) < 100000L, s"tied prefix recall ${r(32L)} not collapsed")
  }

  test("OLS recovers an exactly-linear signal: on y = 2 + 0.5x the " +
       "closed-form integer slope/intercept are exact (slope_ppm = " +
       "5e11 micro-y/hour in ppm precision, icept_micro = 2e6)") {
    import spark.implicits._
    val rows = (0 until 240).map { h =>
      (h.toLong, new java.sql.Timestamp(1700000000000L + h * 3600000L),
        (h % 7).toLong, "purchase", 2.0 + 0.5 * h, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dest = s"target/spec-scale/ols-${System.nanoTime()}"
    rows.write.parquet(s"$dest/events.parquet")
    val r = graft.ops.Analytics.linregValueTrend(spark, dest).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n") == 240L)
    assert(r(0).getAs[Long]("slope_ppm") == 500000000000L,
      s"slope ${r(0).getAs[Long]("slope_ppm")}")
    assert(r(0).getAs[Long]("icept_micro") == 2000000L,
      s"intercept ${r(0).getAs[Long]("icept_micro")}")
  }

  test("the streaming PCA drift probe reads a planted shift: incoming " +
       "vectors biased along the data's dominant axis move every " +
       "label's projection mean by the same large, same-sign offset, " +
       "and the drained fold is batch-boundary independent") {
    import spark.implicits._
    graft.ops.Memo.clearAll()
    val rows = (0 until 800).map { i =>
      val bias = if (i % 2 == 1) 5.0f else 0.0f // incoming half shifted
      val emb = (0 until 64).map { d =>
        val jitter = ((i * 31 + d * 7) % 9 - 4) * 0.05f
        if (d == 0) (if ((i / 2) % 2 == 0) 10.0f else -10.0f) + bias + jitter
        else jitter
      }.toArray
      (i.toLong, emb, (i / 2) % 4) // labels present in BOTH halves
    }.toDF("vec_id", "embedding", "label")
    val dest = s"target/spec-scale/pcadrift-${System.nanoTime()}"
    rows.write.parquet(s"$dest/embeddings.parquet")
    val d2 = graft.streaming.StreamAssembly
      .streamPcaDrift(spark, dest, nFiles = 2).collect().toSeq
    val d5 = graft.streaming.StreamAssembly
      .streamPcaDrift(spark, dest, nFiles = 5).collect().toSeq
    assert(d2 == d5, "drain result depends on micro-batch slicing")
    val shifts = d2.map(_.getAs[Long]("shift"))
    assert(shifts.nonEmpty && shifts.forall(s => math.abs(s) > 1e11.toLong),
      s"planted 5.0 bias along the dominant axis not visible: $shifts")
    assert(shifts.map(math.signum).distinct.size == 1,
      s"shift signs disagree across labels: $shifts")
    graft.ops.Memo.clearAll()
  }

  test("streaming OLS partials are batch-boundary independent: draining " +
       "the corpus as 2 or 7 micro-batches folds to the identical " +
       "slope/intercept rows, equal to the batch query") {
    val batch = graft.ops.Analytics.linregValueTrend(spark, sf)
      .collect().toSeq
    val d2 = graft.streaming.StreamAssembly
      .streamTrendPartials(spark, sf, nFiles = 2).collect().toSeq
    val d7 = graft.streaming.StreamAssembly
      .streamTrendPartials(spark, sf, nFiles = 7).collect().toSeq
    assert(d2 == batch, s"2-batch drain diverged: $d2 vs $batch")
    assert(d7 == batch, s"7-batch drain diverged: $d7 vs $batch")
  }

  test("the proportion z-test matches the closed form: 60% vs 40% " +
       "conversion on 100-user arms gives z-squared exactly 8 " +
       "(0.04 / (0.25 * 2/100)) and a 200000 ppm gap") {
    import spark.implicits._
    val rows = (0 until 200).map { u =>
      val converts =
        if (u % 2 == 0) (u / 2) < 60 // arm A: users 0..118 even, 60 convert
        else (u / 2) < 40 // arm B: 40 convert
      (u.toLong, new java.sql.Timestamp(1700000000000L + u * 1000L),
        u.toLong, if (converts) "purchase" else "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dest = s"target/spec-scale/zt-${System.nanoTime()}"
    rows.write.parquet(s"$dest/events.parquet")
    val r = graft.ops.Analytics.abProportionZtest(spark, dest).head()
    assert(r.getAs[Long]("n_a") == 100L && r.getAs[Long]("n_b") == 100L)
    assert(r.getAs[Long]("conv_a") == 60L && r.getAs[Long]("conv_b") == 40L)
    assert(r.getAs[Long]("dp_ppm") == 200000L)
    assert(r.getAs[Long]("z2_ppm") == 8000000L,
      s"z2 ${r.getAs[Long]("z2_ppm")} ppm != 8.0")
  }

  test("Mann-Whitney reads perfect separation and perfect ties: arm B " +
       "strictly above arm A gives U_a = 0 and rank-biserial 1e6; " +
       "all-equal values split U evenly with effect 0; the identity " +
       "U2_a + U2_b = 2 n_a n_b holds in both regimes") {
    import spark.implicits._
    def mk(vals: Int => Double, tag: String) = {
      val rows = (0 until 200).map { u =>
        (u.toLong, new java.sql.Timestamp(1700000000000L + u * 1000L),
          u.toLong, "view", vals(u), "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val dest = s"target/spec-scale/mw-$tag-${System.nanoTime()}"
      rows.write.parquet(s"$dest/events.parquet")
      graft.ops.Analytics.mannWhitneyValue(spark, dest).head()
    }
    val sep = mk(u => if (u % 2 == 0) 1.0 else 2.0, "sep")
    assert(sep.getAs[Long]("u2_a") == 0L)
    assert(sep.getAs[Long]("u2_b") == 20000L)
    assert(sep.getAs[Long]("rbc_ppm") == 1000000L)
    val tie = mk(_ => 5.0, "tie")
    assert(tie.getAs[Long]("u2_a") == 10000L)
    assert(tie.getAs[Long]("u2_b") == 10000L)
    assert(tie.getAs[Long]("rbc_ppm") == 0L)
    Seq(sep, tie).foreach { r =>
      assert(r.getAs[Long]("u2_a") + r.getAs[Long]("u2_b") ==
        2L * r.getAs[Long]("n_a") * r.getAs[Long]("n_b"))
    }
  }

  test("CUSUM reads a planted step change: flat first half keeps the " +
       "cusum at exactly zero, the rate doubling at hour 50 ramps it " +
       "linearly to 500 * 50 scaled units by the last hour") {
    import spark.implicits._
    // 10 events/hour for hours 0..49, 20/hour for 50..99
    val rows = (0 until 100).flatMap { h =>
      val n = if (h < 50) 10 else 20
      (0 until n).map { k =>
        ((h * 100 + k).toLong,
          new java.sql.Timestamp(1700000000000L + h * 3600000L + k * 1000L),
          k.toLong, "view", 1.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dest = s"target/spec-scale/cusum-${System.nanoTime()}"
    rows.write.parquet(s"$dest/events.parquet")
    val r = graft.ops.Analytics.cusumHourlyShift(spark, dest)
      .collect().map(_.getAs[Long]("cusum_scaled"))
    assert(r.length == 100)
    assert(r.take(50).forall(_ == 0L),
      "pre-change cusum drifted off zero on a flat baseline")
    // baseline n_base = 50, s_base = 500; post-change dev = 20*50-500
    assert(r(50) == 500L && r(99) == 500L * 50)
    assert(r.drop(50).sliding(2).forall(p => p(1) - p(0) == 500L),
      "post-change ramp not linear")
  }

  test("the Benford audit separates conforming from uniform digits: a " +
       "near-Benford first-digit profile scores an order of magnitude " +
       "below nine equal digit classes, and expected counts follow the " +
       "hardcoded ppm constants") {
    import spark.implicits._
    def mk(vals: Seq[Double], tag: String) = {
      val rows = vals.zipWithIndex.map { case (v, i) =>
        (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L),
          i.toLong, "view", v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val dest = s"target/spec-scale/benford-$tag-${System.nanoTime()}"
      rows.write.parquet(s"$dest/events.parquet")
      graft.ops.Analytics.benfordValues(spark, dest).collect()
    }
    val benfordCounts =
      Seq(301, 176, 125, 97, 79, 67, 58, 51, 46) // ~1000 Benford draws
    val conforming = mk(benfordCounts.zipWithIndex.flatMap {
      case (c, d) => Seq.fill(c)((d + 1).toDouble) }, "ok")
    val uniform = mk((0 until 900).map(u => (1 + u % 9).toDouble), "uni")
    assert(conforming.length == 9 && uniform.length == 9)
    val okScore = conforming.head.getAs[Long]("score")
    val uniScore = uniform.head.getAs[Long]("score")
    assert(uniScore > 10 * okScore,
      s"uniform $uniScore not >> conforming $okScore")
    // digit-1 expectation under n=1000: 1000 * 301030 / 1000 milli
    val d1 = conforming.find(_.getAs[Long]("digit") == 1L).get
    assert(d1.getAs[Long]("exp_milli") == 301030L)
    assert(d1.getAs[Long]("obs") == 301L)
  }

  test("chi-squared matches the closed form: a 2x2 table with 80/20 vs " +
       "60/40 splits on 100-user arms decomposes to cell terms " +
       "100/70 and 100/30 and totals 9.523808 under the ppm floors") {
    import spark.implicits._
    val rows = (0 until 200).map { u =>
      val purchase = if (u % 2 == 0) (u / 2) < 20 else (u / 2) < 40
      (u.toLong, new java.sql.Timestamp(1700000000000L + u * 1000L),
        u.toLong, if (purchase) "purchase" else "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dest = s"target/spec-scale/chi2-${System.nanoTime()}"
    rows.write.parquet(s"$dest/events.parquet")
    val r = graft.ops.Analytics.chi2TypeByArm(spark, dest).collect()
    assert(r.length == 4)
    val cells = r.map(x => (x.getAs[String]("event_type"),
      x.getAs[Long]("arm")) -> x.getAs[Long]("cell_ppm")).toMap
    assert(cells(("view", 0L)) == 1428571L)
    assert(cells(("view", 1L)) == 1428571L)
    assert(cells(("purchase", 0L)) == 3333333L)
    assert(cells(("purchase", 1L)) == 3333333L)
    assert(r.forall(_.getAs[Long]("chi2_ppm") == 9523808L))
    // expected counts: E(view, .) = 70, E(purchase, .) = 30
    val exps = r.map(x => (x.getAs[String]("event_type"),
      x.getAs[Long]("arm")) -> x.getAs[Long]("exp_milli")).toMap
    assert(exps(("view", 0L)) == 70000L && exps(("purchase", 1L)) == 30000L)
  }

  test("Welch t-squared matches the closed form: two-point arms " +
       "(12.00 +- 2.00 vs 10.00 +- 1.00, 100 users each) give " +
       "se 404/101 cents-sq, a 200-cent gap, and t2 = 79.20792 exactly " +
       "under the documented floors") {
    import spark.implicits._
    val rows = (0 until 200).map { u =>
      val v =
        if (u % 2 == 0) { if ((u / 2) % 2 == 0) 10.0 else 14.0 }
        else { if ((u / 2) % 2 == 0) 9.0 else 11.0 }
      (u.toLong, new java.sql.Timestamp(1700000000000L + u * 1000L),
        u.toLong, "purchase", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dest = s"target/spec-scale/welch-${System.nanoTime()}"
    rows.write.parquet(s"$dest/events.parquet")
    val r = graft.ops.Analytics.welchTtestValue(spark, dest).head()
    assert(r.getAs[Long]("n_a") == 100L && r.getAs[Long]("n_b") == 100L)
    assert(r.getAs[Long]("dm_ppm") == 200000000L)
    assert(r.getAs[Long]("se_a") == 404L, s"se_a ${r.getAs[Long]("se_a")}")
    assert(r.getAs[Long]("se_b") == 101L, s"se_b ${r.getAs[Long]("se_b")}")
    assert(r.getAs[Long]("t2_ppm") == 79207920L,
      s"t2 ${r.getAs[Long]("t2_ppm")} ppm")
  }

  test("the online experiment monitor is batch-boundary independent: " +
       "2- and 7-file drains fold to the identical Welch row") {
    val d2 = graft.streaming.StreamAssembly
      .streamAbMonitor(spark, sf, nFiles = 2).collect().toSeq
    val d7 = graft.streaming.StreamAssembly
      .streamAbMonitor(spark, sf, nFiles = 7).collect().toSeq
    assert(d2 == d7, s"slicing-dependent: $d2 vs $d7")
    assert(d2.head.getAs[Long]("n_a") > 0L)
  }

  test("moments read shape: a symmetric two-point value distribution " +
       "has zero third moment and kurtosis exactly 1 (the two-point " +
       "floor), and variance equal to the squared half-gap in cents") {
    import spark.implicits._
    val rows = (0 until 400).map { i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 60000L),
        (i % 7).toLong, "view", if (i % 2 == 0) 1.0 else 3.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dest = s"target/spec-scale/mom-${System.nanoTime()}"
    rows.write.parquet(s"$dest/events.parquet")
    val r = graft.ops.Analytics.momentsByType(spark, dest).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("mean_centi") == 200L)
    assert(r(0).getAs[Long]("var_centi2") == 10000L)
    assert(r(0).getAs[Long]("m3_over_m2_ppm") == 0L)
    assert(r(0).getAs[Long]("kurt_ppm") == 1000000L,
      s"kurtosis ${r(0).getAs[Long]("kurt_ppm")} ppm")
  }

  test("re-ranking never loses a match: rerank top-1 agreement " +
       "dominates ADC-only agreement (the ADC winner is always in the " +
       "candidate set, and the exact argmin keeps any true winner)") {
    import graft.ops.Similarity
    graft.ops.Memo.clearAll()
    val adc = Similarity.ivfpqProbeRecall(spark, sf).head()
    val rr = Similarity.ivfpqRerankRecall(spark, sf).head()
    assert(adc.getAs[Long]("n_queries") == rr.getAs[Long]("n_queries"))
    // same probed cells, same ceiling
    assert(adc.getAs[Long]("n_bf_in_probed") ==
      rr.getAs[Long]("n_bf_in_probed"))
    assert(rr.getAs[Long]("n_top1_match") >= adc.getAs[Long]("n_top1_match"),
      "re-ranking reduced top-1 agreement")
    // and the rerank can never beat the IVF ceiling
    assert(rr.getAs[Long]("n_top1_match") <= rr.getAs[Long]("n_bf_in_probed"))
    graft.ops.Memo.clearAll()
  }
}
