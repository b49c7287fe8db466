package graft

import org.apache.spark.sql.DataFrame

import graft.streaming.StreamAssembly

/** Round-15 additions: checkpoint-restart recovery for the STATEFUL
  * drains. `StreamRestartSpec` proves exactly-once across restart for
  * stateless file-source ingest; these three kill each stateful shape
  * mid-drain — AFTER a micro-batch's sink write but BEFORE its
  * checkpoint commit, the harshest window: the state store must rewind
  * to the batch's pre-state and the replayed batch's output must
  * REPLACE (not duplicate) the orphaned sink write — and assert the
  * resumed drain lands on the row-identical result of an uninterrupted
  * drain of the same source:
  *
  *  - the `transformWithState` timer sessionizer (RocksDB provider —
  *    hand-managed per-key state + close timers),
  *  - the built-in `session_window` merge aggregate (HDFS-backed
  *    provider — engine-managed window-merge state),
  *  - the watermarked stream-stream self-join (two symmetric join state
  *    stores + watermark eviction).
  *
  * This is the reference consumer's crash story
  * (`consumers/kafka_to_clickhouse.py:127-129` — restart polling after
  * an error, at-least-once) upgraded to exactly-once for stateful
  * state-store recovery. The TWS shape additionally runs as the gated
  * query `stream_tws_restart` against the batch oracle.
  */
class Round15Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def assertSameRows(crashed: DataFrame, clean: DataFrame): Unit = {
    assert(crashed.count() === clean.count())
    assert(crashed.exceptAll(clean).count() === 0)
    assert(clean.exceptAll(crashed).count() === 0)
  }

  test("TWS sessionizer killed mid-drain resumes from RocksDB " +
       "checkpoint to the identical session table") {
    val crashed = StreamAssembly.streamSessionsTws(spark, sf,
      crashAfterBatches = 2)
    val clean = StreamAssembly.streamSessionsTws(spark, sf)
    assertSameRows(crashed, clean)
    assert(crashed.count() > 0)
  }

  test("session_window drain killed mid-drain resumes from checkpoint " +
       "to the identical session table") {
    val crashed = StreamAssembly.streamSessionWindows(spark, sf,
      crashAfterBatches = 2)
    val clean = StreamAssembly.streamSessionWindows(spark, sf)
    assertSameRows(crashed, clean)
    assert(crashed.count() > 0)
  }

  test("watermarked stream-stream join killed mid-drain resumes from " +
       "checkpoint to the identical pair accounting") {
    val crashed = StreamAssembly.streamJoinFollowupsWatermarked(spark, sf,
      crashAfterBatches = 2)
    val clean = StreamAssembly.streamJoinFollowupsWatermarked(spark, sf)
    assertSameRows(crashed, clean)
    assert(crashed.count() > 0)
  }

  test("graph-index insertion drains to identical edge lists under " +
       "any micro-batch slicing") {
    val d2 = StreamAssembly.streamGraphInsert(spark, sf, nFiles = 2)
    val d4 = StreamAssembly.streamGraphInsert(spark, sf, nFiles = 4)
    assertSameRows(d2, d4)
    assert(d2.count() > 0)
  }

  // ------------------------------------------------------------------
  // NN-descent k-NN graph
  // ------------------------------------------------------------------

  /** Planted-cluster corpus: 64 tight clusters × 64 points in 64 dims,
    * deterministic integer centers with ±0.02 noise — true 8-NN are
    * always in-cluster. 4096 points make 3 rounds' candidate
    * exploration (~(2k)²·3 ≈ 768 scored/vertex ≈ 19% of the corpus)
    * genuinely non-exhaustive, so high recall can only come from the
    * descent exploiting local structure — unlike the near-isotropic
    * gated fixtures, where recall honestly tracks explored fraction.
    */
  private def plantedCorpus(nClusters: Int = 64,
                            perCluster: Int = 64)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // (i / 2) % k cluster labels, NOT i % k: even/odd halves must both
    // carry every cluster (the even-ids-only-get-even-labels trap)
    val rows = (0 until nClusters * perCluster).map { i =>
      val c = (i / 2) % nClusters
      val emb = Seq.tabulate(64) { d =>
        val center = ((c * 31 + d * 17) % 13 - 6).toFloat
        val noise = (((i * 13 + d * 7) % 5) - 2) * 0.01f
        center + noise
      }
      (i.toLong, emb)
    }
    val df = rows.toDF("vec_id", "embedding")
    df.select(org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.col("embedding"),
      graft.ops.Similarity.dot(
        org.apache.spark.sql.functions.col("embedding"),
        org.apache.spark.sql.functions.col("embedding")).as("sq"))
  }

  test("NN-descent converges on planted clusters (recall >= 0.9 in 3 " +
       "rounds at 19% exploration) and improves monotonically over init") {
    val e = plantedCorpus().localCheckpoint(true)
    val init = graft.ops.KnnGraph.graphOf(e, 0)
    val refined = graft.ops.KnnGraph.graphOf(e, 3)
    assert(refined.count() === 4096L * graft.ops.KnnGraph.K)
    def recallPpm(g: org.apache.spark.sql.DataFrame): Long =
      graft.ops.KnnGraph.recallOfFrames(e, g, 20)
        .select("recall_ppm").head().getLong(0)
    val r0 = recallPpm(init)
    val r3 = recallPpm(refined)
    assert(r0 < 300000L, s"init recall unexpectedly high: $r0")
    assert(r3 >= 900000L, s"refined recall too low: $r3")
    assert(r3 > r0)
  }

  test("greedy graph-descent serves the exact top-1 on planted " +
       "clusters; the NSW long-range links are what make it navigable") {
    import org.apache.spark.sql.functions._
    val e = plantedCorpus(16, 256).localCheckpoint(true)
    val idx = e.filter(col("vec_id") % 2 === 0).localCheckpoint(true)
    val qs = e.filter(col("vec_id") % 2 === 1)
      .filter(graft.ops.TrainingSets.bucket100(col("vec_id")) < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("sq").as("q_sq"))
      .localCheckpoint(true)
    val knn = graft.ops.KnnGraph.graphOf(idx, 3)
    val serve = graft.ops.KnnGraph.servingEdgesOf(idx, knn)
    // exact top-1 over the index per sampled query
    val bf = qs.crossJoin(idx.select(col("vec_id").as("m_id"),
        col("embedding").as("m_emb"), col("sq").as("m_sq")))
      .withColumn("dist", col("q_sq") + col("m_sq") -
        lit(2.0) * graft.ops.Similarity.dot(col("q_emb"), col("m_emb")))
      .groupBy("q_id")
      .agg(min(struct(col("dist"), col("m_id"))).as("best"))
      .select(col("q_id"), col("best.m_id").as("bf_id"))
      .localCheckpoint(true)
    def top1Recall(edges: org.apache.spark.sql.DataFrame): Double = {
      val g = graft.ops.KnnGraph.greedySearch(qs, idx, edges)
        .filter(col("rn") === 1).select(col("q_id"), col("v"))
      val n = bf.count().toDouble
      g.join(bf, "q_id").filter(col("v") === col("bf_id")).count() / n
    }
    val withLinks = top1Recall(serve)
    val knnOnly = top1Recall(knn.select(col("src"), col("dst")))
    // pure k-NN edges: clusters are disconnected components, descent
    // cannot leave the entry's cluster
    assert(knnOnly < 0.2, s"knn-only recall unexpectedly high: $knnOnly")
    assert(withLinks >= 0.9, s"serving recall too low: $withLinks")
  }

  test("calibration deciles are closed-form on a hand-built margin " +
       "frame (perfectly separable classifier)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 20 docs, margins strictly decreasing with doc_id, the top half
    // truly hq: deciles must split 2-per-decile with hq share 1.0 in
    // deciles 0-4 and 0.0 in 5-9, margin bounds exact
    val m = (1 to 20).map { i =>
      (i.toLong, (21L - i) * 1000000L, if (i <= 10) 1L else 0L)
    }.toDF("doc_id", "margin", "is_hq")
    val got = graft.ops.TrainingSets.calibrationOf(m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val want = (0 until 10).map { d =>
      val hi = (20 - 2 * d).toLong * 1000000L
      val lo = (19 - 2 * d).toLong * 1000000L
      val hq = if (d < 5) 2L else 0L
      (d.toLong, 2L, hq, hq * 500000L, lo, hi)
    }
    assert(got.toSeq === want)
  }

  test("knn_graph_build is k rows per vertex with dense ranks on the " +
       "real fixture") {
    val g = graft.ops.KnnGraph.knnGraphBuild(spark, sf)
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(g.count() === n * graft.ops.KnnGraph.K)
    import org.apache.spark.sql.functions._
    val perVertex = g.groupBy("vec_id")
      .agg(count(lit(1)).as("c"), max("rank").as("mx"), min("rank").as("mn"))
    assert(perVertex.filter(col("c") =!= graft.ops.KnnGraph.K.toLong ||
      col("mx") =!= graft.ops.KnnGraph.K.toLong || col("mn") =!= 1L)
      .count() === 0)
    // neighbors are real vertices (the rank-domain init draws only
    // existing ids even on sparse id spaces)
    val ids = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id").as("nbr"))
    assert(g.join(ids, Seq("nbr"), "left_anti").count() === 0)
  }
}
