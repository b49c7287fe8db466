package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, KnnGraph, Memo, Privacy, Similarity}
import graft.storage.Storage

/** Round-18 closures:
  *
  *  - the memoized full-fleet descent beams serve their stratified
  *    audit siblings by FILTER — exact only because greedy descent is
  *    per-query independent; this pins restriction-commutes on the
  *    real path (a fresh stratum descent vs the filtered memo);
  *  - the branched fold (driver-side one-row decision, only the chosen
  *    branch executed) returns the gated both-branch loop's rows on
  *    BOTH thresholds;
  *  - index-model persistence: a serve from LOADED artifacts with the
  *    memo tier killed is bit-identical to the in-session serve, for
  *    both model-bearing families; a tampered manifest fails loudly;
  *  - the entry tower's level populations NEST and are non-empty at
  *    the gate fixtures; multi-probe LSH candidates are a superset of
  *    the capped scheme's at measured-higher recall;
  *  - the DP release is deterministic, its noise scales with 1/ε, and
  *    the released value decomposes exactly.
  */
class Round18Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    val ac = a.collect().toSeq
    val bc = b.collect().toSeq
    assert(a.columns.toSeq === b.columns.toSeq)
    assert(ac === bc)
  }

  test("a stratum's descent equals the memoized full-fleet beam " +
       "filtered to the stratum (restriction commutes with greedy " +
       "descent — the r18 memoization's correctness claim)") {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        Similarity.dot(col("embedding"), col("embedding")).as("sq"))
    val coin = graft.ops.TrainingSets.bucket100(col("vec_id")) < 20
    val idx = e.filter(col("vec_id") % 2 === 0)
    val qsStrat = e.filter(col("vec_id") % 2 === 1).filter(coin)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("sq").as("q_sq"))
    // fresh stratum-only descent, no memo involved
    val fresh = KnnGraph.greedySearch(qsStrat, idx,
        KnnGraph.servingGraph(spark, sf))
      .filter(col("rn") === 1)
      .select(col("q_id").as("vec_id"), col("v").as("match_id"))
      .orderBy("vec_id")
    // the gated full-fleet serve (memoized beam) filtered to the stratum
    val viaMemo = KnnGraph.graphSearch(spark, sf)
      .filter(graft.ops.TrainingSets.bucket100(col("vec_id")) < 20)
      .select(col("vec_id"), col("match_id"))
      .orderBy("vec_id")
    assert(fresh.count() > 0)
    assertSameRows(fresh, viaMemo)
  }

  test("the branched fold executes only the chosen branch yet returns " +
       "the gated both-branch loop's rows — on both thresholds") {
    // threshold 1: the fixture's evicted count trips it -> fold branch
    assertSameRows(
      KnnGraph.graphFoldDecisionBranchedAt(spark, sf, 1L),
      KnnGraph.graphFoldDecisionAt(spark, sf, 1L))
    // astronomically high: never due -> serve-on branch
    assertSameRows(
      KnnGraph.graphFoldDecisionBranchedAt(spark, sf, Long.MaxValue),
      KnnGraph.graphFoldDecisionAt(spark, sf, Long.MaxValue))
    // and the two thresholds actually exercised DIFFERENT branches
    val due = KnnGraph.graphFoldDecisionBranchedAt(spark, sf, 1L)
      .select("fold_due").distinct().collect().map(_.getLong(0)).toSeq
    val not = KnnGraph.graphFoldDecisionBranchedAt(spark, sf, Long.MaxValue)
      .select("fold_due").distinct().collect().map(_.getLong(0)).toSeq
    assert(due === Seq(1L) && not === Seq(0L))
  }

  test("graph index persistence: a fresh-session load (memo tier " +
       "killed) serves bit-identically to the in-session build") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_r18_graph_persist").toString
    Storage.writeIndex(KnnGraph.servingGraph(spark, sf),
      root, "serve_edges")
    Storage.writeIndex(KnnGraph.upperServingGraph(spark, sf),
      root, "upper_edges")
    val inSession = KnnGraph.graphSearchHier(spark, sf)
      .filter(graft.ops.TrainingSets.bucket100(col("vec_id")) < 20)
      .collect().toSeq
    Memo.clearAll() // the "restart": every in-process model memo gone
    val loaded = KnnGraph.serveGraphFromArtifacts(spark, sf, root, 20)
      .collect().toSeq
    assert(loaded.nonEmpty)
    assert(loaded === inSession)
  }

  test("PQ index persistence: the loaded centroids/codebook/codes " +
       "serve bit-identically with the memo tier killed") {
    graft.functions.GraftFunctions.register(spark)
    val (cents, cb, codes) = Similarity.ivfpqProbeModel(spark, sf)
    val root = java.nio.file.Files
      .createTempDirectory("graft_r18_pq_persist").toString
    Storage.writeIndex(cents, root, "centroids")
    Storage.writeIndex(cb, root, "codebook")
    Storage.writeIndex(
      codes.select(col("vec_id"), col("cell"), col("s"), col("cid")),
      root, "codes")
    // in-session probe straight off the live model frames
    val qs = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 2 === 1)
      .filter(graft.ops.TrainingSets.bucket100(col("vec_id")) < 20)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val inSession = Similarity.adcScoresCell(
        codes.select(col("vec_id").as("m_id"), col("cell"), col("s"),
          col("cid")),
        Similarity.cellResidualTables(qs, cents, cb))
      .groupBy("q_id")
      .agg(min(struct(col("adc"), col("m_id"))).as("best"))
      .select(col("q_id").as("vec_id"), col("best.m_id").as("match_id"),
        col("best.adc").as("adc_dist"))
      .orderBy("vec_id")
      .collect().toSeq
    Memo.clearAll()
    val loaded = Similarity.servePqFromArtifacts(spark, sf, root, 20)
      .collect().toSeq
    assert(loaded.nonEmpty)
    assert(loaded === inSession)
  }

  test("a tampered index manifest fails the load loudly") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_r18_manifest").toString
    Storage.writeIndex(KnnGraph.servingGraph(spark, sf), root, "edges")
    // loads clean first
    assert(Storage.loadIndex(spark, root, "edges").count() > 0)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/edges/_manifest.json"),
      """{"rows": 1, "schema": "src:bigint,dst:bigint"}""")
    // drop the local-FS checksum sidecar so the MANIFEST check (not the
    // transport checksum) is what rejects the tampered artifact
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$root/edges/._manifest.json.crc"))
    val e = intercept[IllegalArgumentException] {
      Storage.loadIndex(spark, root, "edges")
    }
    assert(e.getMessage.contains("manifest"))
  }

  test("tower level populations NEST (each level is a subset of the " +
       "one below) and every level is non-empty at the gate fixture") {
    val e = Tables.embeddings(spark, sf).filter(col("vec_id") % 2 === 0)
    var below = e.count()
    for (t <- 1 to KnnGraph.TowerLevels) {
      val lvl = e.filter(KnnGraph.towerCoin(t))
      val n = lvl.count()
      assert(n > 0, s"tower level $t is empty at $sf")
      assert(n < below, s"tower level $t did not shrink: $n >= $below")
      // nesting: level t rows all satisfy level t-1's coin
      if (t > 1) {
        val escaped = lvl.filter(!KnnGraph.towerCoin(t - 1)).count()
        assert(escaped === 0L, s"level $t escapes level ${t - 1}")
      }
      below = n
    }
    // the tower serve answers the full query fleet
    val served = KnnGraph.graphSearchTower(spark, sf)
    assert(served.count() ===
      Tables.embeddings(spark, sf).filter(col("vec_id") % 2 === 1).count())
  }

  test("multi-probe LSH candidates are a SUPERSET of the capped " +
       "scheme's verified pairs, and measured recall is >= capped") {
    val capped = Dedup.embeddingNearDupsLshCapped(spark, sf)
      .select("vec_a", "vec_b")
    val multi = Dedup.embeddingNearDupsLshMultiprobe(spark, sf)
      .select("vec_a", "vec_b")
    val missing = capped.join(multi, Seq("vec_a", "vec_b"), "left_anti")
    assert(missing.count() === 0L,
      "a home-home pair vanished under multi-probe")
    val eval = Dedup.lshMultiprobeRecallEval(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(eval("multiprobe") >= eval("capped"),
      s"multi-probe recall ${eval("multiprobe")} below capped " +
        s"${eval("capped")}")
  }

  test("DP noisy counts: deterministic, exact decomposition, and noise " +
       "scale doubles when epsilon halves (sign preserved)") {
    val a = Privacy.dpNoisyCounts(spark, sf).collect().toSeq
    val b = Privacy.dpNoisyCounts(spark, sf).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getLong(4) === r.getLong(2) * 1000000L + r.getLong(3),
        "noisy_u must decompose as n_docs*1e6 + noise_u")
    }
    // not all-zero noise, both signs present at 20 sources
    val noises = a.map(_.getLong(3))
    assert(noises.exists(_ > 0) && noises.exists(_ < 0))
    val half = Privacy.dpNoisyCounts(spark, sf, epsMicro = 500000)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val full = a.map(r => r.getString(0) -> r.getLong(3)).toMap
    full.foreach { case (src, n1) =>
      val n2 = half(src)
      assert(math.signum(n2.toDouble) === math.signum(n1.toDouble))
      assert(math.abs(n2) >= math.abs(n1),
        s"$src: halving epsilon must not shrink the noise ($n1 -> $n2)")
    }
  }
}
