package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.KnnGraph
import graft.storage.Storage
import graft.streaming.StreamAssembly

/** The DELETE letter of the index lifecycle (tombstone segments →
  * masked serving → physical fold), the session's missing-CRUD
  * closure over the r16 accreted-index work:
  *
  *  1. masked serving NEVER returns a tombstoned vector, on either
  *     family, and the mask genuinely bites (some unmasked answer was
  *     a tombstone — the assertion isn't vacuous);
  *  2. on the PQ family the early (scan-side) mask is provably equal
  *     to the late (result-side) mask — ADC is a pure per-row
  *     function, which is the license for pushing `_row_exists` down;
  *  3. the physical fold ([[KnnGraph.knnGraphRebuildDeleted]]) leaves
  *     no edge touching a deleted vertex;
  *  4. masked serving is invariant under tombstone-segment compaction
  *     (the mask is a SET of ids — merges must not change reads);
  *  5. the tombstone drain survives an injected crash between sink
  *     write and checkpoint commit (idempotent `batch=<id>` replay).
  */
class LifecycleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() === b.count())
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("masked graph serving never returns a tombstoned vector, and " +
       "the mask bites (unmasked serving DID answer with tombstones)") {
    val masked = StreamAssembly.streamGraphServeDeleted(spark, sf)
      .localCheckpoint(true)
    assert(masked.filter(col("match_id") % 8 === 6).count() === 0)
    assert(masked.count() > 0)
    // non-vacuous: the unmasked fleet serving must have answered some
    // queries with a vec_id ≡ 6 mod 8 vector, or the mask tested nothing
    val unmaskedHits = KnnGraph.graphSearch(spark, sf)
      .filter(col("vec_id") % 4 === 3 && col("match_id") % 8 === 6)
      .count()
    assert(unmaskedHits > 0)
  }

  test("masked PQ serving never returns a tombstoned vector, and the " +
       "scan-side mask equals the result-side mask (ADC is per-row pure)") {
    val tombDir = StreamAssembly.drainTombstones(spark, sf,
      StreamAssembly.tombstoneFixture, nFiles = 3, crashAfterBatches = 0)
    val early = StreamAssembly.serveDeletedPq(spark, sf, tombDir)
      .localCheckpoint(true)
    assert(early.filter(col("match_id") % 8 === 6).count() === 0)
    assert(early.count() > 0)
    // late mask: ADC over ALL code rows, then the best non-deleted
    import graft.ops.Similarity
    graft.functions.GraftFunctions.register(spark)
    val (centsS, cbS, codesEven) = Similarity.ivfpqProbeModel(spark, sf)
    val codes = codesEven.select(col("vec_id").as("m_id"), col("cell"),
      col("s").cast("int").as("s"), col("cid"))
    val qs = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 4 === 3)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val qtab = Similarity.cellResidualTables(qs, centsS, cbS)
    val late = Similarity.adcScoresCell(codes, qtab, boundedQueries = false)
      .filter(col("m_id") % 8 =!= 6)
      .groupBy("q_id")
      .agg(min(struct(col("adc"), col("m_id"))).as("best"))
      .select(col("q_id").as("vec_id"), col("best.m_id").as("match_id"),
        col("best.adc").as("adc_dist"))
    assertSameRows(early, late)
  }

  test("the physical delete fold leaves no edge touching a deleted " +
       "vertex") {
    val folded = KnnGraph.knnGraphRebuildDeleted(spark, sf)
      .localCheckpoint(true)
    assert(folded.filter(col("vec_id") % 8 === 6).count() === 0)
    assert(folded.filter(col("nbr") % 8 === 6).count() === 0)
    assert(folded.count() > 0)
  }

  test("masked graph serving is bit-identical across tombstone-segment " +
       "compaction") {
    val tombDir = StreamAssembly.drainTombstones(spark, sf,
      StreamAssembly.tombstoneFixture, nFiles = 3, crashAfterBatches = 0)
    val before = StreamAssembly.serveDeletedGraph(spark, sf, tombDir)
      .collect().toSeq
    val (nBefore, nAfter, _) = Storage.compactBatchSink(spark, tombDir)
    assert(nBefore >= 3) // one file per drained micro-batch
    assert(nAfter < nBefore)
    StreamAssembly.invalidateDrainMemos()
    val after = StreamAssembly.serveDeletedGraph(spark, sf, tombDir)
      .collect().toSeq
    assert(before === after)
  }

  test("LSH serving from base + segments is bit-identical across " +
       "segment compaction") {
    val segDir = StreamAssembly.drainLshAppends(spark, sf,
      col("vec_id") % 4 === 1, nFiles = 3, crashAfterBatches = 0)
    val before = StreamAssembly.serveAccretedLsh(spark, sf, segDir)
      .collect().toSeq
    val (nBefore, nAfter, _) = Storage.compactBatchSink(spark, segDir)
    assert(nBefore >= 3)
    assert(nAfter < nBefore)
    // drop the drain/beam memos: the post-compaction read must be real,
    // and later tests must never inherit a compacted tree
    StreamAssembly.invalidateDrainMemos()
    val after = StreamAssembly.serveAccretedLsh(spark, sf, segDir)
      .collect().toSeq
    assert(before === after)
  }

  test("LSH append drain killed between sink write and checkpoint commit " +
       "resumes to the bit-identical signature segments; online signing " +
       "equals the batch expression") {
    val crashed = StreamAssembly.streamLshIndexAppend(spark, sf,
      crashAfterBatches = 2).localCheckpoint(true)
    val clean = StreamAssembly.streamLshIndexAppend(spark, sf)
    assertSameRows(crashed, clean)
    // online ≡ batch: the drained signatures equal the same expression
    // computed directly over the fleet
    import graft.ops.Similarity
    graft.functions.GraftFunctions.register(spark)
    val batch = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"),
        Similarity.lshSignature(col("embedding"), dim = 64,
          nPlanes = StreamAssembly.LshIndexBandBits *
            StreamAssembly.LshIndexBands).as("sig"))
    assertSameRows(crashed, batch)
  }

  test("an LSH-inserted vector is findable the moment its segment lands " +
       "(the additive-index property — no back-links, no fold needed)") {
    val served = StreamAssembly.streamLshServeAccreted(spark, sf)
      .localCheckpoint(true)
    assert(served.count() > 0)
    // non-vacuous routability: some query's best match IS an inserted
    // (≡ 1 mod 4) vector, reachable only through a segment bucket row
    assert(served.filter(col("match_id") % 4 === 1).count() > 0)
  }

  test("masked LSH serving never returns a tombstoned vector, the mask " +
       "bites (the unmasked base serving DID answer with tombstones), " +
       "and the read is compaction-invariant") {
    val tombDir = StreamAssembly.drainTombstones(spark, sf,
      StreamAssembly.tombstoneFixture, nFiles = 3, crashAfterBatches = 0)
    val masked = StreamAssembly.serveDeletedLsh(spark, sf, tombDir)
      .localCheckpoint(true)
    assert(masked.count() > 0)
    assert(masked.filter(col("match_id") % 8 === 6).count() === 0)
    // non-vacuous: the UNMASKED base-only serving answers some queries
    // with a vec_id ≡ 6 mod 8 vector, or the mask tested nothing
    val unmasked = StreamAssembly.serveLshMasked(spark, sf,
      segDir = None, tombDir = None)
    assert(unmasked.filter(col("match_id") % 8 === 6).count() > 0)
    // tombstone-segment compaction cannot change a read (the mask is a
    // SET of ids)
    val before = masked.collect().toSeq
    val (nB, nA, _) = Storage.compactBatchSink(spark, tombDir)
    assert(nB >= 3 && nA < nB)
    StreamAssembly.invalidateDrainMemos()
    val after = StreamAssembly.serveDeletedLsh(spark, sf, tombDir)
      .collect().toSeq
    assert(before === after)
  }

  test("full-CRUD LSH serving sees both pending letters: no deleted " +
       "vector answers, inserted vectors do, invariant under compaction " +
       "of either segment tree") {
    val segDir = StreamAssembly.drainLshAppends(spark, sf,
      col("vec_id") % 4 === 1, nFiles = 3, crashAfterBatches = 0)
    val tombDir = StreamAssembly.drainTombstones(spark, sf,
      StreamAssembly.tombstoneFixture, nFiles = 3, crashAfterBatches = 0)
    val served = StreamAssembly.serveFullLsh(spark, sf, segDir, tombDir)
      .localCheckpoint(true)
    assert(served.count() > 0)
    assert(served.filter(col("match_id") % 8 === 6).count() === 0)
    assert(served.filter(col("match_id") % 4 === 1).count() > 0)
    val before = served.collect().toSeq
    Storage.compactBatchSink(spark, segDir)
    Storage.compactBatchSink(spark, tombDir)
    StreamAssembly.invalidateDrainMemos()
    val after = StreamAssembly.serveFullLsh(spark, sf, segDir, tombDir)
      .collect().toSeq
    assert(before === after)
  }

  test("full-CRUD serving sees both pending letters at once: no deleted " +
       "vector ever answers, inserted vectors do, on both families — and " +
       "the read is invariant under compaction of either segment tree") {
    val segG = StreamAssembly.drainGraphInserts(spark, sf,
      col("vec_id") % 4 === 1, nFiles = 3, crashAfterBatches = 0)
    val segP = StreamAssembly.drainPqAppends(spark, sf,
      col("vec_id") % 4 === 1, nFiles = 3, crashAfterBatches = 0)
    val tombDir = StreamAssembly.drainTombstones(spark, sf,
      StreamAssembly.tombstoneFixture, nFiles = 3, crashAfterBatches = 0)
    val g = StreamAssembly.serveFullGraph(spark, sf, segG, tombDir)
      .localCheckpoint(true)
    val p = StreamAssembly.serveFullPq(spark, sf, segP, tombDir)
      .localCheckpoint(true)
    Seq(g, p).foreach { served =>
      assert(served.count() > 0)
      assert(served.filter(col("match_id") % 8 === 6).count() === 0)
      assert(served.filter(col("match_id") % 4 === 1).count() > 0)
    }
    val before = g.collect().toSeq
    Storage.compactBatchSink(spark, segG)
    Storage.compactBatchSink(spark, tombDir)
    StreamAssembly.invalidateDrainMemos()
    val after = StreamAssembly.serveFullGraph(spark, sf, segG, tombDir)
      .collect().toSeq
    assert(before === after)
  }

  // the Round15Spec planted geometry: clusters on a lattice with tiny
  // deterministic noise — where entry locality matters, unlike the
  // near-isotropic gated fixtures where recall tracks explored fraction
  private def plantedCorpus(nClusters: Int, perCluster: Int) = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    import graft.ops.Similarity
    val rows = (0 until nClusters * perCluster).map { i =>
      val c = (i / 2) % nClusters
      val emb = Seq.tabulate(64) { d =>
        val center = ((c * 31 + d * 17) % 13 - 6).toFloat
        val noise = (((i * 13 + d * 7) % 5) - 2) * 0.01f
        center + noise
      }
      (i.toLong, emb)
    }
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding"),
        Similarity.dot(col("embedding"), col("embedding")).as("sq"))
  }

  test("hierarchical serving beats the flat descent where structure " +
       "exists: upper-layer entries land in the query's cluster, the " +
       "fixed hop budget refines locally (planted: flat 0.91 -> hier 1.0)") {
    import graft.ops.{Similarity, TrainingSets}
    val e = plantedCorpus(64, 64).localCheckpoint(true)
    val idx = e.filter(col("vec_id") % 2 === 0).localCheckpoint(true)
    val qs = e.filter(col("vec_id") % 2 === 1)
      .filter(TrainingSets.bucket100(col("vec_id")) < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("sq").as("q_sq")).localCheckpoint(true)
    val serve = KnnGraph.servingEdgesOf(idx, KnnGraph.graphOf(idx, 3))
    val l1 = idx.filter(TrainingSets.bucket100(col("vec_id")) < 10)
      .localCheckpoint(true)
    val l1serve = KnnGraph.servingEdgesOf(l1, KnnGraph.graphOf(l1, 3))
    val bf = qs.crossJoin(idx.select(col("vec_id").as("m_id"),
        col("embedding").as("m_emb"), col("sq").as("m_sq")))
      .withColumn("dist", col("q_sq") + col("m_sq") -
        lit(2.0) * Similarity.dot(col("q_emb"), col("m_emb")))
      .groupBy("q_id")
      .agg(min(struct(col("dist"), col("m_id"))).as("best"))
      .select(col("q_id"), col("best.m_id").as("bf_id"))
      .localCheckpoint(true)
    val n = bf.count().toDouble
    def recall(top1: DataFrame): Double =
      top1.join(bf, "q_id").filter(col("v") === col("bf_id")).count() / n
    val flat = recall(KnnGraph.greedySearch(qs, idx, serve)
      .filter(col("rn") === 1).select(col("q_id"), col("v")))
    val entries = KnnGraph.greedySearch(qs, l1, l1serve)
      .filter(col("rn") <= KnnGraph.SearchEntries)
      .select(col("q_id"), col("v"))
    val hier = recall(
      KnnGraph.greedySearchFrom(qs, idx, serve, entries)
        .filter(col("rn") === 1).select(col("q_id"), col("v")))
    info(s"planted 64x64: flat $flat, hier $hier")
    assert(hier > flat)
    assert(hier >= 0.99)
    // and the gated path is deterministic (two runs bit-equal)
    val a = KnnGraph.graphSearchHier(spark, sf).collect().toSeq
    assert(a === KnnGraph.graphSearchHier(spark, sf).collect().toSeq)
    assert(a.nonEmpty)
  }

  test("CMS one-sided error and linearity: estimates never undercount, " +
       "and micro-batch partials merged by SUM equal the single-pass grid") {
    import graft.ops.HeavyHitters
    val audit = HeavyHitters.cmsHeavyAudit(spark, sf).localCheckpoint(true)
    assert(audit.count() > 0)
    assert(audit.filter(col("cms_est") < col("exact")).count() === 0)
    assert(audit.filter(col("overestimate") < 0).count() === 0)
    // linearity: the drained partials, summed per cell, are bit-equal to
    // the one-pass grid over the same (odd) token stream
    val drained = StreamAssembly.streamCmsPartials(spark, sf)
    val onePass = StreamAssembly.serveCmsMerged(spark, sf, {
      // a 1-batch "drain": the whole odd half in one partial
      val dir = java.nio.file.Files
        .createTempDirectory("graft_cms_onepass").toString + "/partials"
      HeavyHitters.cmsOf(
        Tables.documents(spark, sf).filter(col("doc_id") % 2 === 1)
          .select(explode(split(col("text"), " ")).as("w")))
        .write.mode("overwrite").parquet(s"$dir/batch=0")
      dir
    }, topN = 50)
    assertSameRows(drained, onePass)
  }

  test("MG partials answer deterministically: merged candidates + exact " +
       "recount equal the batch two-pass heavy hitters, under different " +
       "batch slicings") {
    import graft.ops.HeavyHitters
    val drained3 = StreamAssembly.streamMgPartials(spark, sf, nFiles = 3)
      .localCheckpoint(true)
    val drained5 = StreamAssembly.streamMgPartials(spark, sf, nFiles = 5)
    assertSameRows(drained3, drained5)
    assert(drained3.count() > 0)
    // and equal to the batch two-pass over the same (odd) half: the
    // sketch state never leaks into the answer
    import spark.implicits._
    val toks = Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 1)
      .select(explode(split(col("text"), " ")).as("w"))
    val pass1 = toks.as[String]
      .groupByKey(_ => 0)
      .agg(new HeavyHitters.MisraGries(64).toColumn.name("mg"),
        count(lit(1)).as("total").as[Long])
      .localCheckpoint(true)
    val sketch = pass1.flatMap { case (_, m, _) => m.keys }.toDF("w")
    val total = pass1.map { case (_, _, t) => t }.toDF("total")
    val batch = toks.join(broadcast(sketch), Seq("w"), "left_semi")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") * 1000L >= col("total") * 34L)
      .select(col("w").as("token"), col("n"),
        (col("n").cast("double") / col("total")).as("share"))
    assertSameRows(drained3, batch)
  }

  test("bottom-k sample partials: every batch ships at most k rows, and " +
       "the merged sample is slicing-invariant and equal to the " +
       "single-pass bottom-k") {
    val k = 25
    val dir2 = StreamAssembly.drainSamplePartials(spark, sf, nFiles = 2, k)
    val dir4 = StreamAssembly.drainSamplePartials(spark, sf, nFiles = 4, k)
    // bounded state: each batch=<id> partial holds ≤ k rows
    new java.io.File(dir4).listFiles()
      .filter(_.getName.startsWith("batch=")).foreach { d =>
        val n = spark.read.parquet(d.getPath).count()
        assert(n <= k, s"${d.getName} shipped $n > $k rows")
      }
    val merged2 = StreamAssembly.serveSampleMerged(spark, dir2, k)
      .localCheckpoint(true)
    val merged4 = StreamAssembly.serveSampleMerged(spark, dir4, k)
    assertSameRows(merged2, merged4)
    assert(merged2.count() === k)
    // and equal to the one-pass bottom-k over the same (odd) half —
    // bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B))
    val onePass = Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("source"),
        md5(concat(lit("smp"), col("doc_id").cast("string"))).as("prio"))
      .orderBy("prio").limit(k)
    assertSameRows(merged2, onePass)
  }

  test("KMV distinct estimate: exact when k covers the stream, within " +
       "the order-statistics envelope when it does not, integer-exact " +
       "arithmetic throughout") {
    import graft.ops.HeavyHitters
    // k above the fixture shingle count (~23k at sf0.001) yet under the
    // numerator's 2^15 overflow cap: the sketch holds every hash, the
    // k_eff < k branch answers EXACTLY
    val full = HeavyHitters.kmvDistinctShingles(spark, sf, k = 1 << 15)
      .collect().head
    assert(full.getLong(full.fieldIndex("k_eff")) <
      full.getLong(full.fieldIndex("k")))
    assert(full.getLong(full.fieldIndex("d_est")) ===
      full.getLong(full.fieldIndex("d_exact")))
    assert(full.getLong(full.fieldIndex("err_ppm")) === 0L)
    // estimating regime: k=256 gives rse ≈ 1/sqrt(k) ≈ 6.25%; assert a
    // generous 4-sigma envelope (25%) — deterministic, not flaky: the
    // md5 draws are fixed
    val est = HeavyHitters.kmvDistinctShingles(spark, sf, k = 256)
      .collect().head
    assert(est.getLong(est.fieldIndex("k_eff")) === 256L)
    assert(est.getLong(est.fieldIndex("err_ppm")) < 250000L,
      s"err_ppm ${est.getLong(est.fieldIndex("err_ppm"))}")
  }

  // the drain-dependent serving helpers (the wholesale PlanSpec table
  // cannot reach them — they need a drained segment dir first) hold
  // their exchange ceilings: the Round16Spec accreted-serving idiom
  // applied to the delete/LSH/Bloom read sides
  private def flattenPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val nested = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => Nil
    }
    p +: (p.children ++ p.subqueries ++ nested).flatMap(flattenPlan)
  }

  test("delete/LSH/Bloom serving plans hold their exchange ceilings, " +
       "no cartesian, no UDFs") {
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import graft.ops.TrainingSets
    val tombDir = StreamAssembly.drainTombstones(spark, sf,
      StreamAssembly.tombstoneFixture, nFiles = 3, crashAfterBatches = 0)
    val lshDir = StreamAssembly.drainLshAppends(spark, sf,
      col("vec_id") % 4 === 1, nFiles = 3, crashAfterBatches = 0)
    val ceilings = Seq(
      (StreamAssembly.serveDeletedGraph(spark, sf, tombDir),
        "graph-deleted", 2),
      (StreamAssembly.serveDeletedPq(spark, sf, tombDir),
        "pq-deleted", 6),
      (StreamAssembly.serveAccretedLsh(spark, sf, lshDir),
        "lsh-accreted", 4),
      (TrainingSets.bloomVerdict(
        Tables.documents(spark, sf).filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("text")),
        TrainingSets.bloomModel(spark, sf)), "bloom-verdict", 3))
    ceilings.foreach { case (df, name, ceiling) =>
      df.collect()
      val plan = flattenPlan(df.queryExecution.executedPlan)
      assert(!plan.exists(
          _.getClass.getSimpleName.contains("CartesianProduct")),
        s"$name: cartesian product")
      assert(!plan.exists(_.expressions.exists(
          _.exists(_.isInstanceOf[ScalaUDF]))), s"$name: ScalaUDF")
      val n = plan.count(_.isInstanceOf[ShuffleExchangeExec])
      info(s"serve $name: $n exchanges (ceiling $ceiling)")
      assert(n <= ceiling, s"$name exchanges grew: $n > $ceiling")
    }
  }

  test("the combined warm fold absorbs inserts AND deletes in one " +
       "round: no deleted vertex survives, every insert is stitched in") {
    val folded = KnnGraph.knnGraphWarmRebuildLive(spark, sf)
      .localCheckpoint(true)
    assert(folded.filter(col("vec_id") % 8 === 6).count() === 0)
    assert(folded.filter(col("nbr") % 8 === 6).count() === 0)
    // every inserted (≡ 1 mod 4) vector owns a neighbor list post-fold
    val nInserted = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 4 === 1).count()
    val nInsertedFolded = folded.filter(col("vec_id") % 4 === 1)
      .select("vec_id").distinct().count()
    assert(nInsertedFolded === nInserted)
    // and inserts are ROUTABLE post-fold: live base vertices point at them
    assert(folded.filter(col("vec_id") % 2 === 0 && col("nbr") % 4 === 1)
      .count() > 0)
  }

  test("Bloom filter has no false negatives: every exact hit is a bloom " +
       "hit, and a self-probe flags every shingled doc completely") {
    import graft.ops.TrainingSets
    val audit = TrainingSets.bloomContamination(spark, sf)
      .localCheckpoint(true)
    // exact ⊆ bloom, per lang (n_bloom_hits ≥ n_exact_hits, and the fp
    // column is exactly the difference)
    assert(audit.filter(col("n_bloom_hits") < col("n_exact_hits"))
      .count() === 0)
    assert(audit.filter(
      col("n_false_pos") =!= col("n_bloom_hits") - col("n_exact_hits"))
      .count() === 0)
    // self-probe: even docs against their own filter — every shingle of
    // every doc must hit (the filter contains them by construction)
    val self = TrainingSets.bloomVerdict(
      Tables.documents(spark, sf).filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text")),
      TrainingSets.bloomModel(spark, sf))
    assert(self.filter(col("n_hit_shingles") =!= col("n_shingles"))
      .count() === 0)
    assert(self.filter(col("n_shingles") > 0).count() > 0)
  }

  test("streamed Bloom verdicts equal the batch twin (doc-local given " +
       "the frozen filter broadcast)") {
    import graft.ops.TrainingSets
    val drained = StreamAssembly.streamBloomProbe(spark, sf)
    val batch = TrainingSets.bloomVerdict(
      Tables.documents(spark, sf).filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text")),
      TrainingSets.bloomModel(spark, sf))
    assertSameRows(drained, batch)
    assert(drained.count() > 0)
  }

  test("tombstone drain killed between sink write and checkpoint commit " +
       "resumes to the bit-identical tombstone set") {
    val crashedDir = StreamAssembly.drainTombstones(spark, sf,
      StreamAssembly.tombstoneFixture, nFiles = 3, crashAfterBatches = 2)
    val cleanDir = StreamAssembly.drainTombstones(spark, sf,
      StreamAssembly.tombstoneFixture, nFiles = 3, crashAfterBatches = 0)
    assertSameRows(
      spark.read.parquet(crashedDir).select("vec_id"),
      spark.read.parquet(cleanDir).select("vec_id"))
    assert(spark.read.parquet(crashedDir).count() > 0)
  }
}
