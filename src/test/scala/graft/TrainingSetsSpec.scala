package graft

import org.apache.spark.sql.functions._

/** Training-set curation ops and the IVF ANN path: recall against the
  * exact ranking, packing conservation, and sample determinism.
  */
class TrainingSetsSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.01"

  test("IVF top-k recalls most of the brute-force top-k") {
    val exact = graft.ops.Similarity.bruteForceTopK(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = graft.ops.Similarity.ivfTopK(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ivf.size === 10)
    assert((exact intersect ivf).size >= 6,
      s"IVF recall too low: ${(exact intersect ivf).size}/10")
  }

  test("pack_sequences conserves docs and tokens, bins respect the budget") {
    val packed = graft.ops.TrainingSets.packSequences(spark, sf)
    val docs = Tables.documents(spark, sf)
      .withColumn("est", ceil(col("n_chars") / 4.0).cast("long"))
    val (nDocs, sumEst) = {
      val r = docs.agg(count(lit(1)), sum("est")).head
      (r.getLong(0), r.getLong(1))
    }
    val agg = packed.agg(sum("n_docs"), sum("sum_est_tokens")).head
    assert(agg.getLong(0) === nDocs)       // every doc packed exactly once
    assert(agg.getLong(1) === sumEst)      // token mass conserved
    // each bin starts strictly within budget of the previous (no empty bins)
    val maxBin = packed.groupBy("lang").agg(max("bin").as("mb"),
      (sum("sum_est_tokens") / 2048L).as("expected")).collect()
    maxBin.foreach(r => assert(r.getLong(1) <= r.getDouble(2) + 1))
  }

  test("stratified sample is a subset with deterministic per-doc choice") {
    val a = graft.ops.TrainingSets.stratifiedSample(spark, sf).collect()
    val b = graft.ops.TrainingSets.stratifiedSample(spark, sf).collect()
    assert(a.sameElements(b))
    val total = Tables.documents(spark, sf).count()
    val sampled = a.map(_.getLong(1)).sum
    assert(sampled > 0 && sampled < total)
  }

  test("contamination counts are bounded by test-set sizes") {
    val r = graft.ops.TrainingSets.contaminationCheck(spark, sf)
      .filter(col("n_contaminated") > col("n_test")).count()
    assert(r === 0)
  }

  test("banded-LSH ANN top-k recalls >= 8 of the brute-force top-10") {
    val exact = graft.ops.Similarity.bruteForceTopK(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = graft.ops.Similarity.annTopK(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(exact.size === 10)
    assert((exact intersect ann).size >= 8,
      s"ANN recall too low: ${(exact intersect ann).size}/10")
  }

  test("embedding LSH near-dup recalls >= 95% of the exact pairs") {
    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col(df.columns(0)), col(df.columns(1)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(graft.ops.Dedup.embeddingNearDups(spark, sf))
    val lsh = pairSet(graft.ops.Dedup.embeddingNearDupsLsh(spark, sf))
    // every LSH pair is exact-cosine verified, so precision is 1 by
    // construction; recall is the banding-scheme property under test
    assert(lsh.subsetOf(exact))
    assert(exact.nonEmpty)
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall >= 0.95, s"LSH recall $recall < 0.95 (${lsh.size}/${exact.size})")
  }

  test("uncapped LSH density guard trips on a twin-dense corpus and " +
       "stays silent at spec density") {
    // silent at sf0.01 with the default headroom: constructing the
    // query runs the guard (the recall spec above also proves this,
    // but pin it explicitly)
    graft.ops.Dedup.embeddingNearDupsLsh(spark, sf)
    // twin-dense fixture: every vector duplicated 16x with fresh ids —
    // est/bound grows linearly in corpus size (ratio ≈ 0.25 at sf0.01
    // → ≈ 4 at 16x), so a tightened headroom of 2 exposes the same
    // mechanism the sf2 rehearsal hit at the default 16 (measured
    // ratios: 0.25 sf0.01, 10 sf1-survivable, 20 sf2-fatal)
    val twins = 16
    val dir = "target/tmp/lsh_guard_fixture"
    val base = Tables.embeddings(spark, sf)
    val n = base.count()
    base.crossJoin(
        spark.range(twins).select(col("id").as("copy")))
      .select((col("vec_id") + col("copy") * lit(n)).as("vec_id"),
        col("embedding"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val ex = intercept[IllegalStateException] {
      graft.ops.Dedup.embeddingNearDupsLsh(spark, dir, guardHeadroom = 2L)
    }
    assert(ex.getMessage.contains("embeddingNearDupsLshCapped"))
    // the capped sibling runs the same corpus without complaint — its
    // work bound is density-independent
    assert(graft.ops.Dedup.embeddingNearDupsLshCapped(spark, dir)
      .limit(1).count() >= 0)
  }

  test("sampled-stratum recall audits: deterministic stratum, exact " +
       "anchor accounting, anchors bounded by the full audit") {
    // the md5 coin is a pure function of vec_id: the stratum (and with
    // it every count in the audit) is identical across runs
    val k1 = graft.ops.Similarity.knnLabelPuritySampled(spark, sf).collect()
    val k2 = graft.ops.Similarity.knnLabelPuritySampled(spark, sf).collect()
    assert(k1.sameElements(k2))
    // anchor accounting: sampled n_vecs sums to exactly the coin<20
    // stratum size (no anchor lost or duplicated by the restriction)
    val coin = pmod(conv(substring(md5(col("vec_id").cast("string")),
      1, 8), 16, 10).cast("long"), lit(100))
    val stratum = Tables.embeddings(spark, sf).filter(coin < 20).count()
    assert(k1.map(_.getAs[Long]("n_vecs")).sum === stratum)
    val a = graft.ops.Similarity.annProbeRecallSampled(spark, sf).head()
    val oddStratum = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 2 === 1 && coin < 20).count()
    assert(a.getAs[Long]("n_queries") === oddStratum)
    // per-label, the sampled audit never sees more anchors than the
    // full one
    val full = graft.ops.Similarity.knnLabelPurity(spark, sf).collect()
      .map(r => r.getAs[String]("label") -> r.getAs[Long]("n_vecs")).toMap
    k1.foreach(r =>
      assert(r.getAs[Long]("n_vecs") <= full(r.getAs[String]("label"))))
    // the sampled PQ fleet audit accounts for exactly the odd-stratum
    // probes
    val pq = graft.ops.Similarity.pqProbeRecallSampled(spark, sf).head()
    assert(pq.getAs[Long]("n_queries") === oddStratum)
    assert(pq.getAs[Long]("n_top1_match") + pq.getAs[Long]("n_missed")
      === oddStratum)
    // the sampled LSH confusion matrix is internally consistent and
    // strictly smaller than the full audit's
    val ls = graft.ops.Dedup.lshRecallSampled(spark, sf).head()
    val lf = graft.ops.Dedup.lshRecallEval(spark, sf).head()
    assert(ls.getAs[Long]("tp") <= ls.getAs[Long]("n_cand"))
    assert(ls.getAs[Long]("tp") <= ls.getAs[Long]("n_exact"))
    assert(ls.getAs[Long]("n_exact") <= lf.getAs[Long]("n_exact"))
    assert(ls.getAs[Long]("n_cand") <= lf.getAs[Long]("n_cand"))
  }

  test("shard assignment partitions the corpus exactly, roughly evenly") {
    val shards = graft.ops.TrainingSets.shardAssignment(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(shards.map(_.getAs[Long]("n_docs")).sum === total) // a partition
    assert(shards.length === 16)                              // none empty
    // md5 uniformity: no shard more than 3x the ideal share (5000/16)
    val ideal = total.toDouble / 16
    shards.foreach { r =>
      assert(r.getAs[Long]("n_docs") <= ideal * 3,
        s"shard ${r.getAs[Long]("shard")} over-filled")
      assert(r.getAs[String]("md5_lo") <= r.getAs[String]("md5_hi"))
    }
  }

  test("target mix sampling approaches the target proportions and is " +
       "a deterministic subset") {
    val mix = graft.ops.TrainingSets.targetMixSample(spark, sf)
    val rows = mix.collect()
    val kept = rows.map(r =>
      r.getAs[String]("source") -> r.getAs[Long]("n_kept")).toMap
    val total = kept.values.sum.toDouble
    val target = Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2,
      "src3" -> 0.1)
    assert(kept.keySet === target.keySet) // unweighted sources dropped
    target.foreach { case (s, w) =>
      val achieved = kept(s) / total
      assert(math.abs(achieved - w) < 0.08,
        s"$s mix $achieved vs target $w")
    }
    rows.foreach { r => // never keeps more than exist, never over quota
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_avail"))
    }
    // deterministic: identical report on a second evaluation
    assert(mix.collect().map(_.toString).sorted
      === rows.map(_.toString).sorted)
  }
}
