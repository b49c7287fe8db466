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
}
