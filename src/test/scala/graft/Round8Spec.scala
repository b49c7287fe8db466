package graft

import org.apache.spark.sql.functions._

/** Properties of the round-8 operators: k-means (the IVF trainer),
  * group-aware leakage-safe splitting, k-fold assignment, text
  * normalization, and integer PageRank over the near-dup graph.
  */
class Round8Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def md5bucket(c: org.apache.spark.sql.Column, m: Int) =
    pmod(conv(substring(md5(c.cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(m))

  test("kmeans: clusters partition the corpus and Lloyd does not regress") {
    val out = graft.ops.Similarity.kmeansClusters(spark, sf).collect()
    assert(out.length === 8)
    val corpus = Tables.embeddings(spark, sf).count()
    assert(out.map(_.getLong(1)).sum === corpus)
    val wcss2 = out.map(_.getDecimal(2).doubleValue()).sum
    // recompute the SEED-assignment objective (iteration-1 WCSS): one Lloyd
    // update must not increase the k-means objective
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        graft.ops.Similarity.dot(col("embedding"), col("embedding")).as("sq"))
    val c0 = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"),
        col("sq").as("csq"))
    val wcss1 = e.crossJoin(broadcast(c0))
      .withColumn("dist", col("sq") + col("csq") -
        lit(2.0) * graft.ops.Similarity.dot(col("embedding"), col("cemb")))
      .groupBy("vec_id").agg(min("dist").as("d"))
      .agg(sum("d")).collect()(0).getDouble(0)
    assert(wcss2 <= wcss1 + 1e-6, s"Lloyd regressed: $wcss2 > $wcss1")
  }

  test("leakage-safe split: total, and NO near-dup pair straddles splits") {
    val out = graft.ops.TrainingSets.leakageSafeSplit(spark, sf).collect()
    val corpus = Tables.documents(spark, sf).count()
    assert(out.map(_.getLong(1)).sum === corpus)
    // re-derive the per-doc split and check every near-dup pair lands in
    // one split — the property the operator exists to guarantee
    val labels = graft.ops.Dedup.clusterLabels(spark, sf)
      .select(col("node").as("doc_id"), col("label"))
    val splits = Tables.documents(spark, sf)
      .join(labels, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        md5bucket(coalesce(col("label"), col("doc_id")), 100).as("b"))
      .select(col("doc_id"),
        when(col("b") < 80, "train").when(col("b") < 90, "val")
          .otherwise("test").as("split"))
    val pairs = graft.ops.Dedup.ngramJaccardPairs(spark, sf)
      .select("doc_a", "doc_b")
    val crossing = pairs
      .join(splits.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "sa"), Seq("doc_a"))
      .join(splits.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "sb"), Seq("doc_b"))
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(crossing === 0L)
    // and the naive per-doc split DOES leak here (the operator is not a
    // no-op): at least one pair of this corpus straddles doc-id buckets
    val naive = Tables.documents(spark, sf)
      .select(col("doc_id"), md5bucket(col("doc_id"), 100).as("b"))
      .select(col("doc_id"),
        when(col("b") < 80, "train").when(col("b") < 90, "val")
          .otherwise("test").as("split"))
    val naiveCrossing = pairs
      .join(naive.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "sa"), Seq("doc_a"))
      .join(naive.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "sb"), Seq("doc_b"))
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(naiveCrossing > 0L,
      "fixture has no straddling pairs — the spec can't distinguish " +
        "group-aware from naive splitting")
  }

  test("kfold: folds are total, complete, and roughly balanced") {
    val out = graft.ops.TrainingSets.kfoldAssignment(spark, sf).collect()
    assert(out.map(_.getLong(0)).sorted.toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    val corpus = Tables.documents(spark, sf).count()
    val sizes = out.map(_.getLong(1))
    assert(sizes.sum === corpus)
    // md5 is uniform: no fold should be empty or hold >2x its fair share
    assert(sizes.forall(s => s > 0 && s < 2L * corpus / 5L + 1))
  }

  test("text_clean: cleaning only shrinks, token counts are consistent") {
    val out = graft.ops.TextAnalysis.textClean(spark, sf).collect()
    assert(out.length === 5) // en de es fr zh
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))        // n_changed <= n_docs
      assert(r.getLong(4) <= r.getLong(3))        // clean len <= raw len
      assert(r.getLong(5) >= r.getLong(1))        // >= 1 token per doc
    }
  }

  test("global rank: deciles tile 1..N contiguously with no gaps") {
    val out = graft.ops.Analytics.globalRankDocs(spark, sf).collect()
    val corpus = Tables.documents(spark, sf).count()
    assert(out.map(_.getLong(1)).sum === corpus)
    assert(out.head.getLong(2) === 1L)          // first decile starts at 1
    assert(out.last.getLong(3) === corpus)      // last decile ends at N
    // rank ranges are contiguous across deciles (a permutation of 1..N)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) === a.getLong(3) + 1)
    }
    out.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) + 1 === r.getLong(1))
    }
  }

  test("hybrid search: every hit truly shares a shingle with the query, " +
       "ranked by non-increasing cosine") {
    val out = graft.ops.Similarity.hybridSearch(spark, sf).collect()
    assert(out.length === 10)
    assert(out.forall(_.getLong(1) >= 1L))   // sparse gate is real
    val cosines = out.map(_.getDouble(2))
    assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    // recompute the sparse gate independently via set intersection
    val docs = Tables.documents(spark, sf)
    val qSet = docs.filter(col("doc_id") === 7L)
      .select(graft.ops.Dedup.shingleCol(col("text")).as("qs"))
    val shared = docs
      .filter(col("doc_id").isin(out.map(_.getLong(0)): _*))
      .crossJoin(broadcast(qSet))
      .select(col("doc_id"),
        size(array_intersect(
          graft.ops.Dedup.shingleCol(col("text")), col("qs"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      assert(shared(r.getLong(0)) === r.getLong(1).toInt,
        s"overlap mismatch for doc ${r.getLong(0)}")
    }
  }

  test("pagerank: node set, handshake degree, rank floor, determinism") {
    val out = graft.ops.Dedup.dupPageRank(spark, sf)
    val rows = out.collect()
    val pairs = graft.ops.Dedup.ngramJaccardPairs(spark, sf)
      .select("doc_a", "doc_b")
    val nPairs = pairs.count()
    val nNodes = pairs.select(col("doc_a").as("n"))
      .union(pairs.select(col("doc_b"))).distinct().count()
    assert(rows.length.toLong === nNodes)
    assert(rows.map(_.getLong(1)).sum === 2 * nPairs) // handshake lemma
    // damping floor: rank >= 0.15 in micro-units for every node
    assert(rows.forall(_.getLong(2) >= 150000L))
    // exact integer arithmetic => a second run is byte-identical
    val again = graft.ops.Dedup.dupPageRank(spark, sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(2))).toSeq ===
      again.map(r => (r.getLong(0), r.getLong(2))).toSeq)
  }
}
