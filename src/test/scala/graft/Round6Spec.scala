package graft

import org.apache.spark.sql.functions._

/** Properties of the round-6 operators: the remaining TPC-H shapes
  * (Q2/Q9/Q11/Q12/Q16/Q18/Q20 adapted to the corpus — no partsupp table)
  * and the corpus-statistics / quantization / survivor-selection ops.
  */
class Round6Spec extends SparkSpec {

  val sf = "/root/testdata/sf0.01"

  test("q18: only above-threshold orders, full deterministic top-100") {
    val r = graft.ops.StarQueries.q18LargeVolume(spark, sf).collect()
    assert(r.length === 100)
    assert(r.forall(_.getDouble(5) > 250.0))
    // ordering: totalprice non-increasing
    val prices = r.map(_.getDouble(4))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q11: every surviving part clears the global-share threshold") {
    val r = graft.ops.StarQueries.q11ImportantParts(spark, sf)
    val rows = r.collect()
    assert(rows.nonEmpty)
    // recompute the threshold from the result's own definition: total over
    // ALL parts (not just survivors), so re-derive via a fraction-0 run
    val all = graft.ops.StarQueries.q11ImportantParts(spark, sf,
      fraction = -1.0).collect()
    val total = all.map(_.getDouble(1)).sum
    assert(rows.forall(_.getDouble(1) > 0.002 * total * 0.999))
    assert(rows.length < all.length, "threshold must actually filter")
  }

  test("q12: buckets partition the joined lines; counts add up") {
    val r = graft.ops.StarQueries.q12ShipLagPriority(spark, sf).collect()
    assert(r.map(_.getString(0)).toSet.subsetOf(Set("FAST", "NORMAL", "SLOW")))
    val totalLines = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01")).count()
    assert(r.map(x => x.getLong(1) + x.getLong(2)).sum === totalLines)
  }

  test("q16: excluded brand/type never appear; counts positive") {
    val r = graft.ops.StarQueries.q16SupplierCounts(spark, sf).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getString(0) != "Brand#1"))
    assert(r.forall(_.getString(1) != "PROMO"))
    assert(r.forall(_.getLong(3) > 0))
  }

  test("q2: each (part, supplier) row achieves its part's minimum cost") {
    val offers = graft.ops.StarQueries.q2MinCostSupplier(spark, sf).collect()
    assert(offers.nonEmpty && offers.length <= 100)
    // s_acctbal non-increasing (presentation order)
    val bals = offers.map(_.getDouble(0))
    assert(bals.zip(bals.tail).forall { case (a, b) => a >= b })
  }

  test("q20: survivors are suppliers of the target nation only") {
    val r = graft.ops.StarQueries.q20ExcessShippers(spark, sf)
    val names = r.collect().map(_.getString(0)).toSet
    assert(names.nonEmpty)
    val nation5 = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf),
        col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_5")
      .select("s_name").collect().map(_.getString(0)).toSet
    assert(names.subsetOf(nation5))
  }

  test("q9: profit grouped by (nation, year) with no null groups") {
    val r = graft.ops.StarQueries.q9ProductProfit(spark, sf).collect()
    assert(r.nonEmpty)
    assert(r.forall(x => !x.isNullAt(0) && !x.isNullAt(1)))
    // (nation, year) keys are unique — it's a grouped aggregate
    assert(r.map(x => (x.getString(0), x.getInt(1))).distinct.length ===
      r.length)
  }

  test("dedup_survivors agrees with dedup_clusters on membership") {
    val clusters = graft.ops.Dedup.dedupClusters(spark, sf)
      .select(col("cluster"), col("n_members")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val surv = graft.ops.Dedup.dedupSurvivors(spark, sf).collect()
    assert(surv.length === clusters.size)
    surv.foreach { r =>
      assert(clusters(r.getLong(0)) === r.getLong(1))
      // the survivor is kept, the rest dropped: kept + dropped covers >1 doc
      assert(r.getLong(1) >= 2)
      assert(r.getLong(3) > 0 && r.getLong(4) > 0)
    }
  }

  test("token_zipf: contiguous ranks, non-increasing freq, mass conserved") {
    val r = graft.ops.CorpusStats.tokenZipf(spark, sf).collect()
    assert(r.map(_.getInt(0)).toSeq === (1 to r.length))
    val freqs = r.map(_.getLong(2))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
    val totalTokens = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0).count()
    assert(freqs.sum === totalTokens)
  }

  test("text_bigram_lm: n_bigrams = tokens-1 per doc; lp2 never positive") {
    val lm = graft.ops.CorpusStats.bigramLm(spark, sf)
    val joined = lm.join(
      Tables.documents(spark, sf).select(col("doc_id"),
        (size(split(col("text"), " ")) - 1).cast("long").as("expect_bi")),
      "doc_id")
    assert(joined.filter(col("n_bigrams") =!= col("expect_bi")).count() === 0)
    // c(w1,w2) <= c(w1) always, so every whole-bit log term is <= 0
    assert(lm.filter(col("lp2_sum") > 0).count() === 0)
  }

  test("word_ngrams kernel keeps multiplicity and order") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val out = Seq("a b a b", "x", "")
      .toDF("text")
      .select(call_function("word_ngrams", col("text"), lit(2)).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) === Seq("a b", "b a", "a b")) // dup bigram kept
    assert(out(1) === Seq.empty)
    assert(out(2) === Seq.empty)
  }

  test("fuzzy_name_pairs: blocking loses nothing vs the all-pairs scan") {
    val blocked = graft.ops.Dedup.fuzzyNamePairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // ground truth: unblocked quadratic verify over the tiny dictionary
    val names = Tables.part(spark, sf).select("p_name").distinct()
      .collect().map(_.getString(0))
    val exact = (for {
      a <- names; b <- names if a < b
      if levenshteinDist(a, b) <= 2
    } yield (a, b)).toSet
    assert(blocked === exact)
    assert(blocked.nonEmpty)
  }

  /** Reference Wagner-Fischer for the spec's ground truth. */
  private def levenshteinDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("minhash_sig kernel is bit-identical to the relational md5 pipeline") {
    graft.functions.GraftFunctions.register(spark)
    val k = 12
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        call_function("word_shingles", col("text"), lit(3)).as("ss"))
      .filter(size(col("ss")) > 0)
    val kernel = docs
      .select(col("doc_id"),
        call_function("minhash_sig", col("ss"), lit(k)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // the formulation the kernel replaced (and the oracle still mirrors)
    val hashed = docs
      .select(col("doc_id"), explode(col("ss")).as("s"))
      .withColumn("hx", md5(col("s")))
      .select(col("doc_id"),
        conv(substring(col("hx"), 1, 12), 16, 10).cast("long").as("h1"),
        conv(substring(col("hx"), 13, 12), 16, 10).cast("long")
          .bitwiseOR(1L).as("h2"))
    val minCols = (0 until k).map(i =>
      min(col("h1") + lit(i.toLong) * col("h2")).as(s"m$i"))
    val relational = hashed.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong(_))).toMap
    assert(kernel.keySet === relational.keySet)
    kernel.foreach { case (d, sig) => assert(sig === relational(d), s"doc $d") }
  }

  test("dedup_source_matrix accounts every near-dup pair exactly once") {
    val totalPairs = graft.ops.Dedup.ngramJaccardPairs(spark, sf).count()
    val m = graft.ops.Dedup.dedupSourceMatrix(spark, sf).collect()
    assert(m.map(_.getLong(2)).sum === totalPairs)
    // symmetric keying: x <= y always, so no unordered pair splits in two
    assert(m.forall(r => r.getString(0) <= r.getString(1)))
  }

  test("embedding_quantize: int8 range respected, reconstruction is close") {
    val r = graft.ops.Similarity.embeddingQuantize(spark, sf).collect()
    assert(r.length === 500)
    r.foreach { row =>
      val maxAbs = row.getDouble(2)
      assert(maxAbs > 0.0)
      assert(row.getLong(3) <= 127L * 64)          // |q| <= 127 per dim
      assert(row.getDouble(4) >= 0.0)
      // quantization error is bounded by (step/2)^2 per dim
      val step = maxAbs / 127.0
      assert(row.getDouble(4) <= step * step / 4.0 + 1e-12)
    }
  }
}
