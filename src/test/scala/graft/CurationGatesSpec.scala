package graft

import org.apache.spark.sql.functions._

import graft.ops.{CorpusStats, TextAnalysis, TrainingSets}

/** Round-11 curation-gate additions: the Gopher filter funnel, the CCNet
  * perplexity bands, and temperature mixture sampling — structural
  * invariants plus a libm cross-check of the PortableLn micro-nat scores
  * (the value the hash gate rides on).
  */
class CurationGatesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("filter funnel chains exactly: each stage's n_out feeds the next, " +
       "kills sum to the corpus total, survivors match a direct gate") {
    val rows = TextAnalysis.qualityFilterFunnel(spark, sf)
      .orderBy("stage").collect()
    assert(rows.length === 6)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_in") === a.getAs[Long]("n_out"),
        s"stage ${b.getAs[Long]("stage")} n_in != prior n_out")
    }
    val total = rows.head.getAs[Long]("n_in")
    val kills = rows.map(_.getAs[Long]("n_killed")).sum
    val survivors = rows.last.getAs[Long]("n_out")
    assert(kills + survivors === total)
    // independent direct recomputation of the all-gates conjunction
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), length(col("text")).as("len"),
        split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("text"), col("len"),
        size(col("ws")).as("nt"), size(array_distinct(col("ws"))).as("nd"),
        size(array_intersect(array_distinct(col("ws")),
          array(TextAnalysis.stopwords.map(lit(_)): _*))).as("nsk"))
    graft.functions.GraftFunctions.register(spark)
    val topn = docs.filter(col("nt") >= 2)
      .select(col("doc_id"),
        explode(call_function("word_ngrams", col("text"), lit(2))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("topn"))
    val direct = docs.join(topn, Seq("doc_id"), "left_outer")
      .na.fill(0L, Seq("topn"))
      .filter(col("nt") >= TextAnalysis.FunnelMinTokens &&
        col("nt") <= TextAnalysis.FunnelMaxTokens &&
        col("len") >= col("nt") * 5 && col("len") <= col("nt") * 6 &&
        col("nsk") > 0 &&
        (col("nt") - col("nd")) * 5 <= col("nt") * 3 &&
        col("topn") * 16 <= col("nt") - 1)
      .count()
    assert(survivors === direct)
  }

  test("temperature mix flattens the language distribution: the dominant " +
       "language's share drops below natural, the rarest rises above") {
    val rows = TrainingSets.temperatureMix(spark, sf).collect()
    assert(rows.length > 1)
    val totAvail = rows.map(_.getAs[Long]("n_avail")).sum
    def naturalPpm(r: org.apache.spark.sql.Row): Long =
      r.getAs[Long]("n_avail") * 1000000L / totAvail
    val byAvail = rows.sortBy(_.getAs[Long]("n_avail"))
    val smallest = byAvail.head
    val largest = byAvail.last
    assert(largest.getAs[Long]("share_ppm") < naturalPpm(largest),
      "dominant language was not downweighted")
    assert(smallest.getAs[Long]("share_ppm") > naturalPpm(smallest),
      "rarest language was not upweighted")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_quota") <= r.getAs[Long]("n_avail"))
      assert(r.getAs[Long]("epochs_ppm") ===
        r.getAs[Long]("n_quota") * 1000000L / r.getAs[Long]("n_avail"))
      val w = r.getAs[Long]("w_isqrt")
      val n = r.getAs[Long]("n_avail")
      assert(w * w <= n && (w + 1) * (w + 1) > n, "w_isqrt is not isqrt")
    }
    assert(rows.map(_.getAs[Long]("share_ppm")).sum <= 1000000L)
  }

  test("streaming quality gate is batch-boundary-independent and equals " +
       "the batch funnel over the incoming half") {
    import graft.streaming.StreamAssembly
    val one = StreamAssembly.streamQualityGate(spark, sf, nFiles = 1)
      .collect().map(_.toSeq)
    val three = StreamAssembly.streamQualityGate(spark, sf, nFiles = 3)
      .collect().map(_.toSeq)
    assert(one.toSeq === three.toSeq)
    val batch = TextAnalysis.funnelPresent(TextAnalysis.funnelAggregate(
        TextAnalysis.funnelFirstFail(spark, Tables.documents(spark, sf)
          .filter(col("doc_id") % 2 === 1))))
      .collect().map(_.toSeq)
    assert(one.toSeq === batch.toSeq)
  }

  test("embedding dim stats: every dimension row is total, int8-bounded, " +
       "and variance-consistent") {
    val n = Tables.embeddings(spark, sf).count()
    val dims = graft.ops.Similarity.embeddingDimStats(spark, sf).collect()
    assert(dims.length === 64)
    dims.foreach { r =>
      assert(r.getAs[Long]("n_vecs") === n)
      assert(r.getAs[Long]("min_q") >= -127L &&
        r.getAs[Long]("max_q") <= 127L)
      assert(r.getAs[Long]("var_num") >= 0L)
      assert(r.getAs[Long]("var_num") ===
        r.getAs[Long]("n_vecs") * r.getAs[Long]("sum_q2") -
          r.getAs[Long]("sum_q") * r.getAs[Long]("sum_q"))
      assert(r.getAs[Long]("sum_q2") >= r.getAs[Long]("sum_q").abs)
    }
  }

  test("perplexity bands conserve the bigram stream and agree with a " +
       "Math.log replay to within the floor quantum") {
    val bands = CorpusStats.lmPerplexityBands(spark, sf).collect()
    val corpusBigrams = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).as("nt"))
      .filter(col("nt") >= 2)
      .agg(sum(col("nt") - 1)).head.getLong(0)
    assert(bands.map(_.getAs[Long]("sum_bigrams")).sum === corpusBigrams)
    // libm replay: rebuild the smoothed model from the raw docs with
    // Math.log; per-model-bigram micro-nat terms must agree with the
    // PortableLn pipeline to <= 1 after the floor (series truncation
    // < 1e-8 nats), so the banded sums can differ by at most the bigram
    // count — assert the tighter per-band bound.
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val bigrams = docs.flatMap { case (id, src, text) =>
      val ws = text.split(" ")
      ws.sliding(2).filter(_.length == 2)
        .map(p => (id, src, p(0) + " " + p(1))).toSeq
    }
    val c12 = bigrams.groupBy(_._3).map { case (bg, xs) =>
      (bg, xs.length.toLong)
    }
    val c1 = c12.groupBy(_._1.split(" ")(0))
      .map { case (w1, xs) => (w1, xs.map(_._2).sum) }
    val v = docs.flatMap(_._3.split(" ")).distinct.length.toLong
    val termRef = c12.map { case (bg, c) =>
      val nll = -math.log((c + 1).toDouble /
        (c1(bg.split(" ")(0)) + v).toDouble)
      (bg, math.floor(nll * 1e6).toLong)
    }
    val scoreRef = bigrams.groupBy(x => (x._1, x._2)).map { case ((_, src), xs) =>
      val s = xs.map(x => termRef(x._3)).sum
      val n = xs.length.toLong
      (src, s / n, n, s)
    }
    val byBand = scoreRef.groupBy { case (src, avg, _, _) =>
      val band =
        if (avg < CorpusStats.LmPpxHeadMicro) "head"
        else if (avg < CorpusStats.LmPpxMiddleMicro) "middle"
        else "tail"
      (src, band)
    }
    bands.foreach { r =>
      val key = (r.getAs[String]("source"), r.getAs[String]("band"))
      val ref = byBand.get(key)
      assert(ref.isDefined, s"band row $key missing from replay")
      val refDocs = ref.get.size.toLong
      val refSum = ref.get.map(_._4).sum
      assert(r.getAs[Long]("n_docs") === refDocs, s"$key n_docs")
      // PortableLn vs Math.log: <= 1 micro-nat per bigram after floor
      assert(math.abs(r.getAs[Long]("sum_nll_micro") - refSum) <=
        r.getAs[Long]("sum_bigrams"), s"$key sum_nll_micro drift")
    }
  }
}
