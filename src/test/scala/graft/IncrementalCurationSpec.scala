package graft

import org.apache.spark.sql.functions._

/** Properties of the round-6 additions: chunking, graded contamination,
  * incremental dedup, semantic leakage, the array/collect batteries, and
  * the stream-stream join's stream≡batch equivalence.
  */
class IncrementalCurationSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.01"

  test("doc_chunks: per-lang totals match a row-level recompute") {
    val r = graft.ops.TrainingSets.docChunks(spark, sf)
      .collect().map(x => (x.getString(0), (x.getLong(1), x.getLong(2))))
      .toMap
    // brute-force from the raw table: starts 0, 96, 192, … while < est
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), ceil(col("n_chars") / 4.0).cast("long").as("est"))
      .collect().map(x => (x.getString(0), math.max(x.getLong(1), 1L)))
    val expect = docs.groupBy(_._1).map { case (lang, rows) =>
      val chunks = rows.flatMap { case (_, est) =>
        (0L until est by 96L).map(s => math.min(128L, est - s))
      }
      lang -> ((chunks.length.toLong, chunks.sum))
    }
    assert(r === expect)
  }

  test("contamination_fraction: deciles bounded, totals = eligible test docs") {
    val rows = graft.ops.TrainingSets.contaminationFraction(spark, sf).collect()
    assert(rows.forall(x => x.getLong(1) >= 0 && x.getLong(1) <= 9))
    // every test doc with >= 8 words appears in exactly one decile
    graft.functions.GraftFunctions.register(spark)
    val eligible = Tables.documents(spark, sf)
      .filter(pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8),
        16, 10).cast("long"), lit(100)) >= 90)
      .filter(size(split(col("text"), " ")) >= 8)
      .count()
    assert(rows.map(_.getLong(2)).sum === eligible)
  }

  test("dedup_incremental: exact-dup count matches a text-equality probe") {
    val r = graft.ops.Dedup.dedupIncremental(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    val k = (docs.map(_._1).max * 4) / 5
    val hist = docs.filter(_._1 < k).map(_._2).toSet
    val expectExact = docs.filter(_._1 >= k).count(d => hist(d._2))
    assert(r.map(_.getLong(2)).sum === expectExact)
    // near-dups counted per doc at most once, never exceeding the batch
    assert(r.forall(x => x.getLong(3) <= x.getLong(1)))
  }

  test("embedding_contamination: totals partition the held-out set; " +
    "tightening the threshold can only shrink leakage") {
    val loose = graft.ops.Similarity
      .embeddingContamination(spark, sf, threshold = 0.4).collect()
    val tight = graft.ops.Similarity
      .embeddingContamination(spark, sf, threshold = 0.9).collect()
    val nTest = Tables.embeddings(spark, sf)
      .filter(pmod(conv(substring(md5(col("vec_id").cast("string")), 1, 8),
        16, 10).cast("long"), lit(100)) >= 80)
      .count()
    assert(loose.map(_.getLong(1)).sum === nTest)
    assert(loose.forall(x => x.getLong(2) <= x.getLong(1)))
    val looseLeaks = loose.map(x => x.getInt(0) -> x.getLong(2)).toMap
    assert(tight.forall(x => x.getLong(2) <= looseLeaks(x.getInt(0))))
  }

  test("array_funcs: row-level internal consistency") {
    val rows = graft.ops.TextAnalysis.arrayFuncs(spark, sf).collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    rows.foreach { x =>
      val (nTok, nDis) = (x.getInt(1), x.getInt(2))
      assert(nDis >= 1 && nDis <= nTok)
      assert(x.getLong(5) >= 0 && x.getLong(5) <= nTok) // pos_the
      assert(x.getInt(6) == 0 || x.getInt(6) == 1)      // has_data
      // non-stop kinds + stop kinds partition the distinct tokens exactly
      assert(x.getInt(8) + x.getInt(9) === nDis)
    }
  }

  test("collect_sources: csv fields agree with the counts") {
    val rows = graft.ops.TextAnalysis.collectSources(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { x =>
      val srcs = x.getString(2).split(",")
      assert(srcs.length === x.getLong(1))
      assert(srcs.sorted.sameElements(srcs), "sources_csv must be sorted")
      val firsts = x.getString(3).split(",").map(_.toLong)
      assert(firsts.length <= 3 && firsts.sorted.sameElements(firsts))
    }
  }

  test("robust_stats: mode is the true argmax; median is an order statistic") {
    val r = graft.ops.Analytics.robustStats(spark, sf).collect()
    val byType = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)))
    r.foreach { x =>
      val vals = byType(x.getString(0))
      assert(x.getLong(1) === vals.length)
      val buckets = vals.groupBy(v => math.floor(v / 10.0).toLong)
        .view.mapValues(_.length)
      val best = buckets.toSeq.maxBy { case (b, c) => (c, -b) }
      assert((x.getLong(2), x.getLong(3)) === ((best._1, best._2.toLong)))
      val sorted = vals.sorted
      assert(x.getDouble(4) === sorted(((vals.length + 1) / 2) - 1))
    }
  }

  test("tfidf_terms: top-k per lang, scores recompute") {
    val r = graft.ops.CorpusStats.tfidfTerms(spark, sf).collect()
    val nTotal = Tables.documents(spark, sf).count()
    assert(r.groupBy(_.getString(0)).values.forall(_.length == 5))
    r.foreach { x =>
      val (tf, df, score) = (x.getLong(3), x.getLong(4), x.getLong(5))
      assert(score === tf * ((1000 * nTotal) / df))
    }
    // rank order: scores non-increasing within a lang
    r.groupBy(_.getString(0)).values.foreach { rows =>
      val byRk = rows.sortBy(_.getLong(1)).map(_.getLong(5))
      assert(byRk.zip(byRk.tail).forall { case (a, b) => a >= b })
    }
  }

  test("window_range_frame: every event counts itself; frame recomputes") {
    val sfSmall = "/root/testdata/sf0.001"
    val r = graft.ops.Analytics.windowRangeFrame(spark, sfSmall).collect()
    assert(r.forall(_.getLong(2) >= 1))
    // brute-force one frame: trailing-hour count per event of one user
    val ev = Tables.events(spark, sfSmall)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val u = ev.head._1
    val mine = ev.filter(_._1 == u)
    val expect = mine.map { case (_, id, t) =>
      id -> mine.count(e => e._3 >= t - 3600000000L && e._3 <= t).toLong
    }.toMap
    r.filter(x => expect.contains(x.getLong(0)))
      .foreach(x => assert(x.getLong(2) === expect(x.getLong(0))))
  }

  test("equidepth_histogram: buckets partition each type, sizes within 1") {
    val r = graft.ops.Analytics.equidepthHistogram(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    assert(r.map(_.getLong(2)).sum === total)
    r.groupBy(_.getString(0)).values.foreach { rows =>
      assert(rows.map(_.getLong(1)).sorted.sameElements(Array(0L, 1L, 2L, 3L)))
      val sizes = rows.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1)
      // bucket value ranges must not overlap (vmax_b <= vmin_{b+1})
      val byB = rows.sortBy(_.getLong(1))
      byB.zip(byB.tail).foreach { case (lo, hi) =>
        assert(lo.getDouble(4) <= hi.getDouble(3))
      }
    }
  }

  test("token_cooccurrence: oriented pairs, doc-count bounded, full rank") {
    val r = graft.ops.CorpusStats.tokenCooccurrence(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(r.length === 20)
    assert(r.map(_.getLong(0)).sameElements(1L to 20L))
    r.foreach { x =>
      assert(x.getString(1) < x.getString(2))
      assert(x.getLong(3) >= 1 && x.getLong(3) <= nDocs)
    }
  }

  test("degree histogram mass equals twice the edge count") {
    val hist = graft.ops.Dedup.dupDegreeHistogram(spark, sf).collect()
    val nEdges = graft.ops.Dedup.ngramJaccardPairs(spark, sf).count()
    assert(hist.map(x => x.getLong(0) * x.getLong(1)).sum === 2 * nEdges)
  }

  test("stream-stream join ≡ batch join (exact, unwatermarked)") {
    val sfSmall = "/root/testdata/sf0.001"
    val streamed = graft.streaming.StreamAssembly
      .streamJoinFollowups(spark, sfSmall).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val e = Tables.events(spark, sfSmall)
      .filter(col("event_type") === "purchase")
    val a = e.select(col("user_id").as("ua"), col("ts").as("ta"),
      col("event_type").as("type_a"))
    val b = e.select(col("user_id").as("ub"), col("ts").as("tb"),
      col("event_type").as("type_b"))
    val batch = a.join(b, col("ua") === col("ub") &&
        col("tb") > col("ta") &&
        col("tb") <= col("ta") + expr("INTERVAL 30 MINUTES"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_pairs"), countDistinct("ua").as("n_users"))
      .collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(streamed.sameElements(batch))
  }
}
