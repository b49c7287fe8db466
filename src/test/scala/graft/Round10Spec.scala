package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableLn
import graft.ops.{CorpusStats, Dedup, Similarity, TrainingSets}

/** Round-10 additions: the portable (cross-engine bit-identical) ln,
  * exact-substring span dedup, the full BPE merge loop, the streaming
  * dedup probe, and the semantic-gate curation composition.
  */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("PortableLn matches Math.log within 1e-7 across 20 binades") {
    val xs = Seq(1e-6, 3.7e-4, 0.01, 0.4999, 0.5, 0.9999, 1.0, 1.0001,
      1.5, 2.0, 2.7182818, 10.0, 1234.5678, 65536.0, 9.87e8)
    val df = xs.toDF("x")
    val out = PortableLn.withLn(df, "x", "lnx")
      .select("x", "lnx").collect()
    out.foreach { r =>
      val x = r.getDouble(0); val got = r.getDouble(1)
      assert(math.abs(got - math.log(x)) < 1e-7, s"ln($x): $got")
    }
  }

  test("PortableLn is exact at 1.0 and at powers of two") {
    val df = Seq(1.0, 2.0, 4.0, 0.5, 0.25, 1024.0).toDF("x")
    val out = PortableLn.withLn(df, "x", "lnx").select("x", "lnx").collect()
    val ln2 = 0.6931471805599453
    out.foreach { r =>
      val x = r.getDouble(0); val got = r.getDouble(1)
      val e = (math.log(x) / ln2).round
      // ladder reduces powers of two to m=1 exactly → result is e·ln2 ± 0
      assert(got === e * ln2, s"ln($x)")
    }
  }

  test("PortableLn SQL CTE chain computes the identical bits in DuckDB " +
       "shape (replayed through spark.sql)") {
    // replay the generated DuckDB CTE text through Spark's SQL engine on
    // a value table: if the SQL form and the Column form are the same
    // pipeline, their doubles are bit-identical
    val (ctes, outCte) = PortableLn.sqlCtes("pl", "vals", Seq("v"),
      "CAST(v AS DOUBLE)", "lnx")
    Seq(0.037, 1.0, 17.25, 123456.789).toDF("v")
      .createOrReplaceTempView("vals")
    val viaSql = spark.sql(s"WITH $ctes SELECT v, lnx FROM $outCte")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val viaCol = PortableLn
      .withLn(Seq(0.037, 1.0, 17.25, 123456.789).toDF("x"), "x", "lnx")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    viaSql.foreach { case (x, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ===
        java.lang.Double.doubleToLongBits(viaCol(x)), s"x=$x")
    }
  }

  test("exact-substring spans: duplicated mass bounded and consistent") {
    val r = Dedup.exactSubstringSpans(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getAs[Long]("n_docs")
      val nWith = row.getAs[Long]("n_docs_with_dup")
      val dup = row.getAs[Long]("dup_tokens")
      val tot = row.getAs[Long]("total_tokens")
      assert(nWith <= n)
      assert(dup <= tot)
      assert((dup > 0) === (nWith > 0))
    }
    // the synthetic corpus shares boilerplate across docs — some span
    // mass must be detected or the operator is inert
    assert(r.map(_.getAs[Long]("dup_tokens")).sum > 0)
  }

  test("span histogram: every run ≥ k, totals reconcile with span coverage") {
    val hist = Dedup.duplicatedSpanHistogram(spark, sf).collect()
    assert(hist.nonEmpty)
    // every duplicated position sits in a full k-window of duplicated
    // positions, so no maximal run can be shorter than SpanK
    assert(hist.forall(_.getAs[Long]("run_len") >= Dedup.SpanK))
    val runMass = hist.map(r =>
      r.getAs[Long]("run_len") * r.getAs[Long]("n_runs")).sum
    val dupTokens = Dedup.exactSubstringSpans(spark, sf)
      .agg(sum("dup_tokens")).first().getLong(0)
    assert(runMass === dupTokens) // islands partition the covered set
    val docsWithDup = Dedup.exactSubstringSpans(spark, sf)
      .agg(sum("n_docs_with_dup")).first().getLong(0)
    assert(hist.map(_.getAs[Long]("n_docs_longest")).sum === docsWithDup)
  }

  test("BPE merge loop: ranks dense, counts non-increasing, merged " +
       "symbols concatenate") {
    val merges = CorpusStats.bpeTrainMerges(spark, sf, rounds = 8).collect()
    assert(merges.length === 8)
    assert(merges.map(_.getAs[Long]("rank")).toSeq === (1L to 8L))
    val ns = merges.map(_.getAs[Long]("n")).toSeq
    // greedy argmax: a merge only destroys or shortens existing pairs,
    // and pairs it creates inherit ≤ its own count → max is non-increasing
    assert(ns === ns.sorted.reverse, s"counts not non-increasing: $ns")
    merges.foreach { m =>
      val pair = m.getAs[String]("pair").split(" ")
      assert(pair.length === 2 && pair.forall(_.nonEmpty))
    }
  }

  test("BPE tokenize stats: merging conserves chars and only shrinks tokens") {
    val stats = CorpusStats.bpeTokenizeStats(spark, sf, rounds = 8).collect()
    assert(stats.nonEmpty)
    val charMass = stats.map(_.getAs[Long]("char_mass")).sum
    val tokenMass = stats.map(_.getAs[Long]("token_mass")).sum
    // chars per occurrence are invariant under merging; with zero merges
    // token mass would equal char mass, so 8 merges must strictly shrink
    assert(tokenMass < charMass)
    // cross-check char mass against the raw corpus (sum of word lengths)
    val raw = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .agg(sum(length(col("w")))).first().getLong(0)
    assert(charMass === raw)
    stats.foreach(r => assert(r.getAs[Long]("tokens_per_word") >= 1L))
  }

  test("streaming dedup probe equals the batch band join") {
    def half(parity: Int) = Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === parity)
      .select(col("doc_id"), Dedup.shingleCol(col("text")).as("ss"))
      .withColumn("n", size(col("ss")))
    graft.functions.GraftFunctions.register(spark)
    val idx = Dedup.bandedSignatures(half(0), 12, 2)
      .select(col("doc_id").as("index_doc"), col("band"), col("bsig"))
    val expected = Dedup.bandedSignatures(half(1), 12, 2)
      .join(idx, Seq("band", "bsig"))
      .groupBy("doc_id")
      .agg(countDistinct(col("index_doc")).as("n_index_matches"),
        min(col("index_doc")).as("first_match"))
      .orderBy("doc_id").collect()
    val drained = graft.streaming.StreamAssembly
      .streamDedupProbe(spark, sf).collect()
    assert(drained.map(_.toSeq).toSeq === expected.map(_.toSeq).toSeq)
  }

  test("streaming ANN probe: one exact-cosine match per incoming vector, " +
       "cells honored") {
    val out = graft.streaming.StreamAssembly.streamAnnProbe(spark, sf)
      .collect()
    val nOdd = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 2 === 1).count()
    assert(out.length === nOdd) // every incoming vector matched exactly once
    out.foreach { r =>
      assert(r.getAs[Long]("vec_id") % 2 === 1)
      assert(r.getAs[Long]("match_id") % 2 === 0)
      val c = r.getAs[Double]("cosine")
      assert(c >= -1.0000001 && c <= 1.0000001)
    }
  }

  test("ANN probe recall audit: partitions reconcile, near-miss ⊇ exact") {
    val r = Similarity.annProbeRecall(spark, sf).collect().head
    val n = r.getAs[Long]("n_queries")
    assert(n > 0)
    assert(r.getAs[Long]("n_top1_match") + r.getAs[Long]("n_missed") === n)
    assert(r.getAs[Long]("n_within_1pt") >= r.getAs[Long]("n_top1_match"))
  }

  test("semantic curation gate only ever shrinks the kept set") {
    val base = TrainingSets.curationPipeline(spark, sf)
      .agg(sum("n_docs")).first().getLong(0)
    val sem = TrainingSets.curationPipelineSemantic(spark, sf)
      .agg(sum("n_docs")).first().getLong(0)
    assert(sem <= base)
    val semDrops = Similarity
      .semDedupDropped(Similarity.semDedupVectors(spark, sf)).count()
    // the two must differ by AT MOST the semantic drop count (drops can
    // overlap the near-dup prune or hit already-filtered docs)
    assert(base - sem <= semDrops)
  }
}
