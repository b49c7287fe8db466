package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{KnnGraph, Similarity, TrainingSets}

/** Round-17 closures:
  *
  *  - the Bloom position draw widens past 32 bits exactly when the
  *    configured filter exceeds 2^32 bits (the r16 advice finding: a
  *    32-bit draw can never set a bit ≥ 2^32, silently capping a
  *    production-sized filter), and the wide draw fuses to the same
  *    [[graft.functions.Md5Bucket]] kernel;
  *  - `md5_bucket` accepts an integer modulus via implicit cast (the
  *    direct-call form previously failed analysis on `lit(100)`);
  *  - hierarchical entries composed into the lifecycle serving paths
  *    and the post-fold hier serve (tests added alongside those
  *    queries).
  */
class Round17Spec extends SparkSpec {
  import spark.implicits._

  test("bloomPosHexChars widens to 14 hex chars exactly past 2^32 bits") {
    assert(TrainingSets.bloomPosHexChars(1L << 20) === 8)
    assert(TrainingSets.bloomPosHexChars((1L << 32) - 1) === 8)
    assert(TrainingSets.bloomPosHexChars(1L << 32) === 8)
    assert(TrainingSets.bloomPosHexChars((1L << 32) + 1) === 14)
    // the production shape the knob doc advertises: m ≈ 10·n at corpus
    // scale — far beyond Int range, must use the wide draw
    assert(TrainingSets.bloomPosHexChars(10L * (1L << 33)) === 14)
    assert(TrainingSets.bloomPosHexChars(1L << 55) === 14)
    assert(TrainingSets.bloomPosHexChars(1L << 56) === 14)
    // past the wide draw's own ceiling the knob is REJECTED — the same
    // silent-cap class one level up must not re-open at 2^56
    intercept[IllegalArgumentException] {
      TrainingSets.bloomPosHexChars((1L << 56) + 1)
    }
    // and the kernel rejects odd or over-long widths instead of
    // silently truncating to whole bytes
    intercept[IllegalArgumentException] {
      graft.functions.TextOps.md5Bucket(
        org.apache.spark.unsafe.types.UTF8String.fromString("x"), 7L, 9)
    }
    intercept[IllegalArgumentException] {
      graft.functions.TextOps.md5Bucket(
        org.apache.spark.unsafe.types.UTF8String.fromString("x"), 7L, 16)
    }
  }

  test("the 14-hex-char md5 draw: kernel equals the composed form, " +
       "values above 2^32 are actually drawn, and the rewrite fuses it") {
    graft.functions.GraftFunctions.register(spark)
    val m = (1L << 52) + 7L
    val composed = (c: org.apache.spark.sql.Column) =>
      pmod(conv(substring(md5(c), 1, 14), 16, 10).cast("long"), lit(m))
    val rows = Seq("", "a", "0#x y z", "doc 7", "héllo wörld", "日本語",
      "a" * 500, "2#the quick brown fox jumps over the dog")
    // independent driver-side reference: first 14 hex chars (= 7 bytes)
    // of the digest, parsed base-16, mod m
    def ref(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(7).map(b => f"$b%02x").mkString, 16) % m
    }
    // the kernel itself
    rows.foreach { s =>
      assert(graft.functions.TextOps.md5Bucket(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), m, 14)
        === ref(s), s"kernel mismatch on '$s'")
    }
    // the composed SQL form end-to-end (fused or not, values must hold)
    val got = rows.toDF("s").select(col("s"), composed(col("s")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(s => assert(got(s) === ref(s), s"composed mismatch on '$s'"))
    // positions beyond the 32-bit horizon are reachable (the entire
    // point of the wide draw): over a modest sample some draw > 2^32
    val wide = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(composed(col("doc_id").cast("string")).as("k"))
    assert(wide.filter(col("k") > (1L << 32)).count() > 0)
    // the composed 14-char form fuses to the kernel on parquet-backed
    // plans, like the 8-char engine-wide coin
    val opt = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(composed(col("doc_id").cast("string")).as("b"))
      .queryExecution.optimizedPlan.toString
    assert(opt.contains("md5_bucket"), s"14-char fuse did not fire:\n$opt")
    // an unsupported width (not a whole-byte draw the kernel models)
    // stays composed
    val odd = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 9),
        16, 10).cast("long"), lit(m)).as("b"))
    assert(!odd.queryExecution.optimizedPlan.toString.contains("md5_bucket"))
  }

  // ------------------------------------------------------------------
  // post-fold hier serving: the REFRESHED upper layer routes probes to
  // folded-in inserts (the Round16Spec planted geometry, one stage on)
  // ------------------------------------------------------------------

  private def plantedEmb(c: Int, i: Int): Seq[Float] =
    Seq.tabulate(64) { d =>
      val (bc, off) = if (c < 15) (c, 0f) else ((c - 15) * 3 + 1, 1.5f)
      val center = ((bc * 31 + d * 17) % 13 - 6).toFloat + off
      val noise = (((i * 13 + d * 7) % 5) - 2) * 0.01f +
        (((i * 29 + d * 3) % 7) - 3) * 0.004f +
        (((i * 37 + d * 11) % 11) - 5) * 0.0015f
      center + noise
    }

  private def frame(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding"),
        Similarity.dot(col("embedding"), col("embedding")).as("sq"))
  }

  test("after the fold, probes whose true NN is an INSERTED vector are " +
       "found through the REFRESHED hierarchical entries: fold + upper " +
       "rebuild over live merged + hier descent, end to end") {
    graft.functions.GraftFunctions.register(spark)
    val base = frame((0 until 2048).map { i =>
      (i.toLong, plantedEmb(i % 15, i))
    }).localCheckpoint(true)
    val inserted = frame((0 until 4 * KnnGraph.K).map { j =>
      (10000L + j, plantedEmb(15 + j / KnnGraph.K, j))
    }).localCheckpoint(true)
    val probes = frame((0 until 32).map { i =>
      (20000L + i, plantedEmb(15 + i / 8, i + 100))
    }).select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("sq").as("q_sq"))
      .localCheckpoint(true)

    // the lifecycle up to the fold: base graph, insert descents
    // (segment twin), accreted edge set, ONE warm round over merged
    val serve = KnnGraph.servingEdgesOf(base, KnnGraph.graphOf(base, 3))
    val seg = KnnGraph.greedySearch(
        inserted.select(col("vec_id").as("q_id"),
          col("embedding").as("q_emb"), col("sq").as("q_sq")),
        base, serve)
      .filter(col("rn") <= KnnGraph.InsertFanout)
      .select(col("q_id").as("vec_id"), col("v").as("nbr"),
        floor(col("dist") * lit(1e6)).cast("long").as("dist_u"))
      .localCheckpoint(true)
    val merged = base.unionByName(inserted).localCheckpoint(true)
    val folded = KnnGraph.warmRebuildOf(merged,
      KnnGraph.accretedEdges(serve, seg), 1)
      .localCheckpoint(true)
    // the serving set keeps the folded edges BIDIRECTIONAL — without
    // the reverse direction, the freshly-attached novel clusters are
    // entered only by chance long links (out-edges-only contrast below)
    val serve2 = KnnGraph.servingEdgesSymOf(merged, folded)

    // the REFRESHED upper layer: built over the live MERGED population
    // (the r16 staleness item — a frozen even-base upper layer never
    // sees inserts)
    val upperLive = KnnGraph.upperOf(merged).localCheckpoint(true)
    val upperG = KnnGraph.servingEdgesOf(upperLive,
      KnnGraph.graphOf(upperLive, 3))
    val entries = KnnGraph.hierEntriesFrom(probes, upperLive, upperG)

    val got = KnnGraph.greedySearchFrom(probes, merged, serve2, entries)
      .filter(col("rn") === 1)
      .select(col("q_id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === 32)
    val routed = got.count(_._2 >= 10000L)
    assert(routed >= 29, s"only $routed/32 probes routed to inserts")
    // and they are the EXACT nearest neighbors, not just any insert
    val bf = probes.crossJoin(merged.select(col("vec_id").as("m_id"),
        col("embedding").as("m_emb"), col("sq").as("m_sq")))
      .withColumn("dist", col("q_sq") + col("m_sq") -
        lit(2.0) * Similarity.dot(col("q_emb"), col("m_emb")))
      .groupBy("q_id")
      .agg(min(struct(col("dist"), col("m_id"))).as("best"))
      .select(col("q_id"), col("best.m_id").as("bf_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val exact = got.count { case (q, v) => bf(q) == v }
    assert(exact >= 29, s"only $exact/32 probes found the exact NN")

    // the contrast that makes the bidirectional serving set
    // load-bearing: out-edges-only folded serving strands part of the
    // freshly-attached region (no base vertex elects an insert among
    // its k best, so incoming edges exist only as reverses)
    val outOnly = KnnGraph.servingEdgesOf(merged, folded)
    val gotOut = KnnGraph.greedySearchFrom(probes, merged, outOnly, entries)
      .filter(col("rn") === 1)
      .select(col("q_id"), col("v"))
      .collect().map(r => r.getLong(1))
    val routedOut = gotOut.count(_ >= 10000L)
    info(s"routed: sym $routed/32 vs out-only $routedOut/32")
    assert(routedOut < routed,
      s"out-only served $routedOut, sym served $routed — contrast gone")
  }

  test("the gated post-fold hier serve: no tombstoned vector ever " +
       "answers (the fold retired the delete letter physically) and " +
       "inserted vectors do") {
    val served = KnnGraph.graphServeFoldedHier(spark, "/root/testdata/sf0.001")
      .localCheckpoint(true)
    assert(served.count() > 0)
    assert(served.filter(col("match_id") % 8 === 6).count() === 0)
    assert(served.filter(col("match_id") % 4 === 1).count() > 0)
  }

  test("the fold-decision loop takes BOTH branches: a tolerance below " +
       "the fixture's evicted count folds (rows = the post-fold hier " +
       "serve on the canary stratum), an astronomically high one " +
       "serves on (rows = the masked accreted read)") {
    val sf = "/root/testdata/sf0.001"
    val folded = KnnGraph.graphFoldDecisionAt(spark, sf, 1L)
      .localCheckpoint(true)
    val servedOn = KnnGraph.graphFoldDecisionAt(spark, sf, Long.MaxValue)
      .localCheckpoint(true)
    assert(folded.count() > 0 && servedOn.count() > 0)
    assert(folded.filter(col("fold_due") =!= 1L).count() === 0)
    assert(servedOn.filter(col("fold_due") =!= 0L).count() === 0)
    // the fold branch IS the post-fold hier serve, restricted to the
    // canary stratum
    val expectFold = KnnGraph.graphServeFoldedHier(spark, sf)
      .filter(graft.ops.TrainingSets.bucket100(col("vec_id")) < 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val gotFold = folded
      .select(col("vec_id"), col("match_id"), col("dist_u"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotFold === expectFold)
    // the serve-on branch never answers with a tombstoned vector and
    // answers DIFFERENTLY from the fold branch somewhere (the decision
    // has consequences)
    assert(servedOn.filter(col("match_id") % 8 === 6).count() === 0)
    assert(gotFold !== servedOn
      .select(col("vec_id"), col("match_id"), col("dist_u"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("md5_bucket coerces an integer modulus (implicit cast) and " +
       "matches the long-literal spelling") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq("a", "doc 7", "日本語").toDF("s")
    val viaInt = df.select(expr("md5_bucket(s, 100)").as("k")).collect()
    val viaLong = df.select(
      call_function("md5_bucket", col("s"), lit(100L)).as("k")).collect()
    assert(viaInt.map(_.getLong(0)).toSeq ===
      viaLong.map(_.getLong(0)).toSeq)
  }
}
