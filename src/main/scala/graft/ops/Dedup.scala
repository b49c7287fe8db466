package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators over the `documents` corpus — the training-data
  * pipeline surface (builder brief; SURVEY.md §7.2 step 7). The reference's
  * natural dedup use case is its non-unique order_id
  * (`producers/sales_producer.py:89-93`, SURVEY.md §1.4); these operators
  * generalize that to content-level exact and near-duplicate detection.
  *
  * Every operator here is deterministic and engine-portable by construction:
  * hashes are md5 (identical bytes in Spark and DuckDB), similarity scores
  * are quotients of exact integer set sizes, and candidate generation uses
  * banding schemes whose output is a pure function of the input — so each
  * query carries a full SQL oracle.
  *
  * Scale posture (100 TB): nothing here is O(n²) on the full corpus.
  *   - exact: hash-groupBy, one shuffle on the digest.
  *   - MinHash: per-doc signatures (narrow), then a shuffle keyed on
  *     (band, signature) — candidates only where a band collides.
  *   - SimHash: 64→32-bit fingerprint, pigeonhole banding on 4 byte-chunks;
  *     only chunk-equal pairs are compared.
  *   - n-gram Jaccard: pairs restricted to docs sharing a shingle
  *     (inverted-index join), with a frequency cap to drop stop-shingles.
  */
object Dedup {

  /** Word n-gram shingle set (distinct), 0-based. Empty for docs shorter
    * than n words (sequence() would run backwards on negative bounds).
    */
  def shingleCol(textCol: Column, n: Int = 3): Column = {
    val ws = split(textCol, " ")
    when(size(ws) >= n,
      array_distinct(transform(
        sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, (i + k + 1).cast("int"))): _*))))
      .otherwise(array().cast("array<string>"))
  }

  private def shingleRows(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(shingleCol(col("text"))).as("s"))

  /** Exact dedup: content-hash groupBy keeping the smallest doc_id — the
    * classic keep-first exact dedup, one shuffle on the digest.
    */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("content_hash")

  /** n-gram Jaccard near-dup pairs via inverted-index join, with
    * stop-shingle removal: candidate pairs come only from shingles whose
    * document frequency is ≤ maxDf (a shingle appearing in hundreds of docs
    * is non-discriminative and quadratically explodes the join — the
    * classic df cap that keeps this plan linear-ish at 100 TB). Candidates
    * are then verified with exact Jaccard over the FULL shingle sets, so
    * scores are unaffected by the cap; only pairs whose overlap consists
    * exclusively of stop-shingles can be missed (documented recall
    * property, mirrored exactly by the oracle).
    */
  def ngramJaccardPairs(spark: SparkSession, sfDir: String, threshold: Double = 0.8,
                        maxDf: Int = 100): DataFrame = {
    val sh = shingleRows(spark, sfDir)
    val rare = sh.join(
      sh.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") <= maxDf),
      "s")
    val candidates = rare.as("a")
      .join(rare.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shared = candidates
      .join(sh.as("sa2"), col("doc_a") === col("sa2.doc_id"))
      .join(sh.as("sb2"),
        col("doc_b") === col("sb2.doc_id") && col("sa2.s") === col("sb2.s"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("shared").cast("double") /
          (col("sa.n") + col("sb.n") - col("shared"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash+LSH near-dup pairs: shingle → k=12 min-wise hashes → 6 bands ×
    * 2 rows → band-signature bucket join → exact-Jaccard verification of
    * candidates only.
    *
    * The min-wise hash family is `min(md5(i || ':' || shingle))` under
    * lexicographic order — md5 strings are uniformly distributed, so the
    * lexicographic min is a valid permutation-min, and it is bit-identical
    * in any engine with md5 (the oracle mirrors it exactly). Candidate
    * recall at j=0.8 with r=2,b=6 is 1-(1-0.64)^6 ≈ 0.998; output is the
    * deterministic candidates∩(j≥threshold), not the idealized all-pairs
    * result — recall is a documented property of the banding scheme.
    */
  def minhashPairs(spark: SparkSession, sfDir: String, threshold: Double = 0.8,
                   k: Int = 12, rowsPerBand: Int = 2): DataFrame = {
    val sh = shingleRows(spark, sfDir)
    // (doc_id, i, h): k hash draws per shingle
    val hashes = sh.select(
      col("doc_id"),
      explode(sequence(lit(0), lit(k - 1))).as("i"),
      col("s"))
      .select(col("doc_id"), col("i"),
        md5(concat(col("i").cast("string"), lit(":"), col("s"))).as("h"))
    val sig = hashes.groupBy("doc_id", "i").agg(min("h").as("minh"))
    val bandSig = sig
      .withColumn("band", (col("i") / rowsPerBand).cast("int"))
      .groupBy("doc_id", "band")
      .agg(md5(array_join(
        transform(array_sort(collect_list(struct(col("i"), col("minh")))),
          x => x.getField("minh")),
        "|")).as("bsig"))
    val candidates = bandSig.as("a")
      .join(bandSig.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // verify candidates with exact Jaccard (shingle-set intersection)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shared = candidates
      .join(sh.as("sa2"), col("doc_a") === col("sa2.doc_id"))
      .join(sh.as("sb2"),
        col("doc_b") === col("sb2.doc_id") && col("sa2.s") === col("sb2.s"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.as("za"), col("doc_a") === col("za.doc_id"))
      .join(sizes.as("zb"), col("doc_b") === col("zb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("shared").cast("double") /
          (col("za.n") + col("zb.n") - col("shared"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** 32-bit SimHash per document over distinct tokens: token hash =
    * first 8 md5 hex chars; each bit contributes ±1; fingerprint bit j set
    * iff the signed sum is > 0.
    */
  def simhashFingerprints(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .distinct()
    val bits = toks
      .select(col("doc_id"),
        conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long").as("h"))
      .select(col("doc_id"), explode(sequence(lit(0), lit(31))).as("j"), col("h"))
      .groupBy("doc_id", "j")
      .agg(sum(expr("CAST((h >> j) & 1 AS BIGINT) * 2 - 1")).as("v"))
    bits.groupBy("doc_id")
      .agg(sum(when(col("v") > 0, expr("shiftleft(1L, j)")).otherwise(0L))
        .as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, found via
    * pigeonhole banding on the 4 bytes of the fingerprint: any pair within
    * Hamming 3 of each other agrees on at least one byte-band, so the
    * band join finds exactly the all-pairs result without O(n²) compare.
    */
  def simhashPairs(spark: SparkSession, sfDir: String, maxHamming: Int = 3): DataFrame = {
    val fp = simhashFingerprints(spark, sfDir)
    val banded = fp.select(
      col("doc_id"), col("simhash"),
      explode(sequence(lit(0), lit(3))).as("bandidx"))
      .withColumn("bandval", expr("(simhash >> (bandidx * 8)) & 255"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.bandidx") === col("b.bandidx") &&
          col("a.bandval") === col("b.bandval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding-cosine near-dup pairs (brute force over the bucketable
    * corpus; the ANN path for scale lives in [[Similarity]]). The dot
    * product is a sequential double fold over float→double casts — the
    * same IEEE operation order as the oracle's list_sum, hence
    * bit-identical.
    */
  def embeddingNearDups(spark: SparkSession, sfDir: String, threshold: Double = 0.4): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        Similarity.norm2(col("embedding")).as("nrm"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (Similarity.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("vec_a", "vec_b")
  }
}
