package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Similarity search over the `embeddings` table (ARRAY<FLOAT>, dim 64).
  *
  * Brute-force cosine top-k is the correctness baseline (one pass over the
  * corpus per query vector — at cluster scale a broadcast of the query
  * side); the random-hyperplane LSH variant is the scale path (bucketed
  * shuffle join instead of full cross product).
  *
  * Numeric determinism: dot products fold left-to-right in DOUBLE over
  * float→double casts — the same operation order as DuckDB's list_sum, so
  * scores are bit-identical across engines, no rounding needed.
  *
  * The folds run as the native codegen expressions `vec_dot`/`vec_norm`
  * ([[graft.functions.DotProduct]]/[[graft.functions.NormL2]]): the HOF
  * formulation (`aggregate(zip_with(…))`) is interpreted with per-element
  * boxing and measured ~30 s on the sf0.1 near-dup sweep; the codegen loop
  * stays inside whole-stage codegen.
  */
object Similarity {

  /** Sequential-fold dot product, in double (codegen expression). */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** L2 norm, same fold discipline (codegen expression). */
  def norm2(a: Column): Column = call_function("vec_norm", a)

  /** Brute-force cosine top-k against the embedding of `queryId`. The query
    * row is a 1-row broadcast; the scan is a single projection+filter over
    * the corpus followed by TakeOrderedAndProject — no shuffle of the
    * corpus, scales linearly and parallelizes perfectly.
    */
  def bruteForceTopK(spark: SparkSession, sfDir: String, queryId: Long = 0L,
                     k: Int = 10): DataFrame = {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), norm2(col("embedding")).as("q_nrm"))
    e.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        (dot(col("embedding"), col("q_emb")) /
          (norm2(col("embedding")) * col("q_nrm"))).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** Random-hyperplane LSH signature: `nPlanes` hyperplanes with ±1
    * components derived deterministically from md5(plane, dim) parity —
    * reproducible anywhere, no RNG state. Vectors agreeing on the signature
    * land in the same bucket.
    */
  def lshSignature(emb: Column, dim: Int, nPlanes: Int): Column =
    call_function("vec_lsh_sig", emb, lit(nPlanes))

  /** ANN top-k via LSH bucketing: candidates = vectors sharing the query's
    * signature bucket (multi-probe: Hamming ≤ 1 on the signature), ranked
    * by exact cosine. At scale this is a bucket-key join instead of a full
    * scan; recall vs brute force is asserted in the spec suite.
    */
  def annTopK(spark: SparkSession, sfDir: String, queryId: Long = 0L,
              k: Int = 10, nPlanes: Int = 8): DataFrame = {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("sig", lshSignature(col("embedding"), dim = 64, nPlanes = nPlanes))
    val q = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), norm2(col("embedding")).as("q_nrm"),
        col("sig").as("q_sig"))
    e.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      // multi-probe: own bucket plus Hamming-1 neighbours
      .filter(expr("bit_count(sig ^ q_sig)") <= 1)
      .select(col("vec_id"), col("label"),
        (dot(col("embedding"), col("q_emb")) /
          (norm2(col("embedding")) * col("q_nrm"))).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }
}
