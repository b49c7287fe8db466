package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal fixture builder: replicate an existing sf directory
  * `factor`× with consistent key remapping, so the bench can be timed at
  * 10× (sf1) without the driver's generator. Copy `i` shifts every key
  * column by `i · off(table)`, where `off` is the table's max key rounded
  * up to a multiple of [[KeyModulus]] — keeping all the mod-derived
  * distributions the operators key on (doc_id % 3 media type, % 2
  * stream/history splits, % 10 report buckets, the % 9/7/5/4 media dims,
  * % 100 sampling coins) IDENTICAL per copy, and keeping every foreign
  * key consistent (an order's lineitems shift together with it, a
  * customer's orders with the customer).
  *
  * Dimension tables (region, nation) are NOT replicated — at any scale a
  * star schema's dims stay broadcast-sized; facts fan out against them.
  *
  * Caveat (documented in BASELINE.md): replicated copies carry byte-equal
  * `text`/`embedding` payloads, so the sf1 corpus is maximally dup-heavy
  * — every doc has `factor−1` exact twins. For the dedup/similarity tiers
  * that is a stress test (cluster sizes and band buckets grow ×factor),
  * not a distribution match; scan/join/agg/window tiers are unaffected.
  */
object ScaleUp {

  /** lcm(2520, 100, 16, 97) — divides every modulus the fixture
    * operators apply to key columns (2,3,4,5,6,7,8,9,10,30,100, the
    * %16 stream-join user buckets, and the %97 top_orders stratum), so
    * every mod-derived distribution is copy-invariant. (Mods over
    * DERIVED values — md5 coins, %256 pixel channels — intentionally
    * differ per copy.)
    */
  val KeyModulus: Long = 2444400L

  private val keyCols: Map[String, Seq[String]] = Map(
    "region" -> Seq.empty,
    "nation" -> Seq.empty,
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val destDir = if (args.length > 1) args(1) else "target/scale/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val mode = if (args.length > 3) args(3) else ""
    val fresh = mode == "fresh" || mode == "clustered"
    val clustered = mode == "clustered"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val hadSession = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, srcDir, destDir, factor, fresh, clustered)
    // only tear down a session this main created (the spec reuses its own)
    if (!hadSession) spark.stop()
  }

  /** Fresh-entropy payload refresh for copy `i` — the answer to the
    * replicate caveat above: content columns mutate deterministically
    * per copy so near-dup density scales ×factor (each within-copy
    * relationship survives, cross-copy twins are destroyed), while the
    * distributions the operators key on are preserved.
    *
    * - documents.text: a per-copy Caesar rotation of the alphabet
    *   (`translate`, char-level bijection) — token/char counts, text
    *   lengths, Zipf shape and every WITHIN-copy token-set relationship
    *   (Jaccard, shingles, simhash agreement structure) are identical
    *   to the base corpus; across copies no token survives, so the
    *   near-dup pair count scales exactly ×factor, not ×factor².
    * - embeddings.embedding: a per-copy ORTHOGONAL transform (dimension
    *   rotation by 7·i plus md5-parity sign flips) — an isometry applied
    *   to the whole copy, so norms and within-copy pairwise cosines are
    *   preserved as exact multisets of float products (sequential-fold
    *   doubles may differ in the last ulp from the base copy because the
    *   rotation reorders the summation); cross-copy twins land at
    *   scrambled angles.
    * - events.ts: a per-copy second-level jitter so replicated rows
    *   stop sharing byte-equal timestamps (bucket distributions move
    *   by < 1 minute).
    *
    * Copy 0 is always the untouched base corpus.
    */
  private def refresh(table: String, df: DataFrame, i: Int): DataFrame =
    table match {
      case "documents" =>
        val lower = ('a' to 'z').mkString
        val upper = ('A' to 'Z').mkString
        val rot = i % 26
        if (rot == 0) df
        else df.withColumn("text", translate(col("text"),
          lower + upper,
          lower.drop(rot) + lower.take(rot) +
            upper.drop(rot) + upper.take(rot)))
      case "embeddings" =>
        val dim = 64
        val shift = (i * 7) % dim
        df.withColumn("embedding", expr(
          s"""transform(sequence(0, ${dim - 1}), j ->
             |  CASE WHEN conv(substring(md5(concat('$i,',
             |      CAST(j AS STRING))), 1, 2), 16, 10) % 2 = 0
             |  THEN embedding[(j + $shift) % $dim]
             |  ELSE -embedding[(j + $shift) % $dim] END)""".stripMargin))
      case "events" =>
        df.withColumn("ts",
          col("ts") + expr(s"INTERVAL ${i % 60} SECONDS"))
      case _ => df
    }

  /** Number of planted centroids in `clustered` mode. 32 cells over
    * the sf0.01 corpus (~600 vectors) gives ~19 members per cluster —
    * enough that top-10 neighbor lists are intra-cluster — and over
    * any larger fixture the per-cluster mass only grows.
    */
  val ClusterCount: Int = 32

  /** Planted-cluster mixture for `clustered` mode: every embedding
    * (all copies, including copy 0) becomes
    * `centroid(cell(vec_id)) + emb/2`, where `cell = md5(vec_id) % K`
    * and the centroid is the ±1/8 sign vector drawn from
    * md5(cell ':' dim) parity (norm exactly 1 at dim 64). With the
    * base corpus near-unit-norm and near-uniform, members of one cell
    * land at pairwise cosine ≈ 0.77 and cross-cell pairs stay near
    * the centroids' own random angles (≈ 0.1) — the clustered regime
    * production ANN indexes actually serve, which the near-uniform
    * base fixture cannot exhibit (BASELINE.md documents its honest
    * 3/10 recall). IVF/PQ recall audits re-gate on this fixture with
    * recall in a realistic band. Deterministic: both engines read the
    * same parquet bytes, so no cross-engine float discipline applies
    * to the mixture arithmetic itself.
    */
  private def plantClusters(df: DataFrame): DataFrame = {
    val dim = 64
    df.withColumn("embedding", expr(
      s"""transform(sequence(0, ${dim - 1}), j -> CAST(
         |  CASE WHEN conv(substring(md5(concat(
         |      CAST(pmod(CAST(conv(substring(md5(CAST(vec_id AS STRING)),
         |        1, 8), 16, 10) AS BIGINT), $ClusterCount) AS STRING),
         |      ':', CAST(j AS STRING))), 1, 2), 16, 10) % 2 = 0
         |    THEN 0.125 ELSE -0.125 END
         |  + 0.5D * embedding[j] AS FLOAT))""".stripMargin))
  }

  def run(spark: SparkSession, srcDir: String, destDir: String,
          factor: Int, fresh: Boolean = false,
          clustered: Boolean = false): Unit = {
    // per key DOMAIN (not per table): orderkey offsets must agree between
    // orders and lineitem, custkey between customer and orders, etc.
    // Cross-table references beyond the obvious star FKs: embeddings'
    // vec_id indexes documents' doc_id (hybrid search, semantic
    // contamination), and events' user_id joins customer.c_custkey
    // (stream static enrichment) — each must share its referent's
    // domain or replication cross-wires the copies.
    val domainOf: Map[String, String] = Map(
      "c_custkey" -> "custkey", "o_custkey" -> "custkey",
      "user_id" -> "custkey",
      "s_suppkey" -> "suppkey", "l_suppkey" -> "suppkey",
      "p_partkey" -> "partkey", "l_partkey" -> "partkey",
      "o_orderkey" -> "orderkey", "l_orderkey" -> "orderkey",
      "event_id" -> "event_id",
      "doc_id" -> "doc_id", "vec_id" -> "doc_id")

    val tables = keyCols.keys.toSeq
    val frames = tables.map(t =>
      t -> spark.read.parquet(s"$srcDir/$t.parquet")).toMap

    // offset per domain = max over every column in the domain, rounded up
    // to the next KeyModulus multiple (so key % m is copy-invariant)
    val domainOff: Map[String, Long] = domainOf.values.toSeq.distinct.map {
      dom =>
        val maxes = for {
          (t, cols) <- keyCols.toSeq
          c <- cols if domainOf(c) == dom
        } yield {
          // fail loudly on a non-integral key (fixture schema drift has
          // happened before); tolerate int32/int64 via Number
          frames(t).agg(max(col(c))).collect()(0).get(0) match {
            case n: Number => n.longValue()
            case other => throw new IllegalArgumentException(
              s"non-numeric key column $t.$c: $other")
          }
        }
        val m = maxes.max
        dom -> ((m / KeyModulus) + 1) * KeyModulus
    }.toMap

    tables.foreach { t =>
      val df = frames(t)
      val keys = keyCols(t)
      val out =
        if (keys.isEmpty) df
        else
          (0 until factor).map { i =>
            val shifted = keys.foldLeft(df) { (d, k) =>
              // keep the source dtype unless the shifted range would
              // overflow it (an int32 key near 2^31 would silently wrap
              // on cast) — then widen to long
              val off = domainOff(domainOf(k))
              val target = df.schema(k).dataType match {
                case org.apache.spark.sql.types.LongType =>
                  org.apache.spark.sql.types.LongType
                case narrow if off * factor <= Int.MaxValue.toLong => narrow
                case _ => org.apache.spark.sql.types.LongType
              }
              d.withColumn(k,
                (col(k) + lit(i.toLong * off)).cast(target))
            }
            val refreshed =
              if (fresh && i > 0) refresh(t, shifted, i) else shifted
            if (clustered && t == "embeddings") plantClusters(refreshed)
            else refreshed
          }.reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$destDir/$t.parquet")
      println(s"[scaleup] $t: ${df.count()} -> ${spark.read
        .parquet(s"$destDir/$t.parquet").count()} rows")
    }
  }
}
