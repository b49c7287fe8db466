package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** word_shingles codegen kernel vs the declarative HOF formulation it
  * replaced — semantics must be identical (the DuckDB oracle mirrors the
  * HOF form).
  */
class TextExprSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def hofShingles(textCol: org.apache.spark.sql.Column, n: Int) = {
    val ws = split(textCol, " ")
    when(size(ws) >= n,
      array_distinct(transform(
        sequence(lit(0), size(ws) - n),
        i => concat_ws(" ",
          (0 until n).map(k => element_at(ws, (i + k + 1).cast("int"))): _*))))
      .otherwise(array().cast("array<string>"))
  }

  test("matches the HOF formulation on varied inputs") {
    val docs = Seq(
      "a b c d e",
      "a b c a b c a b c", // duplicate shingles
      "x y",               // shorter than n
      "",                  // empty
      "a  b c",            // double space → empty word
      "trailing space ",   // trailing space
      "สวัสดี ครับ ผม ชื่อ",  // unicode
      "one two three"
    ).toDF("text")
    val both = docs.select(
      call_function("word_shingles", col("text"), lit(3)).as("kernel"),
      hofShingles(col("text"), 3).as("hof"))
    assert(both.filter(col("kernel") =!= col("hof")).count() === 0)
  }

  test("null text yields null") {
    val r = Seq(Option.empty[String]).toDF("text")
      .select(call_function("word_shingles", col("text"), lit(3)))
      .head()
    assert(r.isNullAt(0))
  }

  test("interpreted path matches codegen path") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val r = Seq("a b c d").toDF("text")
        .select(call_function("word_shingles", col("text"), lit(3)))
        .head().getSeq[String](0)
      assert(r === Seq("a b c", "b c d"))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("top_ngram_count == max gram multiplicity on varied inputs, " +
       "0 below n words, null on null") {
    val docs = Seq(
      "a b a b a b",       // "a b" x3 via overlap
      "a a a a",           // "a a" x3
      "x y",               // exactly one bigram
      "x",                 // below n
      "",                  // empty
      "a  b a  b",         // empty words count as words
      "one two three four" // all distinct
    ).toDF("text")
    val ws = split(col("text"), " ")
    val hof = when(size(ws) >= 2,
      array_max(transform(
        array_distinct(call_function("word_ngrams", col("text"), lit(2))),
        g => size(filter(call_function("word_ngrams", col("text"), lit(2)),
          x => x === g)))).cast("long"))
      .otherwise(0L)
    val both = docs.select(
      call_function("top_ngram_count", col("text"), lit(2)).as("kernel"),
      hof.as("hof"))
    assert(both.filter(col("kernel") =!= col("hof")).count() === 0)
    assert(docs.limit(1).select(
      call_function("top_ngram_count", col("text"), lit(2))).head()
      .getLong(0) === 3L)
    val nul = Seq(Option.empty[String]).toDF("text")
      .select(call_function("top_ngram_count", col("text"), lit(2)))
      .head()
    assert(nul.isNullAt(0))
  }

  test("intersect_size == size(array_intersect) on varied set shapes, " +
       "and the optimizer rule fuses the composed form") {
    val docs = Seq(
      ("a b c", "b c d"),        // partial overlap
      ("a a b", "a b b"),        // duplicates — count stays distinct
      ("a b", "c d"),            // disjoint
      ("", "a"),                 // empty side
      ("x y z", "x y z"),        // identical
      ("สวัสดี ครับ", "ครับ ผม")  // unicode
    ).toDF("ta", "tb")
      .select(split(col("ta"), " ").as("a"), split(col("tb"), " ").as("b"))
    val both = docs.select(
      call_function("intersect_size", col("a"), col("b")).as("kernel"),
      size(array_intersect(col("a"), col("b"))).as("composed"))
    assert(both.filter(col("kernel") =!= col("composed")).count() === 0)
    // null input follows the non-legacy Size contract for the direct call
    val nulls = Seq((Some(Seq("a")), Option.empty[Seq[String]]))
      .toDF("a", "b")
      .select(call_function("intersect_size", col("a"), col("b")))
    assert(nulls.head().isNullAt(0))
    // null ELEMENTS follow array_intersect's equality contract: null
    // matches null, contributing at most once
    val nullElems = Seq(1).toDF("i").select(
      call_function("intersect_size",
        array(lit("a"), lit(null).cast("string"), lit(null).cast("string")),
        array(lit(null).cast("string"), lit("b"))).as("kernel"),
      size(array_intersect(
        array(lit("a"), lit(null).cast("string"), lit(null).cast("string")),
        array(lit(null).cast("string"), lit("b")))).as("composed"))
    val ne = nullElems.head()
    assert(ne.getInt(0) === 1 && ne.getInt(1) === 1)
    // the rewrite fires on a parquet-backed plan (a LocalRelation frame
    // constant-folds away, and the memoized Jaccard frames are opaque
    // LogicalRDDs): the COMPOSED size(array_intersect(…)) carries the
    // kernel in the optimized plan — the same shape the Jaccard-verify
    // hot path (Dedup.verifyJaccardWith) executes per candidate pair
    val opt = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(size(array_intersect(
        split(col("text"), " "), array(col("lang")))).as("n"))
      .queryExecution.optimizedPlan.toString
    assert(opt.contains("intersect_size"),
      s"RewriteIntersectSize did not fire:\n$opt")
  }

  private def composedCoin(c: org.apache.spark.sql.Column, m: Long) =
    pmod(conv(substring(md5(c), 1, 8), 16, 10).cast("long"), lit(m))

  test("md5_bucket equals the composed hex-parse coin on varied inputs " +
       "and moduli") {
    val rows = Seq("", "a", "0", "42", "doc 7", "héllo wörld", "日本語",
      "a" * 500, "123,7", "null")
    val df = rows.toDF("s")
    for (m <- Seq(2L, 100L, 256L, 1048576L, 4294967296L)) {
      val bad = df.select(
          call_function("md5_bucket", col("s"), lit(m)).as("k"),
          composedCoin(col("s"), m).as("c"))
        .filter(col("k") =!= col("c") || col("k").isNull =!= col("c").isNull)
      assert(bad.count() === 0, s"mismatch at m=$m")
    }
    // null string -> null, like the composed form
    val n = Seq[Option[String]](None).toDF("s")
      .select(call_function("md5_bucket", col("s"), lit(100L)).as("k"))
    assert(n.head().isNullAt(0))
  }

  test("RewriteMd5Bucket fuses the composed coin on positive literal " +
       "moduli, leaves non-literal moduli composed, and preserves values") {
    // a parquet-backed frame: a local relation would be wholly
    // constant-folded before the user batch and show nothing
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"))
    val composed = df.select(col("doc_id"),
      composedCoin(col("doc_id").cast("string"), 100L).as("b"))
    val opt = composed.queryExecution.optimizedPlan.toString
    assert(opt.contains("md5_bucket"),
      s"RewriteMd5Bucket did not fire:\n$opt")
    assert(!opt.contains("conv("), s"composed chain survived:\n$opt")
    // values identical to the direct kernel call (the fused plan's rows
    // ARE the composed form's values — the kernel spec above pins the
    // arithmetic; here we pin fused-plan output end to end)
    val fused = composed.collect().map(r => (r.getLong(0), r.getLong(1)))
    val direct = df.select(col("doc_id"),
        call_function("md5_bucket", col("doc_id").cast("string"),
          lit(100L)).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fused.toSeq === direct.toSeq)
    assert(fused.nonEmpty)
    // a non-literal modulus keeps the composed form (pmod semantics at
    // m<=0 must not change)
    val dyn = df.select(pmod(
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"), col("doc_id") + 1L).as("b"))
    assert(!dyn.queryExecution.optimizedPlan.toString.contains("md5_bucket"))
  }
}
