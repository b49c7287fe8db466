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
