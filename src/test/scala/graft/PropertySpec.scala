package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.gen.SalesGen

/** Property-based checks (SURVEY.md §5.3) over the deterministic order
  * generator. scalacheck drives the case generation; each property runs a
  * handful of Spark jobs, so minSuccessfulTests stays small.
  */
class PropertySpec extends SparkSpec {

  private def check(prop: Prop, cases: Int = 5): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, res.status.toString)
  }

  private def hourly(df: org.apache.spark.sql.DataFrame) =
    df.filter(col("order_status") === "completed")
      .groupBy(date_trunc("hour", col("order_timestamp")).as("hour"),
        col("category"))
      .agg(count(lit(1)).as("c"), sum("total_amount").as("v"))

  test("block-wise partial rollups fold to the direct rollup for ANY split") {
    // the SummingMergeTree contract: per-insert-block partials, summed at
    // merge time, equal the aggregate over the union — for every blocking
    val orders = SalesGen.orders(spark, 400).cache()
    orders.count()
    check(Prop.forAll(Gen.choose(1, 9)) { k =>
      val partials = orders
        .withColumn("blk", pmod(col("order_id").substr(-4, 4).cast("long"), lit(k)))
        .filter(col("order_status") === "completed")
        .groupBy(date_trunc("hour", col("order_timestamp")).as("hour"),
          col("category"), col("blk"))
        .agg(count(lit(1)).as("pc"), sum("total_amount").as("pv"))
      val compacted = partials.groupBy("hour", "category")
        .agg(sum("pc").as("c"), sum("pv").as("v"))
        .withColumn("v", round(col("v"), 6))
      val direct = hourly(orders).withColumn("v", round(col("v"), 6))
      compacted.exceptAll(direct).isEmpty && direct.exceptAll(compacted).isEmpty
    })
  }

  test("dedup is idempotent and keeps exactly one row per natural key") {
    val orders = SalesGen.orders(spark, 300).cache()
    orders.count()
    check(Prop.forAll(Gen.choose(10, 250)) { dupes =>
      val withDupes = orders.union(orders.limit(dupes))
      val once = withDupes.dropDuplicates("order_id", "order_timestamp")
      val twice = once.dropDuplicates("order_id", "order_timestamp")
      val keys = orders.select("order_id", "order_timestamp").distinct().count()
      once.count() == keys && twice.count() == keys
    })
  }

  test("generator rows satisfy the reference money invariant at any size") {
    // total_amount = round(q*p*(1-d/100), 2)  (sales_producer.py:111-113,129)
    check(Prop.forAll(Gen.choose(50, 500)) { n =>
      SalesGen.orders(spark, n)
        .filter(col("total_amount") =!=
          round(col("quantity") * col("unit_price") *
            (lit(1.0) - col("discount_percent") / 100.0), 2))
        .count() == 0L
    }, cases = 3)
  }

  test("z-value interleave is a bijection on the 16-bit grid: " +
       "de-interleaving recovers both coordinates exactly") {
    // drive the production zvalue column over arbitrary grid points and
    // invert the Morton code in plain Scala — any mask/shift slip in the
    // spread would break exact recovery
    val pts = Gen.listOfN(64, for {
      a <- Gen.choose(0, 65535); b <- Gen.choose(0, 65535)
    } yield (a, b))
    check(Prop.forAll(pts) { ps =>
      val spark2 = spark
      import spark2.implicits._
      val df = ps.toDF("a", "b")
        .select(col("a"), col("b"),
          graft.storage.Storage.zvalue(
            col("a").cast("double"), col("b").cast("double"),
            struct(lit(0.0).as("a_min"), lit(65535.0).as("a_max"),
              lit(0.0).as("b_min"), lit(65535.0).as("b_max"))).as("z"))
      def compact(z: Long): Int = {
        var x = z & 0x5555555555555555L
        x = (x | (x >> 1)) & 0x3333333333333333L
        x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
        x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
        x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
        x.toInt
      }
      df.collect().forall { r =>
        val z = r.getAs[Long]("z")
        compact(z >> 1) == r.getAs[Int]("a") &&
          compact(z) == r.getAs[Int]("b")
      }
    }, cases = 3)
  }
}
