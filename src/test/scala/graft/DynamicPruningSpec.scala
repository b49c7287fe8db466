package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Dynamic partition pruning (SPARK-11150) — the partitioned-storage scale
  * guard: when a partitioned fact joins a dimension whose filter selects
  * few partition values, the fact scan must read ONLY the matching
  * partitions, with the pruning subquery injected at runtime. At 100 TB a
  * date-partitioned fact table is the norm and a scan that ignores the
  * dim filter reads the full table; this spec pins that our partitioned
  * layout ([[graft.storage.Storage.writeRaw]]-style `partitionBy`) + a
  * plain equi-join trigger the rewrite.
  */
class DynamicPruningSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("partitioned fact scan carries a dynamicpruning filter from the " +
       "dim side and reads fewer partitions") {
    val dir = Files.createTempDirectory("graft_dpp").toFile
    val path = dir.getAbsolutePath + "/events_by_type"
    Tables.events(spark, sf)
      .write.partitionBy("event_type").mode("overwrite").parquet(path)
    val fact = spark.read.parquet(path)
    // dim: (event_type, tag) with a selective non-partition-key filter —
    // parquet-backed so the filter survives as a real predicate (a local
    // relation would be constant-folded and the pruning rule would see no
    // selective filter to propagate)
    val dimPath = dir.getAbsolutePath + "/dim_types"
    spark.createDataFrame(Seq(
      ("purchase", "keep"), ("view", "drop"), ("click", "drop"),
      ("login", "drop"), ("error", "drop"))).toDF("event_type", "tag")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact.join(dim.filter(col("tag") === "keep"), "event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan")
    // and the result is the same as filtering directly
    val n = joined.collect()(0).getLong(0)
    val direct = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(n === direct)
    // deleteOnExit is a no-op on non-empty directories — remove the two
    // parquet datasets for real so repeated runs don't accumulate temp data
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(dir)
  }
}
