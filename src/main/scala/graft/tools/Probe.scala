// scratch: measure the cross-query Memo checkpoint footprint at a fixture
package graft.tools

import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    graft.ops.Memo.clearAll()
    val mm = graft.multimodal.Multimodal
    Seq(
      "imageDhash" -> mm.imageDhash(spark, dir),
      "audioAhash+videoDhash" -> mm.videoDhash(spark, dir),
      "imageBlockVectors" -> mm.imageBlockVectors(spark, dir)
    ).foreach { case (n, df) => df.count(); () }
    // also the text-side memoized frames via their consuming queries
    graft.SparkEntry.queries("dedup_minhash")(spark, dir).count()
    graft.SparkEntry.queries("quality_lm_ppx")(spark, dir).count()
    val infos = spark.sparkContext.getRDDStorageInfo
    var mem = 0L; var disk = 0L
    infos.foreach { i =>
      println(f"PROBE rdd=${i.name}%-40s mem=${i.memSize}%10d disk=${i.diskSize}%10d parts=${i.numCachedPartitions}")
      mem += i.memSize; disk += i.diskSize
    }
    println(f"PROBE TOTAL mem=${mem / 1024 / 1024}%d MiB disk=${disk / 1024 / 1024}%d MiB over ${infos.length}%d cached RDDs")
    graft.ops.Memo.clearAll()
    Thread.sleep(2000)
    val after = spark.sparkContext.getRDDStorageInfo
    println(s"PROBE after clearAll: ${after.length} cached RDDs remain")
    spark.stop()
  }
}
