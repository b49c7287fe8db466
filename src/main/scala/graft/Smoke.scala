package graft

import org.apache.spark.sql.SparkSession

/** Local dev smoke: prints schemas + flagship result. Not part of the driver
  * contract.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    for (t <- Seq("events", "documents", "embeddings")) {
      println(s"== $t ==")
      Tables.table(spark, sf, t).printSchema()
    }
    val df = SparkEntry.entry(spark)
    df.show(5, truncate = false)
    println(s"entry rows: ${df.count()}")
    spark.stop()
  }
}
