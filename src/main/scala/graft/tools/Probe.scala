// scratch: time the full dedup_simhash query, bench-style (cold+warm noop)
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

    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - s) / 1e9}%.2f s")
      r
    }

    t("noop cold") {
      graft.ops.Dedup.simhashPairs(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    t("noop warm") {
      graft.ops.Dedup.simhashPairs(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
