// scratch: decimal DIV semantics parity check for the ppm overflow fix
package graft.tools

import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.sql(
      """SELECT CAST(9000000000000 AS BIGINT) AS a,
        |       CAST(13000000000000 AS BIGINT) AS b""".stripMargin)
    val r = df.selectExpr(
      "CAST(CAST(a AS DECIMAL(38,0)) * 1000000 DIV b AS BIGINT) AS ppm_dec",
      "a * 1000000 div b AS ppm_raw")
    try { r.show(); r.printSchema() } catch { case e: Throwable => println("ERR " + e.getMessage.take(200)) }
    val r2 = df.selectExpr(
      "CAST(CAST(a AS DECIMAL(38,0)) * 1000000 DIV b AS BIGINT) AS ppm_dec")
    r2.show(); r2.printSchema()
    spark.stop()
  }
}
