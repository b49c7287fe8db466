package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc query CLI — the surface the reference declares but never shipped
  * (`pyproject.toml:33` points `query-ch` at a module that does not exist;
  * SURVEY.md §0). Four forms:
  *
  *   runMain graft.Cli list
  *   runMain graft.Cli <queryName> [sfDir]     — a named SparkEntry query
  *   runMain graft.Cli sql "<SELECT …>" [sfDir] — ANSI SQL over the tables
  *   runMain graft.Cli explain <queryName> [sfDir] — formatted physical plan
  *
  * SQL statements run through `spark.sql` against temp views of the
  * testdata tables plus graft's registered native functions (vec_dot,
  * vec_norm, word_shingles) — the full EP3 path: parse → analyze →
  * optimize → whole-stage-codegen. `explain` prints
  * `.explain("formatted")` for plan review (pushdown, broadcasts,
  * exchanges) without executing.
  */
object Cli {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); return }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-cli")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.GraftFunctions.register(spark)
    try run(spark, args) finally spark.stop()
  }

  private def run(spark: SparkSession, args: Array[String]): Unit =
    args(0) match {
      case "list" =>
        SparkEntry.queries.keys.toSeq.sorted.foreach(println)
      case "sql" if args.length >= 2 =>
        val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.01")
        Tables.registerAll(spark, sfDir)
        spark.sql(args(1)).show(100, truncate = false)
      case "explain" if args.length >= 2 &&
          SparkEntry.queries.contains(args(1)) =>
        val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.01")
        SparkEntry.queries(args(1))(spark, sfDir).explain("formatted")
      case name if SparkEntry.queries.contains(name) =>
        val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
        SparkEntry.queries(name)(spark, sfDir).show(100, truncate = false)
      case other =>
        println(s"unknown query '$other'"); usage()
    }

  private def usage(): Unit =
    println("usage: graft.Cli list | <queryName> [sfDir] | " +
      "sql \"<SELECT…>\" [sfDir] | explain <queryName> [sfDir]")
}
