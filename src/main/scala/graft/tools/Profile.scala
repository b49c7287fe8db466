package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Optimization-round measurement harness (guide §1): times queries with
  * the SAME session/methodology as [[graft.Bench]] (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus, noop sink, warm-up at sf0.001) and
  * additionally records, per query, the scheduler-level cost the bench
  * total is made of — jobs launched, stages run, tasks run, shuffle bytes
  * written — plus `.explain("formatted")` dumped to a file per query.
  *
  * Usage: Profile <sfDir> <outDir> [name1,name2,...]   (default: all)
  * Output: one line per query on stdout; <outDir>/<name>.txt plans.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shufWrite = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null && m.shuffleWriteMetrics != null)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    def run(name: String, dir: String): Unit =
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    if (sys.env.get("SPARK_GRAFT_PROFILE_NOWARM").isEmpty)
      names.foreach { n =>
        try run(n, "/root/testdata/sf0.001") catch { case _: Throwable => () }
      }
    graft.ops.Dedup.clearMemo()
    println(f"${"query"}%-36s ${"sec"}%8s ${"jobs"}%6s ${"stages"}%7s ${"tasks"}%7s ${"shufMB"}%8s")
    var totalSec = 0.0
    names.foreach { name =>
      spark.sparkContext.setJobDescription(name)
      // settle async listener deliveries from the previous query
      Thread.sleep(120)
      val (j0, s0, t0, w0) = (jobs.get, stages.get, tasks.get, shufWrite.get)
      val ns0 = System.nanoTime()
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - ns0) / 1e9
        totalSec += sec
        Thread.sleep(120)
        Files.writeString(Paths.get(s"$outDir/$name.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        println(f"$name%-36s $sec%8.2f ${jobs.get - j0}%6d ${stages.get - s0}%7d ${tasks.get - t0}%7d ${(shufWrite.get - w0) / 1e6}%8.1f")
      } catch {
        case e: Throwable =>
          println(f"$name%-36s FAIL ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    println(f"TOTAL ${totalSec}%.2f s")
    spark.stop()
  }
}
