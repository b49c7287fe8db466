package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.ops.CorpusStats

/** Round-11 additions: batched BPE training (the production-vocabulary
  * path) — equivalence with the sequential loop at batchSize=1,
  * non-interaction of each round's batch, and the job-count scaling that
  * motivates batching (O(rounds) job waves, not O(merges)).
  */
class Round11Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("batched BPE with batchSize=1 reproduces the sequential merge " +
       "table exactly") {
    val seq = CorpusStats.bpeTrainMerges(spark, sf, rounds = 8)
      .select("rank", "pair", "n").collect().map(_.toSeq)
    val bat = CorpusStats.bpeTrainMergesBatched(spark, sf,
        rounds = 8, batchSize = 1)
      .select("rank", "pair", "n").collect().map(_.toSeq)
    assert(bat.toSeq === seq.toSeq)
  }

  test("batched BPE rounds are non-interacting and round-start-counted") {
    val rows = CorpusStats.bpeTrainMergesBatched(spark, sf,
        rounds = 3, batchSize = 6)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("round")).foreach { case (round, rs) =>
      // within a round: pairwise-disjoint symbols (the batching contract)
      val syms = rs.flatMap(_.getAs[String]("pair").split(" "))
      assert(syms.length === syms.distinct.length,
        s"round $round shares a symbol: ${syms.mkString(",")}")
      // counts are round-start frozen → ranked non-increasing in-round
      val ns = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("n")).toSeq
      assert(ns === ns.sorted.reverse, s"round $round counts: $ns")
    }
    // global ranks dense across rounds
    val ranks = rows.map(_.getAs[Long]("rank")).sorted.toSeq
    assert(ranks === (1L to ranks.length))
  }

  test("batched BPE launches O(rounds) job waves, not O(merges): " +
       "batching at least halves jobs-per-merge vs sequential") {
    def countJobs(body: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit =
          n.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try {
        body
        // listener events are async; wait for the count to stabilize
        var last = -1
        while (n.get() != last) { last = n.get(); Thread.sleep(300) }
      } finally spark.sparkContext.removeSparkListener(l)
      n.get()
    }
    graft.ops.Memo.clearAll()
    val seqJobs = countJobs {
      CorpusStats.bpeTrainMerges(spark, sf, rounds = 6).write
        .format("noop").mode("overwrite").save()
    }
    graft.ops.Memo.clearAll()
    var batMerges = 0L
    val batJobs = countJobs {
      val df = CorpusStats.bpeTrainMergesBatched(spark, sf,
        rounds = 1, batchSize = 6)
      batMerges = df.count()
    }
    assert(batMerges >= 4, s"batch under-filled: $batMerges of 6")
    // 6 sequential merges vs one 6-merge round: the batched path must
    // cost at most half the jobs per merge (it is ~1 round's constant)
    assert(batJobs * 2 <= seqJobs,
      s"batched $batJobs jobs for $batMerges merges vs sequential $seqJobs")
  }
}
