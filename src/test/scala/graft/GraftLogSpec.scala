package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.GraftLog

/** The custom DataSource V2 log (S1/S3's executable stand-in): offset
  * bookkeeping, proportional admission control, minPartitions range
  * splitting, exactly-once sink commit/abort, and checkpointed
  * restart/resume across a topic append.
  */
class GraftLogSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def stageRange(dir: String, ids: Range, nParts: Int): Unit =
    GraftLog.stageTopic(
      ids.toDF("id").withColumn("payload", concat(lit("row-"), col("id"))),
      dir, nParts, col("id"))

  private def drain(topic: String, out: String, ckpt: String,
                    maxPerTrigger: Long): Unit = {
    val q = spark.readStream
      .format("graftlog") // short name → DataSourceRegister service file
      .option("path", topic)
      .option("maxRecordsPerTrigger", maxPerTrigger)
      .load()
      .select(col("value"))
      .writeStream
      .format(GraftLog.format)
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def readIds(out: String): Seq[Long] =
    GraftLog.readCommitted(spark, out)
      .select(get_json_object(col("value"), "$.id").cast("long"))
      .as[Long].collect().toSeq

  test("roundtrip is exactly-once and admission-bounded into multiple epochs") {
    val topic = tmp("gl_topic"); val out = tmp("gl_out"); val ckpt = tmp("gl_ckpt")
    stageRange(topic, 0 until 100, nParts = 3)
    drain(topic, out, ckpt, maxPerTrigger = 17)
    val ids = readIds(out)
    assert(ids.sorted == (0L until 100L).toSeq, "every record exactly once")
    // ≥ ceil(100/17)=6 non-empty epochs committed (AvailableNow may add a
    // final empty catch-up epoch; proportional min-1 may slightly overshoot
    // per epoch, never undershoot)
    val manifests = new File(s"$out/manifests").listFiles()
      .filter(_.getName.startsWith("epoch-"))
    assert(manifests.length >= 5,
      s"expected an admission-bounded multi-epoch drain, got ${manifests.length}")
  }

  test("restart with the same checkpoint resumes from committed offsets across an append") {
    val topic = tmp("gl_topic2"); val out = tmp("gl_out2"); val ckpt = tmp("gl_ckpt2")
    stageRange(topic, 0 until 40, nParts = 2)
    drain(topic, out, ckpt, maxPerTrigger = 15)
    assert(readIds(out).sorted == (0L until 40L).toSeq)
    // producer appends MORE records (strictly-newer segment files); a
    // restarted query on the SAME checkpoint must read exactly the delta
    stageRange(topic, 40 until 70, nParts = 2)
    drain(topic, out, ckpt, maxPerTrigger = 15)
    assert(readIds(out).sorted == (0L until 70L).toSeq,
      "resume must neither replay the first run's records nor skip the appended ones")
  }

  test("proportional admission advances every backlogged partition and terminates") {
    val topic = tmp("gl_topic3")
    stageRange(topic, 0 until 90, nParts = 3)
    val stream = new graft.sources.GraftLogMicroBatchStream(topic, Some(10L), 1)
    var cur = stream.initialOffset()
    val end = stream.latestOffset()
    var steps = 0
    while (cur.json() != end.json() && steps < 100) {
      val next = stream.latestOffset(cur, ReadLimit.maxRows(10))
      val prev = graft.sources.LogOffset.of(cur).parts
      val adv = graft.sources.LogOffset.of(next).parts
      assert(adv.forall { case (p, o) => o >= prev.getOrElse(p, 0L) },
        "offsets are monotone")
      val moved = adv.map { case (p, o) => o - prev.getOrElse(p, 0L) }.sum
      assert(moved > 0 && moved <= 10 + 3,
        s"cap 10 (+min-1 slack per partition) respected, moved $moved")
      cur = next
      steps += 1
    }
    assert(cur.json() == end.json(), s"drained in $steps steps")
    assert(steps >= 9, "cap 10 over 90 records takes at least 9 steps")
  }

  test("minPartitions splits offset ranges beyond topic-partition count") {
    val topic = tmp("gl_topic4")
    stageRange(topic, 0 until 60, nParts = 2)
    val stream = new graft.sources.GraftLogMicroBatchStream(topic, None, 4)
    val parts = stream.planInputPartitions(
      stream.initialOffset(), stream.latestOffset())
    assert(parts.length >= 2 * 4 - 1,
      s"2 topic partitions × minPartitions=4 ⇒ ≥7 input partitions, got ${parts.length}")
    // the splits must tile each partition's range exactly
    val byPid = parts.map(_.asInstanceOf[graft.sources.LogInputPartition])
      .groupBy(_.pid)
    byPid.foreach { case (_, ps) =>
      val sorted = ps.sortBy(_.from)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.until == b.from, "contiguous, no gap/overlap")
        case _ =>
      }
    }
  }

  test("batch read returns every staged record once with dense " +
       "per-partition offsets (BATCH_READ over the same topic)") {
    val topic = tmp("gl_topic6")
    stageRange(topic, 0 until 50, nParts = 3)
    val df = spark.read.format("graftlog").option("path", topic).load()
    val rows = df.select(col("partition"), col("offset"),
        get_json_object(col("value"), "$.id").cast("long").as("id"))
      .collect()
    assert(rows.map(_.getLong(2)).sorted.toSeq == (0L until 50L).toSeq,
      "every record exactly once through the batch path")
    // offsets are dense 0..n-1 within each topic partition
    rows.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      val offs = rs.map(_.getLong(1)).sorted.toSeq
      assert(offs == (0L until rs.length.toLong).toSeq)
    }
  }

  test("uncommitted and aborted sink attempts are invisible to readers") {
    val out = tmp("gl_out5")
    val factory = graft.sources.LogWriterFactory(out)
    def internalRow(s: String) =
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    // attempt 1 commits at task level but its epoch is never driver-committed
    val w1 = factory.createWriter(0, 1L, 0L)
    w1.write(internalRow("orphan"))
    val m1 = w1.commit()
    // attempt 2 aborts: its file must be deleted outright
    val w2 = factory.createWriter(1, 2L, 0L)
    w2.write(internalRow("aborted"))
    w2.abort()
    assert(readIds(out).isEmpty && GraftLog.readCommitted(spark, out).count() == 0,
      "no manifest ⇒ nothing visible")
    // driver commit publishes attempt 1 atomically; only then is it visible
    new graft.sources.GraftLogStreamingWrite(out).commit(0L, Array(m1))
    assert(GraftLog.readCommitted(spark, out).as[String].collect().toSeq
      == Seq("orphan"))
    assert(new File(s"$out/data").listFiles().count(_.getName.endsWith(".txt")) == 1,
      "aborted attempt's file deleted from disk")
  }
}
