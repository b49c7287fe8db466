package graft

import org.apache.spark.sql.DataFrame

import graft.streaming.StreamAssembly

/** Round-15 additions: checkpoint-restart recovery for the STATEFUL
  * drains. `StreamRestartSpec` proves exactly-once across restart for
  * stateless file-source ingest; these three kill each stateful shape
  * mid-drain — AFTER a micro-batch's sink write but BEFORE its
  * checkpoint commit, the harshest window: the state store must rewind
  * to the batch's pre-state and the replayed batch's output must
  * REPLACE (not duplicate) the orphaned sink write — and assert the
  * resumed drain lands on the row-identical result of an uninterrupted
  * drain of the same source:
  *
  *  - the `transformWithState` timer sessionizer (RocksDB provider —
  *    hand-managed per-key state + close timers),
  *  - the built-in `session_window` merge aggregate (HDFS-backed
  *    provider — engine-managed window-merge state),
  *  - the watermarked stream-stream self-join (two symmetric join state
  *    stores + watermark eviction).
  *
  * This is the reference consumer's crash story
  * (`consumers/kafka_to_clickhouse.py:127-129` — restart polling after
  * an error, at-least-once) upgraded to exactly-once for stateful
  * state-store recovery. The TWS shape additionally runs as the gated
  * query `stream_tws_restart` against the batch oracle.
  */
class Round15Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def assertSameRows(crashed: DataFrame, clean: DataFrame): Unit = {
    assert(crashed.count() === clean.count())
    assert(crashed.exceptAll(clean).count() === 0)
    assert(clean.exceptAll(crashed).count() === 0)
  }

  test("TWS sessionizer killed mid-drain resumes from RocksDB " +
       "checkpoint to the identical session table") {
    val crashed = StreamAssembly.streamSessionsTws(spark, sf,
      crashAfterBatches = 2)
    val clean = StreamAssembly.streamSessionsTws(spark, sf)
    assertSameRows(crashed, clean)
    assert(crashed.count() > 0)
  }

  test("session_window drain killed mid-drain resumes from checkpoint " +
       "to the identical session table") {
    val crashed = StreamAssembly.streamSessionWindows(spark, sf,
      crashAfterBatches = 2)
    val clean = StreamAssembly.streamSessionWindows(spark, sf)
    assertSameRows(crashed, clean)
    assert(crashed.count() > 0)
  }

  test("watermarked stream-stream join killed mid-drain resumes from " +
       "checkpoint to the identical pair accounting") {
    val crashed = StreamAssembly.streamJoinFollowupsWatermarked(spark, sf,
      crashAfterBatches = 2)
    val clean = StreamAssembly.streamJoinFollowupsWatermarked(spark, sf)
    assertSameRows(crashed, clean)
    assert(crashed.count() > 0)
  }
}
