package graft

/** The two connected-components algorithms must reach the same fixpoint
  * node-for-node: min-label propagation (diameter-bounded rounds; wins on
  * near-clique dedup graphs) and large-star/small-star contraction
  * (O(log n) rounds; wins on deep chains). The oracle checks the cluster
  * aggregate; this pins the full (node → label) assignment.
  */
class DedupEquivalenceSpec extends SparkSpec {

  test("star-contraction labels == propagation labels, node for node") {
    val sf = "/root/testdata/sf0.01"
    val prop = graft.ops.Dedup.clusterLabels(spark, sf)
    val star = graft.ops.Dedup.starContractionLabels(spark, sf)
    assert(prop.count() === star.count())
    assert(prop.exceptAll(star).count() === 0)
    assert(star.exceptAll(prop).count() === 0)
    assert(prop.count() > 0)
  }
}
