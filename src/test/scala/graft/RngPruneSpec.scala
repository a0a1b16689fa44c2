package graft

import graft.functions.RngPrune

/** The RNG rule (`RelativeNeighborhoodGraph.h:18-35`): candidate c rejected
  * iff an accepted a has factor*d(a,c) < d(node,c).
  */
class RngPruneSpec extends SparkSpec {

  private def v(xs: Double*): Array[Double] = xs.toArray

  test("closest candidate always accepted; redundant one pruned") {
    // node at origin; c1=(1,0) d=1; c2=(2,0) d=4, d(c1,c2)=1 < 4 → pruned
    val cands = Seq(
      (1L, 1.0, v(1, 0)),
      (2L, 4.0, v(2, 0)))
    assert(RngPrune.prune(cands, 1.0, 8) === Seq(1L))
  }

  test("spread-out candidates all survive") {
    // c1=(1,0) d=1; c2=(0,1) d=1 tie→id order; d(c1,c2)=2 >= 1 → kept
    val cands = Seq(
      (2L, 1.0, v(0, 1)),
      (1L, 1.0, v(1, 0)))
    assert(RngPrune.prune(cands, 1.0, 8).toSet === Set(1L, 2L))
  }

  test("maxAccept caps the output") {
    val cands = (1 to 10).map(i => (i.toLong, i.toDouble, v(100.0 * i, 0)))
    assert(RngPrune.prune(cands, 1.0, 3).length === 3)
  }

  test("rngFactor scales the redundancy test: f*d(a,c) < d(node,c)") {
    val cands = Seq(
      (1L, 1.0, v(1, 0)),
      (2L, 9.0, v(3, 0))) // l2sq(c1,c2) = 4
    assert(RngPrune.prune(cands, 1.0, 8) === Seq(1L)) // 1*4 < 9 → c2 redundant
    assert(RngPrune.prune(cands, 3.0, 8) === Seq(1L, 2L)) // 3*4 = 12 >= 9 → kept
  }

  test("accepted set is prefix-stable (order-sensitivity)") {
    val cands = Seq(
      (3L, 2.0, v(0, 2)),
      (1L, 1.0, v(1, 0)),
      (2L, 1.5, v(0, 1)))
    val full = RngPrune.prune(cands, 1.0, 8)
    val capped = RngPrune.prune(cands, 1.0, 2)
    assert(capped === full.take(2))
  }
}
