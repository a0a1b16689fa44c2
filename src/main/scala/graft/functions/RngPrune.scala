package graft.functions

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions.udf

import scala.collection.mutable.ArrayBuffer

/** Relative-neighborhood-graph pruning rule
  * (`AnnService/inc/Core/Common/RelativeNeighborhoodGraph.h:18-35`, and the
  * posting-assignment variant `src/Core/VectorIndex.cpp:884-986`):
  *
  * Scan candidates in ascending (dist, id) order; ACCEPT a candidate `c`
  * unless some already-accepted `a` satisfies
  * `rngFactor * d(a, c) < d(node, c)` — i.e. an accepted neighbor is
  * (factor-scaled) closer to the candidate than the node itself is, making
  * `c` redundant.
  *
  * Order-sensitive over a small bounded candidate list (ReplicaCount /
  * CEF-capped), so it runs as a per-row function over a collected candidate
  * array — not a shuffle-bearing operator.
  */
object RngPrune {

  def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Pure rule: candidates as (id, distToNode, vec), ANY order; returns
    * accepted ids in ascending (dist, id) order, at most `maxAccept`.
    */
  def prune(
      candidates: Seq[(Long, Double, Array[Double])],
      rngFactor: Double,
      maxAccept: Int): Seq[Long] = {
    val sorted = candidates.sortBy { case (id, d, _) => (d, id) }
    val acc = new ArrayBuffer[(Long, Double, Array[Double])]()
    val it = sorted.iterator
    while (it.hasNext && acc.length < maxAccept) {
      val c @ (_, dNode, vc) = it.next()
      val redundant = acc.exists { case (_, _, va) => rngFactor * l2sq(va, vc) < dNode }
      if (!redundant) acc += c
    }
    acc.map(_._1).toSeq
  }

  /** UDF over `array<struct<dist double, id bigint, vec array<float>>>`
    * (dist-first so `sort_array` orders by (dist, id)) → `array<bigint>` of
    * accepted ids.
    */
  def pruneUdf(rngFactor: Double, maxAccept: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((cands: Seq[Row]) => {
      if (cands == null) Seq.empty[Long]
      else prune(
        cands.map(r => (
          r.getLong(1),
          r.getDouble(0),
          r.getSeq[Float](2).map(_.toDouble).toArray)),
        rngFactor, maxAccept)
    })

  def apply(cands: Column, rngFactor: Double, maxAccept: Int): Column =
    pruneUdf(rngFactor, maxAccept)(cands)
}
