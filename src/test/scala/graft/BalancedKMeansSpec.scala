package graft

import org.apache.spark.sql.functions._

import graft.operators.BalancedKMeans

/** Balance-penalized Lloyd's (`BKTree.h:466-499`, λ penalty `:125-197`). */
class BalancedKMeansSpec extends SparkSpec {
  import spark.implicits._

  // two tight blobs: ids 0..49 at ~(0,0), ids 50..99 at ~(100,100)
  private def blobs = spark.range(100).select(
    col("id"),
    array(
      (when(col("id") < 50, 0.0).otherwise(100.0) + col("id") % 5).cast("float"),
      (when(col("id") < 50, 0.0).otherwise(100.0) + (col("id") / 7) % 3).cast("float")
    ).as("vec"))

  test("converges to the two blob centers") {
    val centers = BalancedKMeans.fit(blobs, 2, maxIter = 5)
    val cs = centers.orderBy("cluster_id").collect()
    assert(cs.length === 2)
    val c0 = cs.map(_.getSeq[Double](1).head).sorted
    assert(c0(0) < 10 && c0(1) > 90)
    // each cluster got half the points
    assert(cs.map(_.getLong(2)).toSet === Set(50L, 50L))
  }

  test("lambda penalty balances skewed assignment") {
    // one giant blob + tiny outlier cluster: unpenalized k-means leaves the
    // outlier center nearly empty; the λ·count penalty pushes toward balance
    val skewed = spark.range(100).select(
      col("id"),
      array(
        (when(col("id") < 95, lit(0.0)).otherwise(50.0) + col("id") % 10).cast("float"),
        lit(0f)).as("vec"))
    val c0 = BalancedKMeans.fit(skewed, 2, maxIter = 4, lambda = 0.0)
    val cBal = BalancedKMeans.fit(skewed, 2, maxIter = 4, lambda = 5.0)
    val skew0 = BalancedKMeans.sizeSkew(
      BalancedKMeans.assign(skewed, c0, 0.0))
    val skewBal = BalancedKMeans.sizeSkew(
      BalancedKMeans.assign(skewed, cBal, 5.0))
    assert(skewBal <= skew0 + 1e-9, s"penalized skew $skewBal > plain $skew0")
  }

  test("assignment is deterministic (fixed seed ids, tie-break by cluster)") {
    val a = BalancedKMeans.fit(blobs, 2, maxIter = 3).collect().toSet
    val b = BalancedKMeans.fit(blobs, 2, maxIter = 3).collect().toSet
    assert(a === b)
  }
}
