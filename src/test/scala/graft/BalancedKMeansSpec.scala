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

  test("fitAuto picks a positive λ that strictly improves balance (DynamicFactorSelect)") {
    // dense blob (90 pts, x∈0..9) + sparse shoulder (10 pts, x∈15..24):
    // unpenalized Lloyd settles on the lopsided natural split; the ladder
    // sweep must find a λ whose partition (assigned AT that λ — what B14's
    // writePartitioned uses) is strictly more even, without the oscillating
    // high-λ candidates (degenerate all-in-one flips, skew 1 under the
    // empty-cluster-aware criterion) ever winning
    val skewed = spark.range(100).select(
      col("id"),
      array(
        (when(col("id") < 90, lit(0.0)).otherwise(15.0) + col("id") % 10).cast("float"),
        lit(0f)).as("vec"))
    val (lam, centers) = BalancedKMeans.fitAuto(skewed, 2, maxIter = 4)
    val c0 = BalancedKMeans.fit(skewed, 2, maxIter = 4, lambda = 0.0)
    val skewAuto = BalancedKMeans.sizeSkew(BalancedKMeans.assign(skewed, centers, lam), 2)
    val skew0 = BalancedKMeans.sizeSkew(BalancedKMeans.assign(skewed, c0), 2)
    info(s"chosen λ=$lam skew=$skewAuto vs λ=0 skew=$skew0")
    assert(lam > 0.0, s"auto-tune fell back to λ=0 (skew $skewAuto vs $skew0)")
    assert(skewAuto < skew0, s"chosen λ=$lam skew $skewAuto !< λ=0 skew $skew0")
    // and the balance is nearly free here: distortion stays within a few
    // percent of the unpenalized optimum (equal-or-better criterion margin)
    val dAuto = BalancedKMeans.distortion(BalancedKMeans.assign(skewed, centers, lam))
    val d0 = BalancedKMeans.distortion(BalancedKMeans.assign(skewed, c0))
    assert(dAuto <= d0 * 1.2, s"distortion $dAuto vs λ=0 $d0")
    // deterministic: same ladder, same pick
    assert(BalancedKMeans.fitAuto(skewed, 2, maxIter = 4)._1 === lam)
  }

  test("assignment is deterministic (fixed seed ids, tie-break by cluster)") {
    val a = BalancedKMeans.fit(blobs, 2, maxIter = 3).collect().toSet
    val b = BalancedKMeans.fit(blobs, 2, maxIter = 3).collect().toSet
    assert(a === b)
  }
}
