package graft

import graft.functions.PCA

class PCASpec extends SparkSpec {

  test("fit recovers an exactly-diagonal covariance: axis components in " +
      "variance order, exact eigenvalues, orthonormal basis") {
    import spark.implicits._
    // one nonzero coordinate per point → cross-moments are exactly 0;
    // cov = diag(2·v_i²/n) with n = 8 points, v = (4, 1, 3, 2)
    val v = Seq(4.0, 1.0, 3.0, 2.0)
    val pts = v.zipWithIndex.flatMap { case (x, i) =>
      Seq(Array.tabulate(4)(j => if (j == i) x else 0.0),
        Array.tabulate(4)(j => if (j == i) -x else 0.0))
    }
    val m = PCA.fit(pts.map(p => Tuple1(p.toSeq)).toDF("vec"), 4)
    // descending variance: dims 0 (16), 2 (9), 3 (4), 1 (1), each ·2/8
    assert(m.varExplained.map(x => math.round(x * 1e9) / 1e9).toSeq ===
      Seq(4.0, 2.25, 1.0, 0.25))
    val expectAxes = Seq(0, 2, 3, 1)
    m.components.zip(expectAxes).foreach { case (c, ax) =>
      assert(math.abs(c(ax) - 1.0) < 1e-9, s"axis $ax: ${c.toSeq}")
      c.indices.filter(_ != ax).foreach(j => assert(math.abs(c(j)) < 1e-9))
    }
    // orthonormal rows
    for (a <- m.components.indices; b <- m.components.indices) {
      val dot = m.components(a).zip(m.components(b)).map(t => t._1 * t._2).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9)
    }
    assert(m.mean.forall(x => math.abs(x) < 1e-12))
  }

  test("fit finds an oblique principal direction; the mean is removed") {
    import spark.implicits._
    // points along (1,2)/√5 through an offset, ± symmetric → exact line
    val dir = Array(1.0 / math.sqrt(5), 2.0 / math.sqrt(5))
    val off = Array(10.0, -3.0)
    val pts = Seq(-3.0, -1.0, 1.0, 3.0).map(t =>
      Seq(off(0) + t * dir(0), off(1) + t * dir(1)))
    val m = PCA.fit(pts.map(Tuple1(_)).toDF("vec"), 1)
    assert(math.abs(m.components(0)(0) - dir(0)) < 1e-9 &&
      math.abs(m.components(0)(1) - dir(1)) < 1e-9)
    assert(math.abs(m.mean(0) - 10.0) < 1e-9 &&
      math.abs(m.mean(1) + 3.0) < 1e-9)
    // variance along the line: mean of t² = (9+1+1+9)/4 = 5
    assert(math.abs(m.varExplained(0) - 5.0) < 1e-9)
  }

  test("fit diagonalizes an equal-variance covariance (Jacobi theta = 0): " +
      "cov [[1, .5], [.5, 1]] has eigenpairs 1.5/(1,1)·√½ and 0.5") {
    import spark.implicits._
    // four points with exact sample cov (÷n) = [[1, 0.5], [0.5, 1]]:
    // ±(a, b), ±(b, a) with a+b, a−b solving a²+b²=2, 2ab=1.
    // Equal diagonal entries make the Jacobi theta EXACTLY 0 — the rotation
    // must take the explicit 45° branch (t = 1) or the off-diagonal never
    // annihilates and fit silently returns the identity basis (r9 advice).
    val a = (math.sqrt(3.0) + 1.0) / 2.0
    val b = (math.sqrt(3.0) - 1.0) / 2.0
    val pts = Seq(Seq(a, b), Seq(-a, -b), Seq(b, a), Seq(-b, -a))
    val m = PCA.fit(pts.map(Tuple1(_)).toDF("vec"), 2)
    assert(math.abs(m.varExplained(0) - 1.5) < 1e-9 &&
      math.abs(m.varExplained(1) - 0.5) < 1e-9,
      s"eigenvalues: ${m.varExplained.toSeq}")
    val h = math.sqrt(0.5)
    assert(math.abs(m.components(0)(0) - h) < 1e-9 &&
      math.abs(m.components(0)(1) - h) < 1e-9,
      s"top component: ${m.components(0).toSeq}")
    assert(math.abs(math.abs(m.components(1)(0)) - h) < 1e-9 &&
      math.abs(m.components(1)(0) + m.components(1)(1)) < 1e-9,
      s"second component: ${m.components(1).toSeq}")
  }

  test("project preserves pairwise L2 distances for data of exact rank k; " +
      "fit is deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 3-D points confined to a 2-D subspace span{(1,1,0),(0,1,1)}
    val pts = (1 to 40).map { i =>
      val (a, b) = (rnd.nextDouble() * 4 - 2, rnd.nextDouble() * 4 - 2)
      (i.toLong, Seq(a, a + b, b))
    }
    val df = pts.toDF("id", "vec")
    val m = PCA.fit(df, 2)
    val m2 = PCA.fit(df, 2)
    assert(m.components.map(_.toSeq).toSeq === m2.components.map(_.toSeq).toSeq)
    val proj = PCA.project(df, m, scale = 9).select("id", "proj")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val orig = pts.toMap
    def d2(x: Seq[Double], y: Seq[Double]) =
      x.zip(y).map(t => (t._1 - t._2) * (t._1 - t._2)).sum
    for (i <- 1L to 10L; j <- (i + 1) to 10L) {
      assert(math.abs(d2(orig(i), orig(j)) - d2(proj(i), proj(j))) < 1e-6,
        s"pair ($i,$j)")
    }
  }

  test("whiten: each whitened coordinate has unit variance; equals project " +
      "scaled by the literal factors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // anisotropic 2-D cloud: x ~ ±10, y ~ ±1
    val pts = (1 to 200).map(i =>
      (i.toLong, Seq(rnd.nextDouble() * 20 - 10, rnd.nextDouble() * 2 - 1)))
    val df = pts.toDF("id", "vec")
    val m = PCA.fit(df, 2)
    val white = PCA.whiten(df, m, scale = 9).select("id", "white")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // population variance of each whitened coordinate ≈ 1 (λ/(λ+eps) ≈ 1)
    for (jdx <- 0 until 2) {
      val xs = white.values.map(_(jdx)).toSeq
      val mean = xs.sum / xs.size
      val v = xs.map(x => (x - mean) * (x - mean)).sum / xs.size
      assert(math.abs(v - 1.0) < 1e-4, s"dim $jdx variance $v")
    }
    // whiten ≡ project × 1/sqrt(λ+eps), coordinate-wise (before rounding)
    val proj = PCA.project(df, m, scale = 9).select("id", "proj")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for (i <- 1L to 20L; jdx <- 0 until 2) {
      val w = 1.0 / math.sqrt(m.varExplained(jdx) + 1e-9)
      assert(math.abs(white(i)(jdx) - proj(i)(jdx) * w) < 1e-6,
        s"id $i dim $jdx")
    }
  }
}
