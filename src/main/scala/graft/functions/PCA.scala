package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Principal-component dimensionality reduction for embedding columns —
  * the data-dependent sibling of
  * [[graft.operators.SimilaritySearch.rpSearch]]'s random projection:
  * learn the
  * variance-maximizing orthonormal basis from the corpus, project onto the
  * top `k` directions. The standard recall-preserving shrink step in front
  * of brute-force / IVF search, and the whitening half of OPQ-style
  * pipelines (the reference trains its rotation the same
  * center-then-diagonalize way, `AnnService/inc/Core/Common/OPQQuantizer.h`
  * provenance on [[PQ.trainOpq]]).
  *
  * Distributed shape (the Gram-partials pattern): `fit` runs ONE pass that
  * reduces each partition to a `(d² gram, d sum, count)` partial inside
  * `mapPartitions` — so the cluster exchanges `#partitions` rows of ~d²
  * doubles, never `n·d²` exploded cells and never 4096 flat agg columns
  * through codegen (at ten-thousand-partition scale, interpose one
  * element-wise-sum reduction keyed by `partition_id % √P` before the
  * collect — the standard tree-reduce step; at local[32] the direct
  * collect is 32 × ~33 KB) — then diagonalizes the d×d covariance on the
  * driver
  * (cyclic Jacobi; d is model-sized by contract, the same bounded-driver
  * adjudication as k-means centroids). `project` broadcasts the model as
  * literal arrays and runs as per-row dot products in whole-stage codegen;
  * nothing shuffles.
  *
  * Determinism: partial Grams are summed in a FIXED partition order on the
  * driver (sortBy partition id), Jacobi sweeps are cyclic with a fixed
  * rotation-sign convention (largest-|component| coordinate made
  * positive), so the model is bit-stable run-to-run on the same data
  * layout.
  */
object PCA {

  /** `components` row-major `k × d` (orthonormal rows, descending
    * eigenvalue); `varExplained` the matching covariance eigenvalues.
    */
  final case class Model(mean: Array[Double], components: Array[Array[Double]],
      varExplained: Array[Double])

  def fit(vecs: DataFrame, k: Int, vecCol: String = "vec"): Model = {
    val d = vecs.select(size(col(vecCol))).head.getInt(0)
    require(k >= 1 && k <= d, s"k=$k out of range for dim $d")
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val encIn: org.apache.spark.sql.Encoder[Seq[Double]] = ExpressionEncoder()
    val encOut: org.apache.spark.sql.Encoder[Array[Double]] = ExpressionEncoder()
    // one partial per partition: [gram(d²) | sum(d) | count(1)] as doubles
    val partials = vecs.select(col(vecCol).cast("array<double>"))
      .as(encIn)
      .mapPartitions { it =>
        val acc = new Array[Double](d * d + d + 1)
        it.foreach { v =>
          var i = 0
          while (i < d) {
            val xi = v(i)
            var j = i
            while (j < d) { acc(i * d + j) += xi * v(j); j += 1 }
            acc(d * d + i) += xi
            i += 1
          }
          acc(d * d + d) += 1.0
        }
        Iterator.single(acc)
      }(encOut)
      .collect()
    val tot = new Array[Double](d * d + d + 1)
    partials.foreach { p => var i = 0; while (i < tot.length) { tot(i) += p(i); i += 1 } }
    val n = tot(d * d + d)
    require(n > 0, "empty input")
    val mean = Array.tabulate(d)(i => tot(d * d + i) / n)
    // covariance (upper triangle was accumulated; mirror it)
    val cov = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val c = tot(i * d + j) / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (vals, vecsM) = jacobiEigen(cov)
    val order = vals.indices.sortBy(i => -vals(i)).take(k)
    val comps = order.map { ei =>
      val v = Array.tabulate(d)(r => vecsM(r)(ei))
      // sign convention: the largest-|x| coordinate is positive
      val m = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(m) < 0) v.map(x => -x) else v
    }.toArray
    Model(mean, comps, order.map(vals).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (in-place on a
    * copy): returns (eigenvalues, column-eigenvector matrix). O(d³) per
    * sweep, driver-side, d model-sized.
    */
  private[graft] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < 64 && offDiag(a) > 1e-12) {
      for (p <- 0 until d - 1; q <- p + 1 until d if math.abs(a(p)(q)) > 1e-15) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        // theta == 0 (equal diagonal entries) needs the explicit 45° rotation
        // t = 1: signum(0) = 0 would make the rotation a no-op and the pair
        // would never be annihilated (Numerical Recipes §11.1 convention)
        val t =
          if (theta == 0.0) 1.0
          else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        var i = 0
        while (i < d) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq; a(i)(q) = s * aip + c * aiq
          i += 1
        }
        i = 0
        while (i < d) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = c * api - s * aqi; a(q)(i) = s * api + c * aqi
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq; v(i)(q) = s * vip + c * viq
          i += 1
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }

  /** Project `vecCol` onto the model's components: `out_j = (x − μ)·c_j`,
    * each coordinate rounded to `scale` dp for engine-stable downstream
    * compares. Pure per-row codegen expressions — the model rides as
    * literal arrays.
    */
  def project(df: DataFrame, model: Model, vecCol: String = "vec",
      outCol: String = "proj", scale: Int = 6): DataFrame =
    // one compact expression, not per-(component, dim) literal chains: the
    // unrolled form generated >64 KB methods (Janino limit) and knocked the
    // stage out of whole-stage codegen; math is bit-identical (see
    // CenteredProjectExpr)
    df.withColumn(outCol, org.apache.spark.sql.graft.ColumnShim.column(
      CenteredProjectExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(col(vecCol)),
        model.mean, model.components,
        Array.fill(model.components.length)(1.0), scale)))

  /** Whitened projection: [[project]]'s coordinates scaled to unit
    * variance — coordinate j multiplies by the driver-precomputed literal
    * `1/√(λ_j + eps)` (eps guards near-zero components). The standard
    * embedding preprocessing before cosine dedup/retrieval: without it one
    * dominant variance direction carries every similarity score
    * (SemDeDup-style pipelines whiten first). Same broadcast-literal
    * per-row codegen shape as [[project]]; nothing shuffles, and the
    * fitted factors are pure literals so the whole chain stays
    * dynamic-oracle-checkable (the q217 contract).
    */
  def whiten(df: DataFrame, model: Model, eps: Double = 1e-9,
      vecCol: String = "vec", outCol: String = "white",
      scale: Int = 6): DataFrame = {
    val w = model.varExplained.map(v => 1.0 / math.sqrt(v + eps))
    df.withColumn(outCol, org.apache.spark.sql.graft.ColumnShim.column(
      CenteredProjectExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(col(vecCol)),
        model.mean, model.components, w, scale)))
  }
}
