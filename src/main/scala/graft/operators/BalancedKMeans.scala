package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.dist

/** Balance-penalized Lloyd's k-means in DataFrames (B1/B14, the reference's
  * BKTree clustering: `AnnService/inc/Core/Common/BKTree.h:466-499` with the
  * λ·count balance penalty of `:125-197` and the MPI partitioner
  * `src/BalancedDataPartition/main.cpp:151-310`).
  *
  * Per iteration: broadcast the k centers (+ their previous-iteration
  * cluster sizes), assign each point to `argmin(dist + λ·count)`, recompute
  * centers as per-dimension means. Deterministic: seeded by "first k ids",
  * ties broken by cluster_id. `localCheckpoint` truncates the iterative
  * lineage so the plan stays small (SURVEY.md §7 hard-parts note).
  *
  * At 100 TB: the corpus never leaves the executors — only the k centers
  * (k ≤ heads ratio · n, broadcastable by construction) round-trip.
  */
object BalancedKMeans {

  /** points(id, vec) → centers(cluster_id BIGINT, center ARRAY<DOUBLE>, count BIGINT) */
  def fit(
      points: DataFrame,
      k: Int,
      maxIter: Int = 5,
      lambda: Double = 0.0,
      metric: String = "l2sq"): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    // deterministic init: the k smallest-id points are the seed centers.
    // k rows by contract (centers broadcast every iteration), so the
    // collect is bounded; numbering driver-side avoids a single-partition
    // row_number window in the plan.
    val seed = points.orderBy(col("id")).limit(k)
      .select(col("vec").cast("array<double>")).collect()
    var centers = seed.toSeq.zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Double](0), 0L) }
      .toDF("cluster_id", "center", "count")
      .localCheckpoint(true)

    var iter = 0
    while (iter < maxIter) {
      val assigned = assign(points, centers, lambda, metric)
      centers = recomputeCenters(assigned, centers)
        .localCheckpoint(true)
      iter += 1
    }
    centers
  }

  /** One assignment step: `(id, vec, cluster_id, dist)`; cost =
    * dist + λ·count(cluster) with count from the centers frame.
    *
    * argmin via `min_by(struct(...), struct(cost, cluster_id))`: a declarative
    * aggregate with map-side partials, so ONE exchange of n rows — the
    * row_number-window formulation shuffled all n·k scored rows per call
    * (maxIter× inside [[fit]]). Ties break on cluster_id, same as the window's
    * (cost, cluster_id) order.
    */
  def assign(
      points: DataFrame,
      centers: DataFrame,
      lambda: Double = 0.0,
      metric: String = "l2sq"): DataFrame =
    points.crossJoin(broadcast(centers))
      .withColumn("dist", dist.byName(metric)(col("vec"), col("center")))
      .withColumn("cost", col("dist") + lit(lambda) * col("count"))
      .groupBy(col("id"))
      .agg(min_by(
        struct(col("vec"), col("cluster_id"), col("dist")),
        struct(col("cost"), col("cluster_id"))).as("best"))
      .select(col("id"), col("best.vec").as("vec"),
        col("best.cluster_id").as("cluster_id"), col("best.dist").as("dist"))

  /** groupBy(cluster) per-dimension mean as FLAT sum columns (dims are known
    * from the centers): map-side partial sums, ONE exchange of k rows — the
    * posexplode formulation pushed n·dims rows through the shuffle every
    * Lloyd iteration. Same doubles (sum/count division, exactly what avg
    * computes). A cluster that received zero points keeps its previous
    * center (count 0) instead of vanishing — k is stable across iterations,
    * matching the unrolled-Lloyd oracle's coalesce.
    */
  private def recomputeCenters(assigned: DataFrame, prev: DataFrame): DataFrame = {
    val dim = prev.select(size(col("center"))).head.getInt(0)
    val sums = (0 until dim).map(i =>
      sum(col("vec").getItem(i).cast("double")).as(s"_s$i"))
    val upd = assigned
      .groupBy(col("cluster_id"))
      .agg(sums.head, (sums.tail :+ count(lit(1)).as("_n")): _*)
      .select(col("cluster_id"),
        array((0 until dim).map(i => col(s"_s$i") / col("_n")): _*).as("center"),
        col("_n").as("count"))
    prev.select(col("cluster_id"),
        col("center").as("_prev_center"))
      .join(upd, Seq("cluster_id"), "left")
      .select(col("cluster_id"),
        coalesce(col("center"), col("_prev_center")).as("center"),
        coalesce(col("count"), lit(0L)).as("count"))
  }

  /** B14 (`src/BalancedDataPartition/main.cpp:29-66`): balanced distributed
    * partition — assign every vector to its (λ-balanced) cluster and write
    * one partition directory per cluster (the MPI tool's per-cluster files
    * become a `partitionBy` layout any engine can selectively read).
    */
  def writePartitioned(
      points: DataFrame,
      centers: DataFrame,
      path: String,
      lambda: Double = 0.0,
      metric: String = "l2sq"): Unit =
    assign(points, centers, lambda, metric)
      .write.mode("overwrite").partitionBy("cluster_id").parquet(path)

  /** Mean distance of points to their assigned center (distortion diagnostic). */
  def distortion(assigned: DataFrame): Double =
    assigned.agg(avg(col("dist"))).head().getDouble(0)

  /** λ auto-tune (the reference's DynamicFactorSelect, `BKTree.h:434-463`):
    * fit once per candidate penalty and keep the λ minimizing the
    * cluster-size skew — stddev/avg over ALL k clusters, the reference's
    * CountStd criterion — of the partition the pipeline would actually use
    * (`assign` at that same λ; the reference scores a penalty-free final
    * pass, `BKTree.h:388-399`, but its sequential in-pass count updates
    * damp the penalty in a way a batch declarative assignment cannot —
    * scoring OUR λ-assignment is the faithful criterion for B14's
    * `writePartitioned`, which partitions with the chosen λ). Ties prefer
    * the smaller λ (least distortion interference).
    *
    * Candidates are λ = f·c/n, mirroring the reference's Base²/factor/size
    * ladder (`BKTree.h:352`) with `c` = the corpus' mean squared norm — the
    * float-data analogue of the fixed-value-range Base² constant. Everything
    * is deterministic: fixed ladder, seeded fits, declarative aggregates.
    *
    * Cost = `factors.size` full fits; at corpus scale pass a (deterministic)
    * sample as `points` — the reference likewise tunes on a 1000-row batch.
    * Returns (chosenLambda, centers-of-that-fit).
    */
  def fitAuto(
      points: DataFrame,
      k: Int,
      maxIter: Int = 5,
      metric: String = "l2sq",
      factors: Seq[Double] = Seq(0.0, 1.0, 10.0, 100.0)): (Double, DataFrame) = {
    val stats = points.agg(
      avg(aggregate(col("vec").cast("array<double>"), lit(0.0),
        (acc, x) => acc + x * x)).as("c"),
      count(lit(1)).as("n")).head()
    val c = stats.getDouble(0)
    val n = stats.getLong(1).toDouble
    val best = factors.map { f =>
      val lam = f * c / n
      val centers = fit(points, k, maxIter, lam, metric)
      val skew = sizeSkew(assign(points, centers, lam, metric), k)
      (skew, lam, centers)
    }.minBy(t => (t._1, t._2))
    (best._2, best._3)
  }

  /** [[sizeSkew]] counting EMPTY clusters too (the reference's CountStd
    * divides by the full _DK, `BKTree.h:400-408`) — without this a
    * degenerate fit that starves k−1 clusters scores a perfect 0.
    */
  def sizeSkew(assigned: DataFrame, k: Int): Double = {
    val counts = assigned.groupBy(col("cluster_id")).count()
      .collect().map(_.getLong(1)) // ≤ k rows by construction
    val all = counts ++ Array.fill(k - counts.length)(0L)
    val avgC = all.sum.toDouble / k
    val sd = math.sqrt(all.map(c => (c - avgC) * (c - avgC)).sum / k)
    sd / math.max(avgC, 1e-9)
  }

  /** Balance diagnostic: stddev/avg of cluster sizes (lower = more balanced).
    * NOTE: sees only non-empty clusters; prefer the k-aware overload when a
    * cluster could starve.
    */
  def sizeSkew(assigned: DataFrame): Double = {
    val sizes = assigned.groupBy(col("cluster_id")).count()
      .agg(stddev_pop(col("count")).as("sd"), avg(col("count")).as("m"))
      .head()
    val sd = Option(sizes.getDouble(0)).getOrElse(0.0)
    sd / math.max(sizes.getDouble(1), 1e-9)
  }
}
