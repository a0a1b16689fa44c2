package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{dist, Hash60, RngPrune, TopKByDistance}

/** k-NN-graph construction (B2/B3/B4,
  * `Common/NeighborhoodGraph.h:301-360` BuildInitKNNGraph + `:460-532`
  * RefineGraph + `RelativeNeighborhoodGraph.h:18-35`).
  *
  * The reference builds the initial graph with `TPTNumber` random-projection
  * trees: partition to ≤`TPTLeafSize` leaves, brute-force all pairs within a
  * leaf, keep the best neighbors per node, union across trees. The
  * Spark-native translation keeps that exact dataflow — partition, self-join
  * within partition, bounded top-k, union — but derives the leaf from
  * deterministic md5-seeded hyperplane codes instead of random median splits,
  * so the whole build is reproducible (and oracle-checkable) while keeping
  * the same locality property (nearby vectors co-bucket with high
  * probability; multiple trees = multiple independent plane sets).
  *
  * Scale: each tree's self-join is bucketed — shuffle ∝ corpus size; pair
  * work ∝ Σ bucket², bounded by the plane count (2^planes buckets).
  */
object KnnGraph {

  /** Integer hyperplane weight for (tree, plane, dim) — md5-seeded, engine
    * independent (mirrors `Hash60.sql("t||'_'||p||'_'||d") % 2001 - 1000`).
    */
  def planeWeight(tree: Int, plane: Int, d: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${tree}_${plane}_$d".getBytes("UTF-8"))
    java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.take(15), 16) % 2001 - 1000
  }

  /** Per-tree leaf code: sign bits of `planes` integer-exact projections of
    * the (×1000, rounded) quantized vector.
    */
  def leafCode(vec: Column, tree: Int, planes: Int, dims: Int): Column = {
    val q = transform(vec, v => round(v.cast("double") * 1000).cast("long"))
    (0 until planes).map { p =>
      val dot = (0 until dims).map(d =>
        element_at(q, d + 1) * lit(planeWeight(tree, p, d))).reduce(_ + _)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Initial kNN graph: `(src, rank, dst, dist)`, ≤ neighborhoodSize edges
    * per node, ascending (dist, dst); self-edges excluded.
    */
  def build(
      vectors: DataFrame, // (id, vec)
      dims: Int,
      neighborhoodSize: Int,
      trees: Int = 2,
      planes: Int = 8,
      metric: String = "l2sq"): DataFrame = {
    val perTree = (0 until trees).map { t =>
      vectors.select(col("id"), col("vec"),
        leafCode(col("vec"), t, planes, dims).as("leaf"))
    }
    val pairs = perTree.map { leaves =>
      val l = leaves.select(col("leaf"), col("id").as("src"), col("vec").as("svec"))
      val r = leaves.select(col("leaf"), col("id").as("dst"), col("vec").as("dvec"))
      l.join(r, Seq("leaf"))
        .where(col("src") =!= col("dst"))
        .select(col("src"), col("dst"),
          dist.byName(metric)(col("svec"), col("dvec")).as("d"))
    }.reduce(_ unionByName _)
    // a pair may surface from several trees — the bounded top-k's (dist, id)
    // dedup-by-min makes repeats harmless, but distinct first keeps the
    // aggregate's input minimal
    val uniq = pairs.distinct()
    Knn.explodeRanked(
      uniq.groupBy(col("src").as("query_id"))
        .agg(TopKByDistance.topk(col("dst"), col("d"), neighborhoodSize).as("nn")))
      .withColumnsRenamed(Map("query_id" -> "src", "id" -> "dst"))
  }

  /** RNG refine (B3): prune each node's neighbor list with the relative
    * neighborhood rule (an accepted closer neighbor that is closer to the
    * candidate than the node itself makes the candidate redundant).
    * edges `(src, dst, dist)` + vectors → `(src, dst)` accepted, in
    * acceptance order.
    */
  def rngRefine(
      edges: DataFrame,
      vectors: DataFrame,
      rngFactor: Double = 1.0,
      maxNeighbors: Int = 32): DataFrame = {
    val withVec = edges
      .join(vectors.select(col("id").as("dst"), col("vec").as("dvec")), Seq("dst"))
    val cands = withVec
      .groupBy(col("src"))
      .agg(sort_array(collect_list(struct(
        col("dist").cast("double").as("dist"),
        col("dst").as("cid"), col("dvec").as("cvec")))).as("cands"))
    cands
      .withColumn("accepted", RngPrune(col("cands"), rngFactor, maxNeighbors))
      .select(col("src"), posexplode(col("accepted")).as(Seq("pos", "dst")))
      .select(col("src"), (col("pos") + 1).cast("int").as("rank"), col("dst"))
  }

  /** In-degree-balanced rebuild (B4, `NeighborhoodGraph.h:404-458`): halve
    * each node's neighbor list, keeping low-in-degree targets first.
    */
  def rebuildBalanced(edges: DataFrame, neighborhoodSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val inDeg = edges.groupBy(col("dst")).agg(count(lit(1)).as("in_deg"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("in_deg"), col("dist"), col("dst"))
    edges.join(inDeg, Seq("dst"))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= neighborhoodSize / 2)
      .select(col("src"), col("dst"), col("dist"))
  }
}
