package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** B5: KD-tree build + tree-routed search, Spark-first.
  *
  * The reference builds per-tree recursion node-by-node: per node it computes
  * each dimension's mean and variance over the node's points, splits on a
  * top-variance dimension at that dimension's mean, and recurses
  * (`Common/KDTree.h:275-301` DivideTree, `:303-367` ChooseDivision,
  * `:369-399` SelectDivisionDimension — the reference picks RANDOMLY among
  * the top-5 variance dims; here `dimRank` makes that choice deterministic:
  * rank 0 = the max-variance dim, rank t = the (t+1)-th — multi-tree forests
  * build one tree per rank).
  *
  * Spark-native shape: the recursion is level-synchronous — ONE groupBy per
  * level computes every node's per-dimension count/sum/sum-of-squares in a
  * single map-side-partial aggregation (all 2^l nodes at once), and the
  * level's split table (≤ 2^l rows) broadcasts back to re-key each point to
  * its child node. `depth` levels = `depth` n-row aggregations — no
  * per-node jobs, no driver recursion; at 100 TB each level is one scan.
  *
  * Numeric contract (oracle-hashable like the k-means/PQ chain): on
  * integer-valued vectors every sum/sum-of-squares is float-exact and
  * order-independent, the variance PROXY `n·Σx² − (Σx)²` (= n²·var) is one
  * deterministic rounding per term, and the split value `Σx/n` is a single
  * division — so split choices and assignments are bit-identical in any
  * engine that aggregates doubles.
  *
  * Node ids: root 1, children of n are 2n / 2n+1 (left = value ≤ split);
  * the leaves of a depth-D tree are ids in [2^D, 2^{D+1}).
  */
object KdTree {

  import org.apache.spark.sql.Column

  /** `2·node + (vec[dim] ≤ val ? 0 : 1)` — the child re-assignment. */
  private def childNode(
      node: Column,
      split: (Column, Column),
      vecCol: String = "vec"): Column =
    (node * 2 + when(
      element_at(col(vecCol), split._1).cast("double") <= split._2, 0L)
      .otherwise(1L)).as("node")

  /** The root's split row as literal columns; None when the root is itself a
    * leaf (indivisible or empty corpus — no `node = 1` split row).
    */
  private def rootSplit(splits: DataFrame): Option[(Column, Column)] =
    splits.where(col("node") === 1).collect().headOption.map(r =>
      (lit(r.getAs[Int]("split_dim")), lit(r.getAs[Double]("split_val"))))

  /** Split tables broadcast up to this many nodes (rows); a deeper tree's
    * table rides a shuffle join instead — the `hierThreshold` pattern: a
    * depth-30 tree would otherwise try to broadcast 2^30 split rows.
    */
  val BroadcastNodeLimit: Long = 1L << 21

  /** Broadcast hint iff the table's node-count bound 2^depth stays under the
    * limit (arithmetic only — no count job on the hot path).
    */
  private def maybeBroadcast(splits: DataFrame, depth: Int, limit: Long): DataFrame =
    if (depth < 62 && (1L << depth) <= limit) broadcast(splits) else splits

  /** Per-level split selection + assignment. Returns
    * `(splits, assign)`: `splits(node, split_dim, split_val)` for every
    * internal node (split_dim is 1-based), and `assign(id, vec, leaf)` with
    * each point's depth-D leaf. Each level's tiny split table is eagerly
    * checkpointed so level l+1's aggregation does not recompute level l's.
    */
  def build(
      corpus: DataFrame,
      dim: Int,
      depth: Int,
      dimRank: Int = 0,
      bcastLimit: Long = BroadcastNodeLimit): (DataFrame, DataFrame) = {
    require(depth >= 1, s"depth $depth must be >= 1")
    require(dimRank >= 0 && dimRank < dim, s"dimRank $dimRank outside [0, $dim)")
    val dims = 1 to dim
    var assigned = corpus.select(
      col("id"), col("vec"), lit(1L).as("node"))
    var splitLevels = Vector.empty[DataFrame]
    for (level <- 0 until depth) {
      val x = (d: Int) => element_at(col("vec"), d).cast("double")
      val stats = assigned.groupBy(col("node")).agg(
        count(lit(1)).cast("double").as("n"),
        dims.flatMap(d => Seq(
          sum(x(d)).as(s"s$d"),
          sum(x(d) * x(d)).as(s"q$d"))): _*)
      // variance proxy n·Σx²−(Σx)² per dim; pick the dimRank-th largest
      // (ties → lowest dim: sort key (−proxy, dim) ascending)
      val ranked = array_sort(array(dims.map(d => struct(
        (-(col("n") * col(s"q$d") - col(s"s$d") * col(s"s$d"))).as("np"),
        lit(d).as("d"))): _*))
      // diversified pick with degeneracy fallback: the dimRank-th ranked dim
      // normally (tree diversity), but when THAT dim's proxy is 0 while
      // better-ranked dims still vary, fall back to the top dim — a node is
      // a leaf only when it is TRULY indivisible (every dim constant ⇒ the
      // top proxy is 0), the reference's semantics (`KDTree.h:275-301`
      // DivideTree stops only when a node cannot be divided further).
      val pick = element_at(ranked, dimRank + 1)
      val chosen = when(-pick.getField("np") > 0, pick)
        .otherwise(element_at(ranked, 1))
      // leaf-stop: a node whose chosen dim (post-fallback: its BEST dim)
      // does not vary cannot separate — emit NO split row and let its points
      // STAY at the node as their leaf. Every emitted split therefore has
      // BOTH children non-empty (mean strictly between min and max), so
      // descent can never reach an unoccupied node.
      val splits = stats
        .withColumn("split_dim", chosen.getField("d"))
        .where(-chosen.getField("np") > 0)
        .select(col("node"), col("split_dim"),
          element_at(array(dims.map(d => col(s"s$d") / col("n")): _*),
            col("split_dim")).as("split_val"))
        .localCheckpoint(true)
      splitLevels :+= splits
      // level 0 has exactly one split (the root): apply it as literals —
      // joining on the constant node key would fold into a nested-loop join
      assigned =
        if (level == 0) rootSplit(splits) match {
          case Some(rs) => assigned.select(col("id"), col("vec"),
            childNode(col("node"), rs))
          case None => assigned // indivisible root: the whole corpus is one leaf
        }
        else assigned
          .join(maybeBroadcast(splits, level, bcastLimit), Seq("node"), "left")
          .select(col("id"), col("vec"),
            when(col("split_dim").isNull, col("node"))
              .otherwise(childNode(col("node"),
                col("split_dim") -> col("split_val"))).as("node"))
    }
    (splitLevels.reduce(_ unionByName _),
      assigned.withColumnRenamed("node", "leaf"))
  }

  /** Backtracking search as dataflow (`KDTree.h:240-271` KDTSearch: the
    * best child is descended, the OTHER child enters `m_SPTQueue` with
    * `distBound + diff²` — a bounded priority queue over tree nodes). Here
    * the queue is a per-query FRONTIER of `(node, bound)` rows advanced one
    * level at a time: each node forks into both children (the preferred
    * child keeps its bound, the other adds the split-plane distance
    * `(q[dim]−split)²`), then a per-query window keeps the `beam` best
    * nodes by bound. After `depth` levels the frontier holds up to `beam`
    * candidate leaves; exact top-k runs over their union. `beam = 2^depth`
    * degenerates to exact search, `beam = 1` to [[searchLeaf]]'s descent.
    * All equi-joins against the broadcast split table + per-query windows —
    * no pair space; candidate volume is `beam · |leaf|` per query.
    */
  def searchBeam(
      queries: DataFrame,
      splits: DataFrame,
      assign: DataFrame,
      depth: Int,
      k: Int,
      beam: Int,
      metric: String = "l2sq",
      leafBuckets: Option[Int] = None,
      bcastLimit: Long = BroadcastNodeLimit): DataFrame =
    topK(beamCandidates(
      queries, splits, assign, depth, beam, metric, leafBuckets, bcastLimit), k)

  /** Multi-tree forest search (`m_iTreeNumber`, `KDTree.h:95-116` — the
    * reference builds several trees over shuffled orders and searches them
    * together; here tree t is [[build]] with `dimRank = t`, the
    * deterministic diversification). Each tree contributes its beam's
    * candidates; the union dedups on (query, id) before the final top-k —
    * per-tree dataflows are independent unions, so the plan stays
    * equi-join-only at any tree count.
    */
  def searchForest(
      queries: DataFrame,
      trees: Seq[(DataFrame, DataFrame)],
      depth: Int,
      k: Int,
      beam: Int,
      metric: String = "l2sq",
      leafBuckets: Option[Int] = None,
      bcastLimit: Long = BroadcastNodeLimit): DataFrame = {
    require(trees.nonEmpty, "forest needs at least one tree")
    val cands = trees.map { case (splits, assign) =>
      beamCandidates(queries, splits, assign, depth, beam, metric, leafBuckets,
        bcastLimit) }
    topK(cands.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("id")).agg(min(col("dist")).as("dist")), k)
  }

  private def topK(cand: DataFrame, k: Int): DataFrame =
    cand
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("dist"), col("id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("dist"))

  /** The beam descent + leaf probe, unranked: `(query_id, id, dist)`.
    * A frontier node with no split row is a terminal leaf (build emits splits
    * only for divisible nodes): it passes through the level unchanged,
    * keeping its bound — so on degenerate data every query still probes an
    * occupied node and produces results.
    */
  private def beamCandidates(
      queries: DataFrame,
      splits: DataFrame,
      assign: DataFrame,
      depth: Int,
      beam: Int,
      metric: String,
      leafBuckets: Option[Int],
      bcastLimit: Long = BroadcastNodeLimit): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("bound"), col("node"))
    var frontier = queries.select(
      col("query_id"), col("qvec"), lit(1L).as("node"), lit(0.0).as("bound"))
    for (level <- 0 until depth) {
      val withSplit =
        if (level == 0) rootSplit(splits) match {
          case Some((sd, sv)) =>
            frontier.withColumn("split_dim", sd).withColumn("split_val", sv)
          case None => frontier
            .withColumn("split_dim", lit(null).cast("int"))
            .withColumn("split_val", lit(null).cast("double"))
        }
        else frontier.join(
          maybeBroadcast(splits, depth, bcastLimit), Seq("node"), "left")
      val diff = element_at(col("qvec"), col("split_dim")).cast("double") -
        col("split_val")
      val children = withSplit
        .select(col("query_id"), col("qvec"),
          explode(when(col("split_dim").isNull,
            array(struct(col("node").as("node"), col("bound").as("bound"))))
          .otherwise(array(
            struct((col("node") * 2).as("node"),
              (col("bound") + when(diff > 0, diff * diff).otherwise(lit(0.0)))
                .as("bound")),
            struct((col("node") * 2 + 1).as("node"),
              (col("bound") + when(diff <= 0, diff * diff).otherwise(lit(0.0)))
                .as("bound"))))).as("c"))
        .select(col("query_id"), col("qvec"),
          col("c.node").as("node"), col("c.bound").as("bound"))
      frontier = children
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= beam)
        .drop("rnk")
    }
    val probes = frontier.withColumnRenamed("node", "leaf")
    // a stored tree's assign is partitioned by leaf_bucket: deriving the
    // bucket on the probe side and joining on it too lets Catalyst insert a
    // dynamic-pruning subquery over the partition column
    val (probeSide, keys) = leafBuckets match {
      case Some(b) => (probes.withColumn("leaf_bucket",
        (col("leaf") % b).cast("int")), Seq("leaf_bucket", "leaf"))
      case None => (probes, Seq("leaf"))
    }
    probeSide
      .join(assign, keys)
      .withColumn("dist", graft.functions.dist.byName(metric)(col("qvec"), col("vec")))
      .select(col("query_id"), col("id"), col("dist"))
  }

  /** Route points (`id`, `vec`) down an EXISTING split table to their leaf —
    * the delta-ingest path: appended vectors join the tree without
    * re-splitting (the reference appends into the dataset and defers
    * structural change to refine/rebuild). Same descent as the build's
    * re-keying; returns `(id, vec, leaf)`.
    */
  def assignTo(
      points: DataFrame, splits: DataFrame, depth: Int,
      bcastLimit: Long = BroadcastNodeLimit): DataFrame = {
    var routed = points.select(col("id"), col("vec"), lit(1L).as("node"))
    for (level <- 0 until depth)
      routed =
        if (level == 0) rootSplit(splits) match {
          case Some(rs) => routed.select(col("id"), col("vec"),
            childNode(col("node"), rs))
          case None => routed
        }
        // left join: a point routed into a node with no split row (terminal
        // leaf) STAYS there — appended vectors are never silently dropped
        // from the tree, matching search's terminal-leaf probe
        else routed
          .join(maybeBroadcast(splits, depth, bcastLimit), Seq("node"), "left")
          .select(col("id"), col("vec"),
            when(col("split_dim").isNull, col("node"))
              .otherwise(childNode(col("node"),
                col("split_dim") -> col("split_val"))).as("node"))
    routed.withColumnRenamed("node", "leaf")
  }

  /** A persisted tree (`KDTree.h:124-142` SaveTrees / `:144-211` LoadTrees —
    * the reference's flattened node array + per-tree start offsets become two
    * Parquet tables + a JSON scalar file).
    */
  case class Stored(splits: DataFrame, assign: DataFrame, depth: Int, leafBuckets: Int)

  /** Save the tree: `splits/` as-is (≤ 2^depth−1 rows), `assign/`
    * PARTITIONED BY the hash-bucketed leaf — the same layout trick as the
    * SPANN posting store: a stored-tree search prunes to the probed leaves'
    * directories instead of scanning the corpus. Scheme-aware Hadoop FS
    * throughout (works on hdfs:// / object stores, not just local paths).
    */
  def save(
      dir: String,
      splits: DataFrame,
      assign: DataFrame,
      depth: Int,
      leafBuckets: Int = 64): Unit = {
    val spark = splits.sparkSession
    splits.write.mode("overwrite").parquet(s"$dir/splits")
    assign
      .withColumn("leaf_bucket", (col("leaf") % leafBuckets).cast("int"))
      .write.mode("overwrite").partitionBy("leaf_bucket")
      .parquet(s"$dir/assign")
    val p = new org.apache.hadoop.fs.Path(s"$dir/config.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"""{"depth":$depth,"leafBuckets":$leafBuckets}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Stored = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/config.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val json = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    def intOf(key: String): Int = {
      val m = s""""$key":\\s*(-?\\d+)""".r.findFirstMatchIn(json)
      m.map(_.group(1).toInt).getOrElse(
        throw new IllegalArgumentException(s"missing $key in $dir/config.json"))
    }
    Stored(
      spark.read.parquet(s"$dir/splits"),
      spark.read.parquet(s"$dir/assign"),
      intOf("depth"), intOf("leafBuckets"))
  }

  /** [[searchBeam]] over a stored tree: the routed frontier carries the
    * derived `leaf_bucket`, so the assign join keys on the PARTITION column
    * too — Catalyst inserts a dynamic-pruning subquery and the scan touches
    * only the probed leaves' directories (the page-selective read).
    */
  def searchStored(
      queries: DataFrame,
      st: Stored,
      k: Int,
      beam: Int,
      metric: String = "l2sq"): DataFrame =
    searchBeam(queries, st.splits,
      st.assign.select(col("id"), col("vec"), col("leaf"), col("leaf_bucket")),
      st.depth, k, beam, metric, leafBuckets = Some(st.leafBuckets))

  /** Tree-only search (the KDT analog of SearchTree, `KDTree.h:214-272`
    * descent without backtracking): route each query down the split table to
    * its leaf, then exact top-k among that leaf's points. The leaf join is an
    * equi-join on the leaf id — with `assign` stored partitioned by leaf this
    * is the same partition-pruned probe as the SPANN posting read; recall is
    * bounded by the single-leaf probe, the documented tree-only semantics.
    */
  def searchLeaf(
      queries: DataFrame,
      splits: DataFrame,
      assign: DataFrame,
      depth: Int,
      k: Int,
      metric: String = "l2sq",
      bcastLimit: Long = BroadcastNodeLimit): DataFrame = {
    var routed = queries.select(
      col("query_id"), col("qvec"), lit(1L).as("node"))
    for (level <- 0 until depth)
      routed =
        if (level == 0) rootSplit(splits) match {
          case Some(rs) => routed.select(col("query_id"), col("qvec"),
            childNode(col("node"), rs, vecCol = "qvec"))
          case None => routed
        }
        // left join: a query reaching a terminal (split-less) leaf stops
        // there and probes it — occupied by construction, so every query
        // produces k results even on degenerate data
        else routed
          .join(maybeBroadcast(splits, depth, bcastLimit), Seq("node"), "left")
          .select(col("query_id"), col("qvec"),
            when(col("split_dim").isNull, col("node"))
              .otherwise(childNode(col("node"),
                col("split_dim") -> col("split_val"), vecCol = "qvec"))
              .as("node"))
    val cand = routed.withColumnRenamed("node", "leaf")
      .join(assign, Seq("leaf"))
      .withColumn("dist", graft.functions.dist.byName(metric)(col("qvec"), col("vec")))
    cand
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("dist"), col("id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("dist"))
  }
}
