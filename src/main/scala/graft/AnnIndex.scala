package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Eval, Knn, Mutations, Spann}
import graft.sources.IndexStore

/** User-facing index facade — the Spark-native analogue of the reference's
  * `AnnIndex` wrapper (`Wrappers/inc/CoreInterface.h:14-87`): create with
  * (dimension, metric), set build params, `build`, `search` /
  * `searchWithMeta` / `batchSearch`, `add` / `deleteByIds` /
  * `deleteByVector`, `save` / `load`, `refineIndex`.
  *
  * Instances are immutable: every mutation returns a new `AnnIndex` view
  * over the updated logical tables (Spark frames are immutable; the
  * reference mutates under locks — same observable semantics, no locks).
  *
  * State: `vectors(id, vec[, meta])`, tombstones `deletes(id)`, and the
  * SPANN artifacts `heads`/`postings` (rebuilt on `build`, incrementally
  * extended on `add`).
  */
class AnnIndex private (
    val spark: SparkSession,
    val conf: GraftConf,
    val vectors: DataFrame,
    val deleted: DataFrame,
    val heads: Option[DataFrame],
    val postings: Option[DataFrame],
    val quantizer: Option[graft.functions.PQ.RotatedCodebooks] = None) {

  private def copy(
      vectors: DataFrame = vectors,
      deleted: DataFrame = deleted,
      heads: Option[DataFrame] = heads,
      postings: Option[DataFrame] = postings,
      quantizer: Option[graft.functions.PQ.RotatedCodebooks] = quantizer): AnnIndex =
    new AnnIndex(spark, conf, vectors, deleted, heads, postings, quantizer)

  def setParameter(name: String, value: String): AnnIndex =
    new AnnIndex(spark, conf.set(name, value), vectors, deleted, heads, postings, quantizer)
  def getParameter(name: String): String = conf.get(name)

  def count: Long = Mutations.liveView(vectors, deleted).count()

  /** BuildIndex: select heads (ratio-sized) + assign postings. A head set
    * beyond `conf.hierThreshold` assigns through the routed two-level path
    * ([[Spann.buildPostingsHier]]) — the build never broadcasts a head set
    * the search side wouldn't.
    */
  def build(): AnnIndex = {
    val live = Mutations.liveView(vectors, deleted)
    val everyNth = math.max((1.0 / conf.headRatio).round.toInt, 1)
    val h = Spann.selectHeadsModulo(live, everyNth)
    val raw = hierOver(h) match {
      case Some((sh, routing)) =>
        Spann.buildPostingsHier(live, sh, routing, conf.replicaCount,
          conf.superK, conf.metric)
      case None =>
        Spann.buildPostings(live, h, conf.replicaCount, conf.metric)
    }
    val p = Spann.truncatePostings(raw, conf.postingLimit)
    // eager checkpoint: materialize under this plan's own execution (a lazy
    // one would compute inside a later search and log unregistered-accumulator
    // errors from DAGScheduler)
    copy(heads = Some(h), postings = Some(p.localCheckpoint(true)))
  }

  private def requireBuilt(): (DataFrame, DataFrame) =
    (heads, postings) match {
      case (Some(h), Some(p)) => (h, p)
      case _ => sys.error("index not built — call build() first")
    }

  /** Two-level routing state, engaged only when the head set outgrows a
    * comfortable broadcast (`conf.hierThreshold`): super-heads are a
    * deterministic hash-sample of the heads (SelectHead's Random option,
    * `SPANN/ParameterDefinitionList.h:38-67`), and heads route to their
    * `routeReplicas` nearest super-heads.
    */
  private lazy val hierState: Option[(DataFrame, DataFrame)] = heads.flatMap(hierOver)

  /** Routing state over an arbitrary head set — shared by [[build]] (posting
    * assignment) and the search path, so both switch levels at the SAME
    * threshold.
    */
  private def hierOver(h: DataFrame): Option[(DataFrame, DataFrame)] =
    if (h.count() <= conf.hierThreshold) None
    else {
      val m = math.max((1.0 / conf.superRatio).round.toInt, 2)
      val sh = h.where(pmod(xxhash64(col("head_id")), lit(m)) === 0)
        .select(col("head_id").as("super_id"), col("head_vec").as("super_vec"))
      if (sh.isEmpty) None
      else Some((sh, Spann.routeHeads(h, sh, conf.routeReplicas, conf.metric)))
    }

  /** SearchIndex: two-stage SPANN search; deleted ids are filtered from the
    * result (search-time tombstone skip, `BKTIndex.cpp:875-899`). Head sets
    * beyond `conf.hierThreshold` route through super-heads automatically
    * (never a full-head broadcast).
    */
  def search(queries: DataFrame, k: Int): DataFrame = {
    val (h, p) = requireBuilt()
    val live = p.join(deleted, Seq("id"), "left_anti")
    hierState match {
      case Some((sh, routing)) =>
        Spann.searchTwoStageHier(
          queries, sh, routing, live, k, conf.internalK, conf.superK, conf.metric)
      case None =>
        // a loaded index keeps IndexStore's head_bucket partition column →
        // the bucketed join enables dynamic partition pruning of the scan
        val buckets = if (p.columns.contains("head_bucket")) Some(conf.headBuckets) else None
        Spann.searchTwoStage(
          queries, h, live, k, conf.internalK, conf.maxDistRatio, conf.metric, buckets)
    }
  }

  /** Exact search — the truth path (brute force, always available). */
  def searchExact(queries: DataFrame, k: Int): DataFrame =
    Knn.search(queries, Mutations.liveView(vectors, deleted), k, conf.metric)

  /** Attach a trained product quantizer (the reference's SetQuantizer /
    * `QuantizerFilePath` flow, `VectorIndex.h:137-153`): trains plain PQ on
    * the live vectors (identity rotation; attach codebooks from
    * `PQ.trainOpqAlternating` via [[withQuantizer]] for OPQ). Persisted by
    * [[save]], restored by [[AnnIndex.load]].
    */
  def trainQuantizer(m: Int, k: Int = 256, maxIter: Int = 5): AnnIndex = {
    import graft.functions.PQ
    val live = Mutations.liveView(vectors, deleted)
    val cb = PQ.train(live, dimension, m, k, maxIter)
    val ident = Array.tabulate(dimension, dimension)((i, j) => if (i == j) 1.0 else 0.0)
    copy(quantizer = Some(PQ.RotatedCodebooks(ident, cb)))
  }

  /** Attach an externally trained (e.g. OPQ) quantizer. */
  def withQuantizer(q: graft.functions.PQ.RotatedCodebooks): AnnIndex =
    copy(quantizer = Some(q))

  /** ADC search against the quantized live corpus (Q11 compressed-domain
    * search): vectors are stored as `m` codes, query-to-code distance via
    * the per-query LUT — the memory-constrained serving mode the reference
    * runs when a quantizer is attached.
    */
  def searchAdc(queries: DataFrame, k: Int): DataFrame = {
    import graft.functions.PQ
    val q = quantizer.getOrElse(sys.error("no quantizer — call trainQuantizer() first"))
    val live = Mutations.liveView(vectors, deleted)
    val quant = PQ.quantizeOpq(live.select(col("id"), col("vec")), q)
      .select(col("id"), col("codes"))
    PQ.adcSearchOpq(queries, quant, q, k)
  }

  /** Search with metadata hydration. */
  def searchWithMeta(queries: DataFrame, k: Int): DataFrame =
    search(queries, k)
      .join(vectors.select(col("id"), col("meta")), Seq("id"))
      .select(col("query_id"), col("rank"), col("id"), col("dist"), col("meta"))

  /** BatchSearch ≡ search (queries are already a DataFrame). */
  def batchSearch(queries: DataFrame, k: Int): DataFrame = search(queries, k)

  /** AddIndex: append a batch; new vectors get postings against the CURRENT
    * heads (delta-only cost — the reference's incremental insert path).
    */
  def add(batch: DataFrame): AnnIndex = {
    val grown = copy(vectors = Mutations.add(vectors, batch))
    postings match {
      case Some(p) =>
        val delta0 = Spann.buildPostings(
          batch.select(col("id"), col("vec")), heads.get,
          conf.replicaCount, conf.metric)
        // a loaded index carries the head_bucket partition column — bucket
        // the delta identically so the union stays schema-aligned
        val delta =
          if (p.columns.contains("head_bucket"))
            IndexStore.withBucket(delta0, conf.headBuckets)
          else delta0
        grown.copy(postings = Some(p.unionByName(delta)))
      case None => grown
    }
  }

  def deleteByIds(ids: DataFrame): AnnIndex =
    copy(deleted = Mutations.deleteIds(deleted, ids))

  def deleteByVector(targets: DataFrame): AnnIndex =
    deleteByIds(Mutations.deleteByVector(vectors, targets, metric = conf.metric))

  def deleteByMeta(metaValues: DataFrame): AnnIndex =
    deleteByIds(Mutations.deleteByMeta(vectors, metaValues))

  def needRefine: Boolean =
    Mutations.needRefine(vectors, deleted, conf.deleteRefineThreshold)

  /** RefineIndex: compact tombstones away and rebuild (the quantizer, when
    * attached, survives compaction — codebooks describe the space, not the
    * row set).
    */
  def refineIndex(): AnnIndex = {
    val live = Mutations.liveView(vectors, deleted)
    new AnnIndex(spark, conf, live, AnnIndex.emptyDeletes(spark), None, None, quantizer)
      .build()
  }

  /** Recall@k of the approximate path vs exact, on given queries. */
  def recall(queries: DataFrame, k: Int): Double =
    Eval.recallSummary(Eval.recallAt(search(queries, k), searchExact(queries, k), k))
      .head().getDouble(0)

  def save(dir: String): Unit = {
    val (h, p) = requireBuilt()
    IndexStore.save(dir, h, p, Some(deleted),
      IndexStore.IndexConfig(conf.metric, dimension, conf.replicaCount, conf.headBuckets),
      quantizer = quantizer)
    vectors.write.mode("overwrite").parquet(s"$dir/vectors")
  }

  def dimension: Int =
    vectors.select(size(col("vec"))).head().getInt(0)
}

object AnnIndex {
  private def emptyDeletes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[Long].toDF("id")
  }

  /** Create over a vector table `(id, vec[, meta])`. */
  def apply(spark: SparkSession, vectors: DataFrame, conf: GraftConf = GraftConf()): AnnIndex = {
    val withMeta =
      if (vectors.columns.contains("meta")) vectors
      else vectors.withColumn("meta", lit(null).cast("string"))
    new AnnIndex(spark, conf, withMeta, emptyDeletes(spark), None, None)
  }

  /** LoadIndex: restore from an [[IndexStore]] directory. */
  def load(spark: SparkSession, dir: String): AnnIndex = {
    val l = IndexStore.load(spark, dir)
    val conf = GraftConf(
      metric = l.config.metric,
      replicaCount = l.config.replicaCount,
      headBuckets = l.config.headBuckets)
    val vectors = spark.read.parquet(s"$dir/vectors")
    new AnnIndex(spark, conf, vectors,
      l.deletes.getOrElse(emptyDeletes(spark)),
      Some(l.heads), Some(l.postings), // head_bucket kept → pruned stage-2 scans
      l.quantizer)
  }
}
