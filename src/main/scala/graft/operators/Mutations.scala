package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.dist

/** Online-mutation semantics as batch/micro-batch dataflows (M1-M4, B10/B11).
  * Spark data is immutable, so "mutate" = append/tombstone tables + periodic
  * compaction — the same logical model as the reference's Labelset tombstones
  * + RefineIndex (`AnnService/inc/Core/Common/Labelset.h:15-60`,
  * `BKTIndex.cpp:775-899`).
  */
object Mutations {

  /** M1 AddIndex: append a batch of vectors (grow = union; the reference's
    * incBlocks append, `Common/Dataset.h:20-80`).
    */
  def add(vectors: DataFrame, batch: DataFrame): DataFrame =
    vectors.unionByName(batch)

  /** B11 MergeIndex: union another index's vectors, last-write-wins on id. */
  def merge(vectors: DataFrame, other: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(col("_src").desc)
    vectors.withColumn("_src", lit(0))
      .unionByName(other.withColumn("_src", lit(1)))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_src", "_rn")
  }

  /** M2 DeleteIndex(id): tombstone — append to the delete set. */
  def deleteIds(deletes: DataFrame, ids: DataFrame): DataFrame =
    deletes.unionByName(ids).distinct()

  /** M3 DeleteIndex(vectors) (`BKTIndex.cpp:875-890`): find exact-duplicate
    * vectors (dist < eps) of each target and tombstone every hit.
    * Returns the ids to delete: `(id)`.
    */
  def deleteByVector(
      corpus: DataFrame,
      targets: DataFrame, // (query_id, qvec)
      eps: Double = 1e-6,
      metric: String = "l2sq"): DataFrame =
    corpus.crossJoin(broadcast(targets))
      .withColumn("dist", dist.byName(metric)(col("qvec"), col("vec")))
      .where(col("dist") < eps)
      .select(col("id")).distinct()

  /** M4 DeleteByMetaData (`VectorIndex.h:97`): meta → ids via the meta
    * mapping (BuildMetaMapping ≡ a join), then tombstone.
    */
  def deleteByMeta(corpus: DataFrame, metaValues: DataFrame): DataFrame =
    corpus.join(metaValues, Seq("meta"), "left_semi").select(col("id"))

  /** Live view of the index: corpus minus tombstones (search-time skip,
    * `BKTIndex.cpp:875-899` checks the delete bitmap during traversal).
    */
  def liveView(corpus: DataFrame, deletes: DataFrame): DataFrame =
    corpus.join(deletes.select(col("id")), Seq("id"), "left_anti")

  /** B10 RefineIndex: compaction — drop tombstoned rows and rebuild the
    * SPANN artifacts from the surviving vectors. Triggered when
    * deletes/total > threshold (`NeedRefine`, `BKT/Index.h:150`).
    */
  def needRefine(corpus: DataFrame, deletes: DataFrame, threshold: Double = 0.4): Boolean = {
    val total = corpus.count()
    total > 0 && deletes.count().toDouble / total > threshold
  }

  def refine(
      corpus: DataFrame,
      deletes: DataFrame,
      everyNthHead: Int,
      replicaCount: Int): (DataFrame, DataFrame) = {
    val live = liveView(corpus, deletes)
    val heads = Spann.selectHeadsModulo(live, everyNthHead)
    val postings = Spann.buildPostings(live, heads, replicaCount)
    (heads, postings)
  }
}
