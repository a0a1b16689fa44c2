package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hash60

/** Approximate-nearest-neighbor search over an embedding column
  * (`ARRAY<FLOAT>`). Three tiers:
  *  - [[bruteForce]]: exact top-k — the correctness baseline / truth source;
  *  - [[ivfSearch]]: IVF/SPANN-style clustered search — the 100 TB path
  *    (reuses [[Spann]]: broadcastable centroid table + postings
  *    partitioned by centroid → partition-pruned probes);
  *  - [[lshCodes]]: hyperplane-LSH bucket codes for near-dup blocking.
  */
object SimilaritySearch {

  /** Exact top-k (cosine by default) — queries (query_id, qvec) × corpus
    * (id, vec). Same scalable shape as [[Knn.search]].
    */
  def bruteForce(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      metric: String = "cos"): DataFrame =
    Knn.search(queries, corpus, k, metric)

  /** IVF: centroids = every-nth vectors (deterministic, oracle-able) or
    * k-means centers; each vector assigned to its nearest `replicas`
    * centroid(s); queries probe `nprobe` centroids.
    */
  def ivfSearch(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      centroidEveryNth: Int,
      nprobe: Int,
      replicas: Int = 1,
      metric: String = "cos"): DataFrame = {
    val cents = Spann.selectHeadsModulo(corpus, centroidEveryNth)
    val postings = Spann.buildPostings(corpus, cents, replicas, metric)
    Spann.searchTwoStage(queries, cents, postings, k, nprobe, metric = metric)
  }

  /** Deterministic hyperplane-LSH codes: `planes` pseudo-random integer
    * hyperplanes derived from [[Hash60]] (plane p, dim d →
    * weight = hash60(p||'_'||d) % 2001 − 1000); embeddings are quantized to
    * integers (×1000, rounded) so the dot-product sign is integer-exact and
    * identical in any engine / any summation order. Output `(id, code)`.
    */
  def lshCodes(emb: DataFrame, dims: Int, planes: Int = 8): DataFrame = {
    val q = transform(col("vec"), v => round(v.cast("double") * 1000).cast("long"))
    val withQ = emb.select(col("id"), q.as("qv"))
    val code = (0 until planes).map { p =>
      val dot = (0 until dims).map { d =>
        col("qv").getItem(d) * lit(SimilaritySearch.planeWeight(p, d))
      }.reduce(_ + _)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    withQ.select(col("id"), code.as("code"))
  }

  /** Integer weight of LSH plane `p`, dimension `d` — host-side mirror of
    * hash60(s"${p}_${d}") % 2001 - 1000 (md5-based, engine-independent).
    */
  def planeWeight(p: Int, d: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${p}_$d".getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % 2001 - 1000
  }

  /** Near-dup blocking via LSH codes: pairs sharing a code, verified by
    * cosine distance. The scale path for [[Dedup.embeddingPairs]].
    */
  def lshNearDup(emb: DataFrame, dims: Int, maxCosDist: Double, planes: Int = 8): DataFrame = {
    val codes = lshCodes(emb, dims, planes)
    val l = codes.join(emb, Seq("id")).select(col("id").as("a"), col("code"), col("vec").as("va"))
    val r = codes.join(emb, Seq("id")).select(col("id").as("b"), col("code"), col("vec").as("vb"))
    l.join(r, Seq("code")).where(col("a") < col("b"))
      .withColumn("cos_dist", graft.functions.dist.cos(col("va"), col("vb")))
      .where(col("cos_dist") < maxCosDist)
      .select(col("a"), col("b"), round(col("cos_dist"), 4).as("cos_dist"))
      .distinct()
  }
}
