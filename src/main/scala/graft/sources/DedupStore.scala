package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Persisted MinHash-LSH dedup index — the storage half of the incremental
  * dedup story ([[Dedup.minhashDedupIncremental]] recomputes the corpus side
  * per call; at 100 TB the corpus bands and shingle sets are computed ONCE at
  * corpus-build time and every ingest round probes the stored layout). The
  * reference persists its search structures the same way — build once, serve
  * many (`SPANNIndex.cpp:SaveIndexData`); this is that idea for dedup.
  *
  * Layout under `path/`:
  *  - `bands/` — `(doc_id, band, band_hash, cnt)` partitioned by
  *    `band_bucket = pmod(xxhash64(band, band_hash), bandBuckets)`, so a
  *    small probe batch dynamic-partition-prunes to the buckets it actually
  *    touches (the `head_bucket` pattern of [[IndexStore]]); `cnt` is the
  *    bucket's membership count, precomputed at save time so the probe's
  *    stop-bucket guard is a scan-time filter instead of a window;
  *  - `shingles/` — `(doc_id, sharr)` for the exact-Jaccard verify;
  *  - `meta/` — one row of build parameters, so probe-side banding provably
  *    matches the stored banding.
  */
object DedupStore {

  /** A loaded dedup index: stored frames plus the banding parameters. */
  case class DedupIndex(
      bands: DataFrame,
      shingles: DataFrame,
      numHashes: Int,
      rowsPerBand: Int,
      nGram: Int,
      bandBuckets: Int)

  /** The partition key: stable hash of the full bucket identity folded into
    * `buckets` partitions. Derived identically at save and probe time.
    */
  private def bandBucket(buckets: Int): Column =
    pmod(xxhash64(col("band"), col("band_hash")), lit(buckets.toLong)).cast("int")

  def save(
      path: String,
      corpus: DataFrame,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      nGram: Int = 3,
      bandBuckets: Int = 32): Unit = {
    val spark = corpus.sparkSession
    // spread an under-partitioned source before the heavy tokenize+hash map
    // (single-file corpus reads as 1 partition), and checkpoint the shingle
    // frame: both the shingles/ write and the bands path read it, and
    // without the checkpoint the most expensive map stage runs twice
    val target = spark.sessionState.conf.numShufflePartitions
    val spread =
      if (corpus.rdd.getNumPartitions < target) corpus.repartition(target)
      else corpus
    val da = Dedup.shingleArrays(spread, nGram).localCheckpoint(true)
    da.select(col("doc_id"), col("sharr"))
      .write.mode("overwrite").parquet(s"$path/shingles")
    val bands = Dedup.lshBands(
      Dedup.minhashFromArrays(da, numHashes), numHashes, rowsPerBand)
    // membership count rides with the row: the probe's stop-bucket guard
    // becomes a pushed-down scan filter (the window shuffles HERE, once at
    // build, on the same key the bucketed write needs anyway)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("band_hash"))
    bands.withColumn("cnt", count(lit(1)).over(w))
      .withColumn("band_bucket", bandBucket(bandBuckets))
      // cluster by the partition column before the partitioned write (guide
      // §6, r16): the window's (band, band_hash) partitioning spreads one
      // band_bucket across many tasks, so each task otherwise opens a file
      // per bucket it touches; one exchange bounds files to ~one per bucket
      // (count pinned to the bucket count — a bare repartition(col) lets
      // AQE coalesce a small input to one serial write task)
      .repartition(bandBuckets, col("band_bucket"))
      .write.mode("overwrite").partitionBy("band_bucket")
      .parquet(s"$path/bands")
    import spark.implicits._
    Seq((numHashes, rowsPerBand, nGram, bandBuckets))
      .toDF("num_hashes", "rows_per_band", "n_gram", "band_buckets")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  def load(spark: SparkSession, path: String): DedupIndex = {
    val m = spark.read.parquet(s"$path/meta").head()
    DedupIndex(
      bands = spark.read.parquet(s"$path/bands"),
      shingles = spark.read.parquet(s"$path/shingles"),
      numHashes = m.getAs[Int]("num_hashes"),
      rowsPerBand = m.getAs[Int]("rows_per_band"),
      nGram = m.getAs[Int]("n_gram"),
      bandBuckets = m.getAs[Int]("band_buckets"))
  }

  /** Incremental probe against the stored index — same output contract as
    * [[Dedup.minhashDedupIncremental]] (`(a, b, jaccard)`, `b` always a
    * batch doc, corpus-internal pairs never formed), but the corpus side is
    * the stored layout: the bucket join carries the `band_bucket` partition
    * key, so a small batch's probe scans only the band partitions it hits,
    * and oversized stored buckets drop out via the precomputed `cnt` filter
    * at scan time.
    */
  def probe(
      index: DedupIndex,
      batch: DataFrame,
      threshold: Double,
      maxBucket: Int = Dedup.MaxBandBucket): DataFrame = {
    val daB = Dedup.shingleArrays(batch, index.nGram).localCheckpoint(true)
    // the size guard never drops a row (shingleArrays emits >= 1 shingle per
    // doc), but the planner's partition-pruning rule only builds a DPP
    // subquery against a probe side carrying a selective-shaped predicate —
    // without it the bucket join scans every stored band partition
    val bandsB = Dedup.lshBands(
      Dedup.minhashFromArrays(daB.where(size(col("sharr")) > 0), index.numHashes),
      index.numHashes, index.rowsPerBand)
      .withColumn("band_bucket", bandBucket(index.bandBuckets))
    val cross = index.bands
      .where(col("cnt") <= maxBucket)
      .select(col("doc_id").as("a"), col("band_bucket"), col("band"), col("band_hash"))
      .join(
        bandsB.select(col("doc_id").as("b"), col("band_bucket"), col("band"), col("band_hash")),
        Seq("band_bucket", "band", "band_hash"))
      .select(col("a"), col("b"))
    val cands = cross
      .union(Dedup.lshCandidates(bandsB.drop("band_bucket"), maxBucket))
      .distinct()
    Dedup.verifiedPairs(cands,
      index.shingles.union(daB.select(col("doc_id"), col("sharr"))),
      daB, threshold)
  }
}
