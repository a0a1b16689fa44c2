package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Index persistence (S6, `VectorIndex.h:85-101` SaveIndex/LoadIndex): the
  * reference writes a folder of binary blobs + ini; here each artifact is a
  * Parquet table and the config is JSON.
  *
  * `postings` is written PARTITIONED BY head_id bucket — the layout that maps
  * the reference's page-aligned SSD posting file + selective reads
  * (`ExtraFullGraphSearcher.h:1206-1290`) onto Parquet partition pruning: a
  * stage-2 probe of `nprobe` heads touches only those directories.
  */
object IndexStore {

  case class IndexConfig(
      metric: String,
      dimension: Int,
      replicaCount: Int,
      headBuckets: Int)

  /** head_id is hash-bucketed so the partition count stays bounded at any
    * corpus scale (raw head_id partitioning would create millions of dirs).
    */
  def withBucket(postings: DataFrame, headBuckets: Int): DataFrame =
    postings.withColumn("head_bucket", (col("head_id") % headBuckets).cast("int"))

  def save(
      dir: String,
      heads: DataFrame,
      postings: DataFrame,
      deletes: Option[DataFrame],
      config: IndexConfig): Unit = {
    heads.write.mode("overwrite").parquet(s"$dir/heads")
    withBucket(postings, config.headBuckets)
      .write.mode("overwrite")
      .partitionBy("head_bucket")
      .parquet(s"$dir/postings")
    deletes.foreach(_.write.mode("overwrite").parquet(s"$dir/deletes"))
    val json =
      s"""{"metric":"${config.metric}","dimension":${config.dimension},
         |"replicaCount":${config.replicaCount},"headBuckets":${config.headBuckets}}""".stripMargin
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(s"$dir/config.json"), json.getBytes(StandardCharsets.UTF_8))
  }

  case class LoadedIndex(
      heads: DataFrame,
      postings: DataFrame,
      deletes: Option[DataFrame],
      config: IndexConfig)

  def load(spark: SparkSession, dir: String): LoadedIndex = {
    val cfgText = new String(Files.readAllBytes(Paths.get(s"$dir/config.json")), StandardCharsets.UTF_8)
    def field(name: String): String =
      s""""$name":\\s*"?([^,"}\\n]+)"?""".r.findFirstMatchIn(cfgText)
        .map(_.group(1)).getOrElse(sys.error(s"missing $name in $dir/config.json"))
    val cfg = IndexConfig(field("metric"), field("dimension").toInt,
      field("replicaCount").toInt, field("headBuckets").toInt)
    val deletesPath = Paths.get(s"$dir/deletes")
    LoadedIndex(
      spark.read.parquet(s"$dir/heads"),
      spark.read.parquet(s"$dir/postings"),
      if (Files.exists(deletesPath)) Some(spark.read.parquet(s"$dir/deletes")) else None,
      cfg)
  }

  /** Prune the postings scan to the head buckets a candidate set touches —
    * the query-side half of the partition-pruning contract.
    */
  def pruneToHeads(loaded: LoadedIndex, headIds: Seq[Long]): DataFrame = {
    val buckets = headIds.map(_ % loaded.config.headBuckets).distinct
    loaded.postings
      .where(col("head_bucket").isin(buckets: _*))
      .where(col("head_id").isin(headIds: _*))
  }
}
