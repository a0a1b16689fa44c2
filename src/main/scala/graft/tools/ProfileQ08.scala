package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: localCheckpoint vs parquet-roundtrip postings for the
  * build+search pair (q07/q08). Not driver contract.
  */
object ProfileQ08 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($r)")
    }

    val vecs = graft.Tables.lineitemVec(spark, sfDir)
    vecs.count()
    val heads = graft.operators.Spann.selectHeadsModulo(vecs, 200)
    val q = graft.Tables.ordersQuery(spark, sfDir).where(col("query_id") < 50)

    def build() = graft.operators.Spann.buildPostings(vecs, heads, 4)
    def search(p: org.apache.spark.sql.DataFrame) =
      graft.operators.Spann.searchTwoStage(q, heads, p, 10, 8).count()

    // warm codegen on the small path
    graft.operators.Spann.buildPostings(vecs.limit(1000), heads, 4).count()

    var cp: org.apache.spark.sql.DataFrame = null
    t("A: build+localCheckpoint") { cp = build().localCheckpoint(true); cp.count() }
    t("A: search vs checkpoint (1st)") { search(cp) }
    t("A: search vs checkpoint (2nd)") { search(cp) }

    val dir = "/tmp/prof_postings_pq"
    t("B: build+write parquet") {
      build().write.mode("overwrite").parquet(dir)
    }
    val pq = spark.read.parquet(dir)
    t("B: search vs parquet (1st)") { search(pq) }
    t("B: search vs parquet (2nd)") { search(pq) }

    val dirP = "/tmp/prof_postings_pqb"
    t("C: build+write bucketed parquet") {
      graft.sources.IndexStore.withBucket(build(), 32)
        .write.mode("overwrite").partitionBy("head_bucket").parquet(dirP)
    }
    val pqb = spark.read.parquet(dirP)
    t("C: search vs bucketed (1st)") {
      graft.operators.Spann.searchTwoStage(q, heads, pqb, 10, 8, headBuckets = Some(32)).count()
    }
    t("C: search vs bucketed (2nd)") {
      graft.operators.Spann.searchTwoStage(q, heads, pqb, 10, 8, headBuckets = Some(32)).count()
    }
    spark.stop()
  }
}
