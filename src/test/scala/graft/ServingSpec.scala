package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{BalancedKMeans, Knn, Serving}
import graft.sources.LegacyFormats

class ServingSpec extends SparkSpec {
  import spark.implicits._

  test("multi-index search routes queries by index_name; null fans to all (V1)") {
    val idxA = synthVectors(100).select("id", "vec")
    val idxB = synthVectors(100).select((col("id") + 1000).as("id"), col("vec"))
    val queries = Seq(
      (1L, Seq.fill(10)(5f), "a"),
      (2L, Seq.fill(10)(7f), null.asInstanceOf[String])
    ).toDF("query_id", "qvec", "index_name")
    val res = Serving.multiIndexSearch(queries, Map("a" -> idxA, "b" -> idxB), 3)
    val byQ = res.collect().groupBy(r => (r.getLong(0), r.getString(4)))
    assert(byQ.keySet === Set((1L, "a"), (2L, "a"), (2L, "b")))
  }

  test("scatter-gather re-merge equals single-index search (V2 improvement)") {
    val corpus = synthVectors(500).select("id", "vec")
    val parts = Seq(
      corpus.where(col("id") % 3 === 0),
      corpus.where(col("id") % 3 === 1),
      corpus.where(col("id") % 3 === 2))
    val queries = synthQueries(3)
    val gathered = Serving.scatterGather(queries, parts, 5)
    val direct = Knn.search(queries, corpus, 5)
    assert(gathered.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(gathered).count() === 0)
  }

  test("partial scatter-gather: dead shards drop out, results equal the " +
    "surviving-subset kNN, status columns annotate degradation (V2)") {
    val corpus = synthVectors(500).select("id", "vec")
    val parts = (0 until 4).map(i => corpus.where(col("id") % 4 === i))
    val queries = synthQueries(3)
    val partial = Serving.scatterGatherPartial(queries, parts, 5, Set(1, 3))
    val expect = Knn.search(
      queries, corpus.where(col("id") % 4 === 0 || col("id") % 4 === 2), 5)
      .withColumn("n_shards_ok", lit(2)).withColumn("n_shards", lit(4))
    assert(partial.exceptAll(expect).count() === 0)
    assert(expect.exceptAll(partial).count() === 0)
    // no failures ≡ the full gather with a clean annotation
    val full = Serving.scatterGatherPartial(queries, parts, 5, Set.empty)
    assert(full.head().getAs[Int]("n_shards_ok") === 4)
    assert(full.drop("n_shards_ok", "n_shards")
      .exceptAll(Serving.scatterGather(queries, parts, 5)).count() === 0)
    // every shard down is a contract violation, not an empty answer
    intercept[IllegalArgumentException] {
      Serving.scatterGatherPartial(queries, parts, 5, Set(0, 1, 2, 3))
    }
  }

  test("latency report: percentiles + serial-time QPS (V4)") {
    import graft.operators.Eval
    // 1..1000 ms, uniform: percentiles are exact rank statistics
    val lat = spark.range(1, 1001).select(col("id").cast("double").as("latency_ms"))
    val r = Eval.latencyReport(lat).head()
    assert(r.getLong(0) === 1000L)
    // QPS = n / (sum/1000) = 1000 / 500.5s
    assert(math.abs(r.getDouble(1) - 1000.0 / 500.5) < 0.01)
    assert(math.abs(r.getDouble(2) - 500.5) < 1e-6) // mean
    assert(math.abs(r.getDouble(3) - 500.0) <= 1.0) // p50
    assert(math.abs(r.getDouble(4) - 900.0) <= 1.0) // p90
    assert(math.abs(r.getDouble(5) - 950.0) <= 1.0) // p95
    assert(math.abs(r.getDouble(6) - 990.0) <= 1.0) // p99
    assert(math.abs(r.getDouble(7) - 999.0) <= 1.0) // p99.9
  }

  test("truth file roundtrip (S5) + recall eval over it") {
    val dir = Files.createTempDirectory("graft_truth").toString
    val truth = Seq(
      Seq((10, 0.0f), (11, 1.5f), (12, 2.5f)),
      Seq((20, 0.5f), (21, 1.0f), (22, 9.0f)))
    LegacyFormats.writeTruthDefault(s"$dir/truth.bin", truth)
    val df = LegacyFormats.readTruthDefault(spark, s"$dir/truth.bin")
    assert(df.count() === 6)
    val r0 = df.where(col("query_id") === 0 && col("rank") === 2).head()
    assert(r0.getLong(2) === 11L && math.abs(r0.getFloat(3) - 1.5f) < 1e-6)
  }

  test("balanced partitioned write produces per-cluster directories (B14)") {
    val dir = Files.createTempDirectory("graft_part").toString
    val pts = synthVectors(100).select("id", "vec")
    val centers = BalancedKMeans.fit(pts, 4, maxIter = 3)
    BalancedKMeans.writePartitioned(pts, centers, s"$dir/parts")
    val dirs = new java.io.File(s"$dir/parts").listFiles()
      .filter(_.getName.startsWith("cluster_id=")).map(_.getName).toSet
    assert(dirs.size === 4)
    // partition-pruned read sees only its cluster
    val one = spark.read.parquet(s"$dir/parts").where(col("cluster_id") === 0)
    assert(one.count() > 0 && one.count() < 100)
  }
}
