package graft

import graft.functions.ScalarQuantizer
import graft.operators.{Eval, Knn}
import org.apache.spark.sql.functions._

class ScalarQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Tables.embeddingVec(spark, sf0001)

  test("codes are in [0,255] and extremes map to the endpoints") {
    val stats = ScalarQuantizer.fit(vecs)
    val codes = ScalarQuantizer.quantize(vecs, stats)
      .select(col("id"), explode(col("codes")).as("code"))
    val (mn, mx) = codes.agg(min("code"), max("code"))
      .as[(Long, Long)].head()
    assert(mn === 0L && mx === 255L)
  }

  test("constant dimension codes to 0 and reconstructs exactly") {
    val fixed = Seq(
      (1L, Array(1.0f, 5.0f)), (2L, Array(1.0f, 7.0f)), (3L, Array(1.0f, 6.0f)))
      .toDF("id", "vec")
    val stats = ScalarQuantizer.fit(fixed)
    val codes = ScalarQuantizer.quantize(fixed, stats)
    assert(codes.select(explode(col("codes"))).where(col("col") < 0).count() === 0)
    val dim0 = codes.select(element_at(col("codes"), 1)).distinct()
      .as[Long].collect().toSeq
    assert(dim0 === Seq(0L))
    val rec = ScalarQuantizer.reconstruct(codes, stats)
      .select(element_at(col("vec"), 1)).distinct().as[Double].collect().toSeq
    assert(rec === Seq(1.0))
  }

  test("round-trip error is bounded by half a quantization step per dimension") {
    val stats = ScalarQuantizer.fit(vecs)
    val rec = ScalarQuantizer.reconstruct(ScalarQuantizer.quantize(vecs, stats), stats)
    val maxStep = stats.agg(max((col("mx") - col("mn")) / 255d)).as[Double].head()
    val worst = vecs.select(col("id"), col("vec").as("orig"))
      .join(rec.select(col("id"), col("vec").as("r")), "id")
      .select(aggregate(zip_with(col("orig"), col("r"),
        (a, b) => abs(a.cast("double") - b)), lit(0.0d),
        (acc, x) => greatest(acc, x)).as("err"))
      .agg(max("err")).as[Double].head()
    // half a step, plus a whisker of double roundoff
    assert(worst <= maxStep / 2d + 1e-9,
      s"worst round-trip err $worst > half-step ${maxStep / 2d}")
  }

  test("search over reconstructed vectors keeps high recall vs exact") {
    val queries = vecs.where(col("id") < 10)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val stats = ScalarQuantizer.fit(vecs)
    val rec = ScalarQuantizer.reconstruct(ScalarQuantizer.quantize(vecs, stats), stats)
    val k = 10
    val exact = Knn.search(queries, vecs, k)
    val approx = Knn.search(queries, rec, k)
    val recall = Eval.recallAt(approx, exact, k)
      .agg(avg("recall")).as[Double].head()
    assert(recall >= 0.9, s"SQ8 recall $recall < 0.9")
  }
}
