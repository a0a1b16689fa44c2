package graft

import org.apache.spark.sql.functions._

import graft.functions.Sketches
import graft.operators.TextAnalysis

class SketchesSpec extends SparkSpec {

  private def tokenStream = Tables.documents(spark, sf0001)
    .select(explode(TextAnalysis.tokens(col("text"))).as("token"))

  test("cms estimates never under-count, and are exact without collisions") {
    import spark.implicits._
    val toks = tokenStream.cache()
    val truth = toks.groupBy("token").count()
      .as[(String, Long)].collect().toMap
    // narrow sketch: collisions expected, but min-over-rows only over-counts
    val sk = Sketches.cmsSketch(toks, "token", width = 128, depth = 4)
    val est = Sketches.cmsEstimate(
      toks.distinct(), sk, "token", width = 128, depth = 4)
      .as[(String, Long)].collect().toMap
    truth.foreach { case (t, c) =>
      assert(est(t) >= c, s"under-count for $t: ${est(t)} < $c")
    }
    // wide sketch: with buckets >> distinct tokens, most probes are exact —
    // and every probe is still bounded below by the truth
    val wide = Sketches.cmsEstimate(
      toks.distinct(),
      Sketches.cmsSketch(toks, "token", width = 65536, depth = 4),
      "token", width = 65536, depth = 4)
      .as[(String, Long)].collect().toMap
    val exact = truth.count { case (t, c) => wide(t) == c }
    assert(exact >= truth.size * 9 / 10, s"only $exact/${truth.size} exact at width 65536")
  }

  test("cms: an item the stream never contained estimates 0") {
    import spark.implicits._
    val sk = Sketches.cmsSketch(tokenStream, "token", width = 65536, depth = 4)
    val est = Sketches.cmsEstimate(
      Seq("zzzz_never_a_token_qqqq").toDF("token"), sk, "token", 65536, 4)
      .as[(String, Long)].collect().toMap
    assert(est("zzzz_never_a_token_qqqq") === 0L)
  }

  test("cms sketches merge by per-bucket sum") {
    import spark.implicits._
    val a = tokenStream.limit(2000)
    val b = tokenStream.exceptAll(a)
    val merged = Sketches.cmsSketch(a, "token", 512, 4)
      .unionByName(Sketches.cmsSketch(b, "token", 512, 4))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val whole = Sketches.cmsSketch(tokenStream, "token", 512, 4)
    assert(merged.exceptAll(whole).count() === 0)
    assert(whole.exceptAll(merged).count() === 0)
  }

  test("hll registers merge by per-bucket max; estimate lands near the truth") {
    import spark.implicits._
    val toks = tokenStream.cache()
    val regs = Sketches.hllRegisters(toks, "token", p = 8)
    // merge property
    val a = toks.limit(2000)
    val b = toks.exceptAll(a)
    val merged = Sketches.hllRegisters(a, "token", 8)
      .unionByName(Sketches.hllRegisters(b, "token", 8))
      .groupBy("bucket").agg(max("register").as("register"))
    assert(merged.exceptAll(regs).count() === 0)
    assert(regs.exceptAll(merged).count() === 0)
    // accuracy: p=8 gives ~6.5% standard error; allow 3 sigma
    val truth = toks.distinct().count().toDouble
    val est = Sketches.hllEstimate(regs, 8)
    assert(math.abs(est - truth) / truth < 0.2, s"est $est vs true $truth")
  }
}
