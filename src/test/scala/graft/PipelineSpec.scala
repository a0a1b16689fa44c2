package graft

import graft.operators.Pipeline

/** End-to-end curation pipeline composition (q71's operator): each stage
  * must remove exactly its kind of offender and nothing else.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("curate composes quality floor, exact dedup, near-dup dedup, decontamination") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    val corpus = Seq(
      (1L, base), // keeper (canonical of 2 and 3)
      (2L, base), // exact duplicate → dropped
      (3L, base + " today"), // near duplicate → dropped
      (4L, "!!!???!!!"), // tokenless garbage → quality floor drops it
      (5L, "completely separate eval benchmark question about spark engines"), // leaked eval doc
      (6L, "an entirely different clean document with plenty of the usual words in it")
    ).toDF("doc_id", "text")
    val evalSet = Seq(
      (100L, "completely separate eval benchmark question about spark engines")
    ).toDF("doc_id", "text")
    val kept = Pipeline.curate(corpus, evalSet,
      minQuality = 0.3, jaccardThreshold = 0.3, maxOverlap = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 6L), s"kept $kept")
    // an empty eval set only disables decontamination, nothing else
    val keptNoEval = Pipeline.curate(corpus, evalSet.limit(0),
      minQuality = 0.3, jaccardThreshold = 0.3, maxOverlap = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(keptNoEval === Set(1L, 5L, 6L), s"kept $keptNoEval")
  }

  test("contamination is bounded and monotone in the eval set") {
    val docs = Tables.documents(spark, sf0001)
    val corpus = docs.where(org.apache.spark.sql.functions.col("doc_id") % 5 =!= 0)
    val evalSmall = docs.where(org.apache.spark.sql.functions.col("doc_id") % 10 === 0)
    val evalBig = docs.where(org.apache.spark.sql.functions.col("doc_id") % 5 === 0)
    val small = graft.operators.Dedup.contamination(corpus, evalSmall)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val big = graft.operators.Dedup.contamination(corpus, evalBig)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(small.values.forall(c => c >= 0.0 && c <= 1.0))
    // a SUPERSET eval set can only raise (never lower) any doc's overlap
    assert(small.forall { case (id, c) => big(id) >= c - 1e-9 },
      "contamination decreased under a larger eval set")
  }

  test("sourceStats reports per-source count, mean quality, and dup rate") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "srcA"),
      (2L, "the quick brown fox jumps over the lazy dog", "srcA"), // dup of 1
      (3L, "a different document for the first source today", "srcA"),
      (4L, "the only document of the second source", "srcB")
    ).toDF("doc_id", "text", "source")
    val r = Pipeline.sourceStats(docs)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("srcA").getLong(1) === 3L && r("srcB").getLong(1) === 1L)
    // srcA has one non-canonical duplicate of three docs
    assert(r("srcA").getDouble(3) === 0.3333 && r("srcB").getDouble(3) === 0.0)
    // mean quality matches the per-doc scores exactly (DECIMAL-summed)
    val perDoc = graft.operators.TextAnalysis.stats(docs)
      .collect().map(x => x.getLong(0) -> x.getDouble(6)).toMap
    val expectA = BigDecimal((perDoc(1L) + perDoc(2L) + perDoc(3L)) / 3)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r("srcA").getDouble(2) === expectA)
  }
}
