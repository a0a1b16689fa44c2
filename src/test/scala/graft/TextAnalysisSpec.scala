package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("stats computes token counts and ratios") {
    val docs = Seq((1L, "the cat sat on the mat.")).toDF("doc_id", "text")
    val r = TextAnalysis.stats(docs).head()
    assert(r.getInt(1) === 6) // n_tokens
    assert(r.getDouble(3) === 0.8333) // uniq: 5/6
    assert(r.getDouble(4) === 0.5) // stopwords: the, on, the → 3/6
    assert(r.getDouble(5) === 0.0435) // punct: 1/23
  }

  test("langId picks the dominant stopword profile") {
    val docs = Seq(
      (1L, "the cat and the dog in the house"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "le chat et le chien est un animal"),
      (4L, "xyzzy qwerty asdf")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.langId(docs).orderBy("doc_id")
      .collect().map(_.getString(1)).toSeq
    assert(got === Seq("en", "de", "fr", "und"))
  }

  test("repetition scores duplicate n-grams; distinct text scores zero") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"), // one trigram repeated
      (2L, "every word here is used exactly once today")
    ).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.repetition(docs)
      .collect().map(x => x.getLong(0) -> x).toMap
    // doc 1: 6 trigram slots, all "spam spam spam" → dup 5/6, top share 1.0
    assert(r(1L).getLong(1) === 6L && r(1L).getLong(2) === 1L)
    assert(r(1L).getDouble(3) === 0.8333 && r(1L).getDouble(4) === 1.0)
    // doc 2: all trigrams distinct → dup 0, top share 1/total
    assert(r(2L).getDouble(3) === 0.0)
    assert(r(2L).getLong(1) === r(2L).getLong(2))
  }

  test("BPE-ish token count splits runs and symbols") {
    val docs = Seq((1L, "abc123 def!")).toDF("doc_id", "text")
    // abc | 123 | def | ! → 4
    assert(TextAnalysis.stats(docs).head().getInt(2) === 4)
  }
}
