package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("stats computes token counts and ratios") {
    val docs = Seq((1L, "the cat sat on the mat.")).toDF("doc_id", "text")
    val r = TextAnalysis.stats(docs).head()
    assert(r.getInt(1) === 6) // n_tokens
    assert(r.getDouble(3) === 5.0 / 6.0) // uniq (unrounded mirrored-op)
    assert(r.getDouble(4) === 0.5) // stopwords: the, on, the → 3/6
    assert(r.getDouble(5) === 1.0 / 23.0) // punct
  }

  test("freqSpectrum bins token types into exact frequency octaves") {
    val docs = Seq((1L, "s0", "aa aa aa aa bb bb cc"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.freqSpectrum(docs)
      .orderBy("octave")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // aa×4 → octave 2 [4,8); bb×2 → octave 1 [2,4); cc×1 → octave 0 [1,2)
    assert(got.toSeq === Seq(
      ("s0", 0, 1L, 1L, 1L), ("s0", 1, 2L, 1L, 2L), ("s0", 2, 4L, 1L, 4L)))
  }

  test("unseenVocab: hand singleton/doubleton masses → Chao1 and GT coverage") {
    // counts a:2, b:1, c:1 → v=3, N=4, f1=2, f2=1
    val docs = Seq((1L, "a a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.unseenVocab(docs).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((3L, 4L, 2L, 1L)))
    assert(r.getDouble(4) === 3.5) // 3 + 2·1/(2·2)
    assert(r.getDouble(5) === 0.5) // 1 − 2/4
  }

  test("heapsFit: every-token-new corpus fits beta = 1, K = 1; " +
      "saturated corpus fits beta = 0") {
    // doc i carries ONE unique token → V(n) = n exactly on every prefix
    val open = (0L until 32L).map(i => (i, s"tok$i")).toDF("doc_id", "text")
    val ro = TextAnalysis.heapsFit(open).head()
    assert(ro.getLong(0) === 32L)
    assert(ro.getDouble(1) === 1.0)
    assert(ro.getDouble(2) === 1.0)
    // all docs the same token → V(n) = 1: zero slope, K = e^0 = 1
    val closed = (0L until 32L).map(i => (i, "tok")).toDF("doc_id", "text")
    val rc = TextAnalysis.heapsFit(closed).head()
    assert(rc.getDouble(1) === 0.0)
    assert(rc.getDouble(2) === 1.0)
  }

  test("freqSpectrum's top octave is open-ended — ultra-frequent types land there") {
    // maxOctave = 2 → buckets [1,2) and [2,∞); a count of 5 reaches 2^2
    // and must surface in the top bucket, never silently vanish
    val docs = Seq((1L, "s0", "aa aa aa aa aa bb"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.freqSpectrum(docs, maxOctave = 2)
      .orderBy("octave")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(("s0", 0, 1L, 1L, 1L), ("s0", 1, 2L, 1L, 5L)))
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

  test("wordVectors: block-diagonal PPMI separates the two topic clusters " +
      "into disjoint dims; fit is deterministic") {
    // two disjoint co-occurrence blocks: {a,b} and {c,d} never meet, so
    // each eigen dim's support is exactly one block
    val docs = ((1 to 6).map(i => (i.toLong, "a b")) ++
      (7 to 10).map(i => (i.toLong, "c d"))).toDF("doc_id", "text")
    val m1 = TextAnalysis.wordVectorsFit(docs, v = 4, k = 2)
    val m2 = TextAnalysis.wordVectorsFit(docs, v = 4, k = 2)
    assert(m1.toks.toSeq === m2.toks.toSeq)
    assert(m1.scaled.map(_.toSeq).toSeq === m2.scaled.map(_.toSeq).toSeq)
    val vecs = TextAnalysis.wordVectors(docs, m1).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(vecs.size === 8) // 4 tokens × 2 dims
    for (j <- 0 until 2) {
      val support = Seq("a", "b", "c", "d")
        .filter(t => math.abs(vecs((t, j))) > 1e-3).toSet
      assert(support === Set("a", "b") || support === Set("c", "d"),
        s"dim $j support $support")
    }
    // both blocks carry a dim (the two positive eigenvalues)
    val supports = (0 until 2).map(j => Seq("a", "b", "c", "d")
      .filter(t => math.abs(vecs((t, j))) > 1e-3).toSet).toSet
    assert(supports === Set(Set("a", "b"), Set("c", "d")))
  }

  test("wordSynonyms: same-block tokens rank first at distance 0; " +
      "cross-block tokens sit at cosine 1") {
    val docs = ((1 to 6).map(i => (i.toLong, "a b")) ++
      (7 to 10).map(i => (i.toLong, "c d"))).toDF("doc_id", "text")
    val m = TextAnalysis.wordVectorsFit(docs, v = 4, k = 2)
    val got = TextAnalysis.wordSynonyms(docs, m, 3).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getString(2), r.getDouble(3))).toMap
    // a and b share a block (equal vectors) → rank-1 synonym at dist 0;
    // the other block is orthogonal → dist 1, tie-broken by name
    assert(got(("a", 1)) === (("b", 0.0)))
    assert(got(("a", 2)) === (("c", 1.0)) && got(("a", 3)) === (("d", 1.0)))
    assert(got(("c", 1)) === (("d", 0.0)))
  }

  test("sourceKl: identical token distributions → 0; mirrored skew → " +
      "equal positive divergences matching a plain-Scala reference") {
    // identical: every source's smoothed LM equals the pooled LM exactly
    val same = Seq((1L, "s1", "a b"), (2L, "s2", "a b"))
      .toDF("doc_id", "source", "text")
    val gs = TextAnalysis.sourceKl(same.select(col("source"), col("text")))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(gs("s1") === 0.0 && gs("s2") === 0.0)
    // mirrored skew: s1 = "a a", s2 = "b b" — symmetric, so equal KL; pin
    // the value against the same 8dp-rounded-term fold in plain Scala
    val skew = Seq(("s1", "a a"), ("s2", "b b")).toDF("source", "text")
    val gk = TextAnalysis.sourceKl(skew)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    def term(cs: Long, ns: Long, cw: Long): BigDecimal = {
      val ps = (cs + 0.5) / (ns + 0.5 * 2); val pc = (cw + 0.5) / (4 + 0.5 * 2)
      BigDecimal(ps * math.log(ps / pc))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    }
    val expect = BigDecimal((term(2, 2, 2) + term(0, 2, 2)).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(gk("s1") === expect && gk("s2") === expect && expect > 0.0)
  }

  test("knBigramScore: hand-computed Kneser–Ney probabilities; per-w1 " +
      "probabilities are properly normalized") {
    // corpus: "a b", "a b", "a c" → c2(a,b)=2 c2(a,c)=1, c1(a)=3 r1(a)=2,
    // N1+(·b)=N1+(·c)=1, T=2
    // p(b|a) = (2−.75)/3 + (.75·2/3)·(1/2) = 2/3 → ln = −0.405465
    // p(c|a) = (1−.75)/3 + (.75·2/3)·(1/2) = 1/3 → ln = −1.098612
    // (they sum to 1: interpolated KN is a proper distribution)
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.knBigramScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) === ((1L, -0.4055)) && got(2L) === ((1L, -0.4055)))
    assert(got(3L) === ((1L, -1.0986)))
    // single-token docs carry no bigram → no row
    val short = Seq((9L, "solo")).toDF("doc_id", "text")
    assert(TextAnalysis.knBigramScore(short).count() === 0L)
  }

  test("distinctNgrams: hand-counted per-source unigram/bigram diversity; " +
      "a source with no bigrams emits no n=2 row") {
    val docs = Seq((1L, "s1", "a b a b"), (2L, "s1", "a b c"),
      (3L, "s2", "x")).toDF("doc_id", "source", "text")
    val got = TextAnalysis.distinctNgrams(docs).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // s1 unigrams: 7 occurrences of {a,b,c}; bigrams: 5 of {a b, b a, b c}
    assert(got(("s1", 1)) === ((7L, 3L, 0.428571)))
    assert(got(("s1", 2)) === ((5L, 3L, 0.6)))
    assert(got(("s2", 1)) === ((1L, 1L, 1.0)))
    assert(!got.contains(("s2", 2)) && got.size === 3)
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

  test("scrub redacts the default PII shapes and counts per pattern") {
    val docs = Seq(
      (1L, "mail Bob.Smith+x@Example.COM or call 555-867-5309 now"),
      (2L, "server at 10.0.254.3 holds ssn 123-45-6789 twice: 123-45-6789"),
      (3L, "nothing sensitive here at all")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.scrub(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    // columns: doc_id, n_email, n_phone, n_ipv4, n_ssn, n_scrubbed, scrubbed
    assert(r(1L).getInt(1) === 1 && r(1L).getInt(2) === 1)
    assert(r(1L).getString(6) === "mail <EMAIL> or call <PHONE> now")
    assert(r(2L).getInt(3) === 1 && r(2L).getInt(4) === 2 && r(2L).getInt(5) === 3)
    assert(r(2L).getString(6) === "server at <IPV4> holds ssn <SSN> twice: <SSN>")
    assert(r(3L).getInt(5) === 0 && r(3L).getString(6) === "nothing sensitive here at all")
  }

  test("scrub applies caller deny-lists in order, counting on the original text") {
    val docs = Seq((1L, "alpha beta alpha gamma")).toDF("doc_id", "text")
    val r = TextAnalysis.scrub(docs, Seq(
      "a" -> "\\balpha\\b",
      // fires on the ORIGINAL 'beta' even though pattern 'a' rewrote nothing
      // near it; counts are original-text counts by contract
      "b" -> "\\bbeta\\b")).head()
    assert(r.getInt(1) === 2 && r.getInt(2) === 1 && r.getInt(3) === 3)
    assert(r.getString(4) === "<A> <B> <A> gamma")
  }

  test("scrub rejects a deny-list whose pattern matches an earlier placeholder") {
    val docs = Seq((1L, "whatever")).toDF("doc_id", "text")
    val bad = Seq(
      "email" -> "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}",
      // would match inside the injected '<EMAIL>' token → counts and visible
      // redactions diverge; the contract check refuses it up front
      "shout" -> "[A-Z]{3,}")
    val e = intercept[IllegalArgumentException] { TextAnalysis.scrub(docs, bad) }
    assert(e.getMessage.contains("placeholder"))
  }

  test("boilerplate reports shingle document frequency above the floor") {
    val docs = Seq(
      (1L, "all rights reserved copyright two thousand"),
      (2L, "all rights reserved by somebody else"),
      (3L, "all rights reserved for this test"),
      (4L, "a totally original document body")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.boilerplate(docs, n = 3, minDf = 3L).collect()
    assert(rows.length === 1)
    assert(rows.head.getString(0) === "all rights reserved")
    assert(rows.head.getLong(1) === 3L)
    assert(rows.head.getDouble(2) === 0.75)
    // repeated shingles WITHIN one doc count that doc once (distinct-per-doc)
    val rep = Seq((1L, "x y z x y z"), (2L, "x y z w")).toDF("doc_id", "text")
    val m = TextAnalysis.boilerplate(rep, n = 3, minDf = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("x y z") === 2L)
  }

  test("vocabulary keeps the top-V tokens with a deterministic tie-break") {
    val docs = Seq(
      (1L, "aa aa aa bb bb cc"),
      (2L, "bb cc dd"),
      (3L, "cc aa")
    ).toDF("doc_id", "text")
    // counts: aa=4, bb=3, cc=3, dd=1
    val top3 = TextAnalysis.vocabulary(docs, 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top3.toSeq === Seq(("aa", 4L), ("bb", 3L), ("cc", 3L)))
    // the V-boundary crossing a tie keeps the lexicographically smaller token
    val top2 = TextAnalysis.vocabulary(docs, 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top2.toSeq === Seq(("aa", 4L), ("bb", 3L)))
  }

  test("ngram LM score: familiar bigrams beat gibberish; counts line up") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug"),
      (3L, "the cat sat on the mat again"),
      (4L, "zq wv xk jj pq mn"), // transitions the corpus never repeats
      (5L, "one"), // <2 tokens → no bigrams → omitted
      (6L, "")
    ).toDF("doc_id", "text")
    val scored = TextAnalysis.ngramLmScore(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // docs 5/6 carry no bigrams
    assert(scored.keySet === Set(1L, 2L, 3L, 4L))
    // n_bigrams = n_tokens - 1
    assert(scored(1L)._1 === 5L && scored(4L)._1 === 5L)
    // the corpus-frequent "the cat sat on the ..." transitions score far
    // above the one-off gibberish transitions
    assert(scored(1L)._2 > scored(4L)._2)
    assert(scored(2L)._2 > scored(4L)._2)
    // a wide margin, not a squeaker (fixture gap is 0.45 nats)
    assert(scored(1L)._2 > scored(4L)._2 + 0.4)
  }

  test("stripBoilerplate excises every flagged span occurrence, keeps the rest") {
    val docs = Seq(
      (1L, "click here now to read the real article body"),
      (2L, "other words click here now more words"),
      (3L, "click here now"),
      (4L, "completely unique sentence with no boilerplate at all"),
      (5L, "click here now and click here now again")
    ).toDF("doc_id", "text")
    // "click here now" (and its sub-spans "here now to" etc. are NOT ≥3-df)
    val out = TextAnalysis.stripBoilerplate(docs, n = 3, minDf = 3L)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) === ("to read the real article body", 3L))
    assert(out(2L) === ("other words more words", 3L))
    assert(out(3L) === ("", 3L)) // fully boilerplate → empty
    assert(out(4L) === ("completely unique sentence with no boilerplate at all", 0L))
    assert(out(5L) === ("and again", 6L)) // both occurrences excised
  }

  test("ruleFilter gates on each heuristic independently; keep = all pass") {
    val long = ("the of and to in is on for with a " * 3).trim // 30 toks, all alpha, stopword-rich
    val docs = Seq(
      (1L, long), // passes everything
      (2L, "short text"), // fails length
      (3L, long + " " + Seq.fill(15)("x1").mkString(" ")), // alpha ratio 30/45 < 0.7
      (4L, ("pneumonoultramicroscopicsilicovolcanoconiosis " * 12).trim) // mean len 45, no stopwords
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ruleFilter(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(9), "doc 1 should pass all rules")
    assert(!out(2L).getBoolean(5) && !out(2L).getBoolean(9)) // ok_length fails
    assert(!out(3L).getBoolean(7) && !out(3L).getBoolean(9)) // ok_alpha fails
    assert(!out(4L).getBoolean(6) && !out(4L).getBoolean(8) && !out(4L).getBoolean(9))
  }

  test("bpeTrain learns the classic merge sequence and applies it greedily") {
    val docs = Seq(
      (1L, "low low low lower"),
      (2L, "newest newest widest")
    ).toDF("doc_id", "text")
    // vocab: low:3 lower:1 newest:2 widest:1 → pair counts put (l,o) and
    // (o,w) at 4 (lexicographic tie-break picks (l,o)), then (lo,w)=4,
    // then (e,s)/(s,t) tie at 3 → (e,s), then (es,t)=3
    val (merges, segs) = TextAnalysis.bpeTrain(docs, rounds = 4)
    assert(merges === Seq(
      (1, "l", "o", 4L), (2, "lo", "w", 4L),
      (3, "e", "s", 3L), (4, "es", "t", 3L)))
    val segMap = segs.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(segMap("low") === "low")
    assert(segMap("lower") === "low e r")
    assert(segMap("newest") === "n e w est")
    assert(segMap("widest") === "w i d est")
  }

  test("chunk cuts token windows with overlap and a short tail") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.chunk(docs, window = 4, stride = 3)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_tok", "n_tokens", "chunk_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq === Seq(
      (0L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 3L, 4L, "t4 t5 t6 t7"),
      (2L, 6L, 4L, "t7 t8 t9 t10"),
      (3L, 9L, 1L, "t10")))
  }

  test("chunk with stride == window partitions the tokens exactly") {
    val docs = Seq(
      (1L, (1 to 7).map(i => s"w$i").mkString(" ")),
      (2L, ""), // empty: no chunks
      (3L, "only")).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunk(docs, window = 3, stride = 3)
    assert(chunks.where($"doc_id" === 2L).count() === 0)
    // non-overlapping chunks re-join to the original token stream
    val rejoined = chunks.where($"doc_id" === 1L)
      .agg(array_join(transform(
        array_sort(collect_list(struct($"chunk_idx", $"chunk_text"))),
        s => s.getField("chunk_text")), " ")).as[String].head()
    assert(rejoined === (1 to 7).map(i => s"w$i").mkString(" "))
    val n = chunks.where($"doc_id" === 1L)
      .agg(sum("n_tokens")).as[Long].head()
    assert(n === 7L)
  }

  test("tfIdf: corpus-wide terms weigh zero, rare terms rank first") {
    val docs = Seq(
      (1L, "alpha alpha beta common"),
      (2L, "beta gamma common"),
      (3L, "delta common")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.tfIdf(docs, topK = 2).collect()
      .map(x => (x.getLong(0), x.getInt(1)) -> (x.getString(2), x.getDouble(5))).toMap
    // "common" is in every doc -> tfidf = tf*ln(1) = 0, never outranks others
    assert(r((1L, 1))._1 === "alpha") // tf=2, df=1 -> 2*ln(3)
    assert(r((1L, 1))._2 === math.rint(2.0 * math.log(3.0) * 1e6) / 1e6)
    // doc 3: only "delta" (df=1) then "common" (tfidf 0)
    assert(r((3L, 1))._1 === "delta" && r((3L, 2))._1 === "common")
    assert(r((3L, 2))._2 === 0.0)
  }

  test("bm25: higher tf wins, absent terms exclude the doc, k bounds the cut") {
    val docs = Seq(
      (1L, "spark spark spark join filler words here"),
      (2L, "spark join filler words here also now"),
      (3L, "nothing relevant in this document at all"),
      (4L, "join join join join filler words here")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bm25(docs, Seq("spark", "join"), k = 2).collect()
    // doc 3 matches no term; k=2 keeps the two best of {1,2,4}
    assert(r.length === 2 && !r.map(_.getLong(0)).contains(3L))
    // doc 1 (tf 3+1 over both terms) must beat doc 2 (1+1)
    val byId = r.map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(byId.contains(1L) && byId(1L) > byId.getOrElse(2L, 0.0))
  }

  test("importance weights: target-like docs score above raw-only docs") {
    import org.apache.spark.sql.functions.col
    // target slice (flag=1) speaks "good text"; the raw tail is DOMINATED
    // by "junk noise" (the realistic DSIR setting: the trusted slice is a
    // sliver of the raw distribution) — so the target dialect's
    // target-share genuinely exceeds its raw-share despite add-1 smoothing
    val docs = (Seq(
      (1L, 1, ("good text " * 12).trim),
      (2L, 1, ("good text " * 8).trim),
      (3L, 0, ("junk noise " * 25).trim),
      (4L, 0, ("junk noise " * 20).trim),
      (5L, 0, "good text good text good"), // target-like raw doc
      (6L, 0, "junk noise junk")
    )).toDF("doc_id", "flag", "text")
    val r = TextAnalysis.importanceWeights(docs, col("flag") === 1, buckets = 64)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    // "good text" bigrams dominate the target distribution -> positive
    // log-ratio; "junk noise" bigrams never appear in the target -> negative
    assert(r(5L) > r(6L), s"target-like ${r(5L)} vs raw-only ${r(6L)}")
    assert(r(5L) > 0 && r(6L) < 0)
    // deterministic
    val again = TextAnalysis.importanceWeights(docs, col("flag") === 1, buckets = 64)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r === again)
  }

  test("importance in-row scoring equals the join-formulated path; the table covers every bucket") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text", "lang")
    val wt = TextAnalysis.importanceWeightTable(docs, col("lang") === "en")
    assert(wt.count() === 256, "one weight row per bucket, observed or not")
    val joined = TextAnalysis.importanceWeights(docs, col("lang") === "en")
    val inRow = TextAnalysis.importanceScore(docs, wt)
    assert(inRow.exceptAll(joined).count() === 0)
    assert(joined.exceptAll(inRow).count() === 0)
  }

  test("naive bayes: learns separable dialects, beats chance on the fixture, full model grid") {
    import org.apache.spark.sql.functions.col
    val train = Seq(
      (1L, "aa", "good clean text here and good clean words"),
      (2L, "aa", "clean text with good words and clean phrasing"),
      (3L, "bb", "junk noise garbage junk noise rubbish junk"),
      (4L, "bb", "noise garbage rubbish noise junk garbage bits")
    ).toDF("doc_id", "lang", "text")
    val model = TextAnalysis.nbTrain(train, "lang", buckets = 64)
    assert(model.count() === 2 * 64, "one grid row per (label, bucket)")
    val probes = Seq(
      (10L, "good clean words here"),
      (11L, "junk noise rubbish bits")
    ).toDF("doc_id", "text")
    val pred = TextAnalysis.nbClassify(probes, model, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred === Map(10L -> "aa", 11L -> "bb"))
    // corpus self-classification beats the majority-class baseline
    val docs = Tables.documents(spark, sf0001)
    val m2 = TextAnalysis.nbTrain(docs)
    val acc = TextAnalysis.nbClassify(docs, m2)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(avg((col("pred_label") === col("lang")).cast("double")))
      .head().getDouble(0)
    val majority = docs.groupBy("lang").count()
      .agg(max(col("count"))).head().getLong(0).toDouble / docs.count()
    assert(acc > majority, s"accuracy $acc vs majority baseline $majority")
  }

  test("importance weights: n_feats counts bigrams; <2-token docs are omitted") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "one two three four"), // 3 bigrams
      (2L, "single"),             // no bigrams
      (3L, "")                    // no tokens
    ).toDF("doc_id", "text")
    val r = TextAnalysis.importanceWeights(docs, col("doc_id") === 1L)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 3L))
  }

  test("labelAgreement reproduces the textbook 2x2 kappa") {
    import spark.implicits._
    import graft.operators.Eval
    // 20 yes/yes, 15 no/no, 5 yes/no, 10 no/yes:
    // po = 35/50 = 0.7; pe = (25·30 + 25·20)/2500 = 0.5; kappa = 0.4
    val rows =
      Seq.fill(20)(("yes", "yes")) ++ Seq.fill(15)(("no", "no")) ++
        Seq.fill(5)(("yes", "no")) ++ Seq.fill(10)(("no", "yes"))
    val got = Eval.labelAgreement(rows.toDF("gold", "pred")).head()
    assert(got.getLong(0) === 50L)
    assert(got.getLong(1) === 35L)
    assert(got.getDouble(2) === 0.7)
    assert(got.getDouble(3) === 0.5)
    assert(got.getDouble(4) === 0.4)
  }

  test("vocabCoverage: exact cumulative shares at each cutoff, monotone") {
    // counts: a=4, b=2, c=1 (ties none) → total 7
    val docs = Seq((1L, "a a b c"), (2L, "a a b")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(docs, Seq(1, 2, 3, 10))
      .orderBy("vocab_size")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got(0) === ((1, 4L, 7L, math.rint(4.0 / 7.0 * 1e6) / 1e6)))
    assert(got(1) === ((2, 6L, 7L, math.rint(6.0 / 7.0 * 1e6) / 1e6)))
    assert(got(2) === ((3, 7L, 7L, 1.0)))
    // a cutoff past the vocabulary saturates, never overshoots
    assert(got(3) === ((10, 7L, 7L, 1.0)))
  }

  test("vocabCoverage tie at the cutoff boundary resolves by token ASC") {
    // b=2, a=2, c=2: top-1 must be 'a' (count tie → token ASC)
    val docs = Seq((1L, "b b a a c c")).toDF("doc_id", "text")
    val one = TextAnalysis.vocabCoverage(docs, Seq(1)).head()
    assert(one.getLong(1) === 2L) // exactly one token's mass
    // and which token: vocabulary picks 'a' first under the same order
    assert(TextAnalysis.vocabulary(docs, 1).head().getString(0) === "a")
  }

  test("readability: hand-counted words/sentences/syllable proxy, empty doc NULL") {
    val docs = Seq(
      (1L, "the cat sat. it sat there!"), // 6 words, 2 sentences; vowel
      // groups: the=1 cat=1 sat=1 it=1 sat=1 there=2 ("e","e") → 7
      (2L, "unbelievable"),               // u-n-b-e-l-ie-v-a-b-l-e → groups: u,e,ie,a,e = 5
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs).orderBy("doc_id").collect()
    assert((got(0).getLong(1), got(0).getLong(2), got(0).getLong(3)) === ((6L, 2L, 7L)))
    val f1 = 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (7.0 / 6.0)
    assert(got(0).getDouble(4) === math.rint(f1 * 1e4) / 1e4)
    assert((got(1).getLong(1), got(1).getLong(2), got(1).getLong(3)) === ((1L, 1L, 5L)))
    assert(got(2).getLong(1) === 0L)
    assert(got(2).isNullAt(4), "token-less doc must have NULL flesch")
  }

  test("abTest: textbook two-sample Welch t and Cohen's d; degenerate NULLs") {
    import graft.operators.Eval
    // control [1,2,3] (mean 2, var 1), treatment [2,4,6] (mean 4, var 4)
    val units = Seq(("control", 1L), ("control", 2L), ("control", 3L),
      ("treatment", 2L), ("treatment", 4L), ("treatment", 6L))
      .toDF("variant", "x")
    val r = Eval.abTest(units, 1.0).head()
    assert((r.getString(0), r.getLong(1), r.getDouble(2)) === (("control", 3L, 2.0)))
    assert((r.getString(3), r.getLong(4), r.getDouble(5)) === (("treatment", 3L, 4.0)))
    val t = (2.0 - 4.0) / math.sqrt(1.0 / 3 + 4.0 / 3)
    val d = (2.0 - 4.0) / math.sqrt((2 * 1.0 + 2 * 4.0) / 4)
    assert(math.abs(r.getDouble(6) - t) < 1e-12)
    assert(math.abs(r.getDouble(7) - d) < 1e-12)
    // zero variance on both sides → NULL t and d, means still reported
    val flat = Seq(("a", 5L), ("a", 5L), ("b", 7L), ("b", 7L)).toDF("variant", "x")
    val f = Eval.abTest(flat, 1.0).head()
    assert(f.getDouble(2) === 5.0 && f.getDouble(5) === 7.0)
    assert(f.isNullAt(6) && f.isNullAt(7))
    // n = 1 on one side → NULL (variance undefined)
    val one = Seq(("a", 5L), ("b", 7L), ("b", 8L)).toDF("variant", "x")
    assert(Eval.abTest(one, 1.0).head().isNullAt(6))
  }

  test("abTest enforces exactly two variants — 1- and 3-variant inputs ERROR") {
    import graft.operators.Eval
    // a single variant makes `paired` empty; the runtime contract check
    // must still FIRE (it rides the always-one-row variant-count frame,
    // not the possibly-empty pair frame) instead of silently returning 0
    // rows for a caller bug like a bad hash-bucket expression
    val single = Seq(("only", 1L), ("only", 2L)).toDF("variant", "x")
    val e1 = intercept[Exception] { Eval.abTest(single, 1.0).collect() }
    assert(e1.getMessage.contains("exactly two variants"))
    val three = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("variant", "x")
    val e3 = intercept[Exception] { Eval.abTest(three, 1.0).collect() }
    assert(e3.getMessage.contains("exactly two variants"))
  }

  test("spearmanByGroup drops NULL pairs up front (pairwise deletion)") {
    import graft.operators.Eval
    // the two NULL-bearing rows must not affect n or the coefficient —
    // identical answer to the frame with complete pairs only
    val full = Seq(("g", Some(1.0), Some(1.0)), ("g", Some(2.0), Some(2.0)),
      ("g", Some(3.0), Some(3.0)), ("g", None, Some(9.0)),
      ("g", Some(9.0), None)).toDF("g", "x", "y")
    val r = Eval.spearmanByGroup(full, "g", "x", "y").head()
    assert(r.getLong(1) === 3L)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("spearmanByGroup: +1/-1 on monotone data, tie-averaged ranks, NULL on constants") {
    import graft.operators.Eval
    val rows = Seq(
      // group a: y = x³ (monotone, nonlinear) → spearman exactly 1
      ("a", 1L, 1L), ("a", 2L, 8L), ("a", 3L, 27L), ("a", 4L, 64L),
      // group b: strictly decreasing → exactly -1
      ("b", 1L, 9L), ("b", 2L, 4L), ("b", 3L, 1L),
      // group c: x constant → NULL
      ("c", 5L, 1L), ("c", 5L, 2L)
    ).toDF("g", "x", "y")
    val got = Eval.spearmanByGroup(rows, "g", "x", "y").orderBy("g").collect()
    assert(got(0).getDouble(2) === 1.0)
    assert(got(1).getDouble(2) === -1.0)
    assert(got(2).isNullAt(2))
    // tie handling: x ties share an average rank; textbook rho for
    // x=(1,2,2,4) vs y=(1,2,3,4): ranks x=(1,2.5,2.5,4) y=(1,2,3,4) →
    // rho = cov/(sd·sd) = 0.9486832980505138 → 6dp
    val tied = Seq(("t", 1L, 1L), ("t", 2L, 2L), ("t", 2L, 3L), ("t", 4L, 4L))
      .toDF("g", "x", "y")
    val rho = Eval.spearmanByGroup(tied, "g", "x", "y").head().getDouble(2)
    assert(rho === 0.948683)
  }

  test("spearmanByGroup invariances: monotone transform, sign flip, swap symmetry") {
    import graft.operators.Eval
    val rows = Seq(("g", 3L, 9L), ("g", 1L, 2L), ("g", 7L, 5L),
      ("g", 4L, 4L), ("g", 2L, 8L)).toDF("g", "x", "y")
    def rho(df: org.apache.spark.sql.DataFrame) =
      Eval.spearmanByGroup(df, "g", "x", "y").head().getDouble(2)
    val base = rho(rows)
    // strictly increasing transform of x preserves ranks exactly
    assert(rho(rows.withColumn("x", col("x") * 2 + 1)) === base)
    // negating x reverses every rank: rho flips sign
    assert(rho(rows.withColumn("x", -col("x"))) === -base)
    // swapping the two columns is symmetric
    val swapped = rows.select(col("g"), col("y").as("x"), col("x").as("y"))
    assert(rho(swapped) === base)
  }

  test("abTest is antisymmetric under variant relabeling") {
    import graft.operators.Eval
    val units = Seq(("a", 1L), ("a", 3L), ("a", 5L),
      ("b", 2L), ("b", 2L), ("b", 8L)).toDF("variant", "x")
    val fwd = Eval.abTest(units, 1.0).head()
    // relabel so the lexicographic pair order flips sides
    val relabeled = units.withColumn("variant",
      when(col("variant") === "a", "z").otherwise("b"))
    val rev = Eval.abTest(relabeled, 1.0).head()
    assert(rev.getString(0) === "b" && rev.getString(3) === "z")
    assert(rev.getDouble(6) === -fwd.getDouble(6)) // t negates
    assert(rev.getDouble(7) === -fwd.getDouble(7)) // d negates
  }

  test("sourceSimilarity: hand-built overlap; disjoint pairs omitted") {
    val docs = Seq(
      (1L, "apple banana cherry", "s1"),
      (2L, "banana cherry date", "s2"),
      (3L, "zebra", "s3")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceSimilarity(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // s1∩s2 = {banana, cherry} = 2; union = 4 → jaccard 0.5
    assert(got(("s1", "s2")) === ((3L, 3L, 2L, 0.5)))
    // s3 shares nothing → no rows
    assert(!got.keySet.exists { case (a, b) => a == "s3" || b == "s3" })
  }

  test("Eval.confusion: textbook 3-class cells, NULL where undefined") {
    import graft.operators.Eval
    // gold x: 2 correct, 1 predicted as y → support 3, tp 2, fn 1
    // gold y: 1 correct, 1 predicted as z → support 2, tp 1, fn 1
    // z never true, predicted once (fp) → support 0, no recall
    val rows = Seq(("x", "x"), ("x", "x"), ("x", "y"), ("y", "y"), ("y", "z"))
    val got = Eval.confusion(rows.toDF("gold", "pred")).orderBy("label").collect()
    val x = got(0)
    assert((x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)) ===
      (("x", 3L, 2L, 0L, 1L)))
    assert(x.getDouble(5) === 1.0) // precision 2/2
    assert(x.getDouble(6) === 0.666667) // recall 2/3
    assert(x.getDouble(7) === 0.8) // f1 = 2·2/(4+0+1)
    val z = got(2)
    assert((z.getString(0), z.getLong(1), z.getLong(2), z.getLong(3), z.getLong(4)) ===
      (("z", 0L, 0L, 1L, 0L)))
    assert(z.getDouble(5) === 0.0) // precision 0/1 — defined, zero
    assert(z.isNullAt(6), "never-true label must have NULL recall")
    assert(z.getDouble(7) === 0.0)
  }

  test("Eval.confusion macro-F1 folds from the per-class rows") {
    import graft.operators.Eval
    val rows = Seq(("x", "x"), ("y", "x"), ("y", "y"))
    val f1s = Eval.confusion(rows.toDF("gold", "pred"))
      .agg(avg("f1")).head().getDouble(0)
    // x: f1 = 2·1/(2+1+0) = 2/3; y: f1 = 2·1/(2+0+1) = 2/3
    assert(math.abs(f1s - 0.666667) < 1e-9)
  }

  test("clusterTopics ranks the cluster-specific token above the shared one") {
    import spark.implicits._
    // centroids = ids 0 and 100 (every-100th); apple-docs cluster at [1,0],
    // banana-docs at [0,1], "common" everywhere
    val linked = Seq(
      (0L, Seq(1f, 0f), "apple common"),
      (1L, Seq(1f, 0.1f), "apple common"),
      (2L, Seq(1f, -0.1f), "apple common"),
      (100L, Seq(0f, 1f), "banana common"),
      (101L, Seq(0.1f, 1f), "banana common")
    ).toDF("id", "vec", "text")
    val got = TextAnalysis.clusterTopics(linked, 100, 2)
      .as[(Long, Int, String, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._5)).toSeq).toMap
    // cluster 0: apple lift = (3·5)/(3·3) = 1.666667 over common's 1.0
    assert(got(0L) === Seq(("apple", 1.666667), ("common", 1.0)))
    // cluster 100: banana lift = (2·5)/(2·2) = 2.5
    assert(got(100L) === Seq(("banana", 2.5), ("common", 1.0)))
  }

  test("auc: tie-aware midrank value exact; perfect separation 1.0; one-class NULL") {
    import spark.implicits._
    import graft.operators.Eval
    // pairs: tie at 0.9 (0.5 credit), two wins, one loss → 2.5/4 = 0.625
    val got = Eval.auc(Seq(
      (true, 0.9), (false, 0.9), (true, 0.5), (false, 0.2))
      .toDF("gold", "score")).head()
    assert(got.getLong(0) === 2L && got.getLong(1) === 2L)
    assert(got.getDouble(2) === 0.625)
    val perfect = Eval.auc(Seq(
      (true, 0.9), (true, 0.8), (false, 0.1)).toDF("gold", "score")).head()
    assert(perfect.getDouble(2) === 1.0)
    val oneClass = Eval.auc(Seq(
      (true, 0.9), (true, 0.1)).toDF("gold", "score")).head()
    assert(oneClass.isNullAt(2))
  }

  test("invertedIndex: exact df, ascending postings, bounded sample") {
    import spark.implicits._
    val docs = Seq(
      (3L, "alpha beta"), (1L, "alpha gamma alpha"), (2L, "alpha delta"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(docs, maxPostings = 2)
      .as[(String, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // df counts DOCUMENTS (alpha appears twice in doc 1 but df=3);
    // postings ascend and cap at 2
    assert(got("alpha") === ((3L, "1,2")))
    assert(got("beta") === ((1L, "3")))
    assert(got("gamma") === ((1L, "1")))
    assert(got("delta") === ((1L, "2")))
  }

  test("tokenEntropy: 0 for constant docs, ln(k) for uniform docs, empty docs dropped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam"),       // constant → H = 0
      (2L, "a b c d"),                   // uniform over 4 → H = ln 4
      (3L, ""),                          // no tokens → no row
      (4L, "x x y")                      // H = -(2/3)ln(2/3) - (1/3)ln(1/3)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) === Seq(1L, 2L, 4L))
    val h1 = got(0); val h2 = got(1); val h4 = got(2)
    assert(h1._2 === 4L && h1._3 === 1L && h1._4 === 0.0)
    assert(h2._4 === math.floor(math.log(4.0) * 10000 + 0.5) / 10000) // 1.3863
    val expect4 = BigDecimal(
      math.floor(-(2.0 / 3) * math.log(2.0 / 3) * 1e6 + 0.5) / 1e6 +
        math.floor(-(1.0 / 3) * math.log(1.0 / 3) * 1e6 + 0.5) / 1e6)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(h4._4 === expect4)
  }

  test("thresholdSweep emits one exact confusion row per attained score") {
    import spark.implicits._
    import graft.operators.Eval
    val scored = Seq(
      (true, 0.9), (false, 0.5), (true, 0.5), (false, 0.1))
      .toDF("gold", "score")
    val got = Eval.thresholdSweep(scored)
      .orderBy(col("thr").desc)
      .as[(Double, Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got === Seq(
      (0.9, 1L, 0L, 1L, 1.0, 0.5, 0.666667),
      (0.5, 2L, 1L, 0L, 0.666667, 1.0, 0.8),
      (0.1, 2L, 2L, 0L, 0.5, 1.0, 0.666667)))
  }

  test("thresholdSweep with no positives: recall and f1 are NULL, precision 0") {
    import spark.implicits._
    import graft.operators.Eval
    val got = Eval.thresholdSweep(
      Seq((false, 0.7), (false, 0.2)).toDF("gold", "score"))
      .orderBy(col("thr").desc).collect()
    got.foreach { r =>
      assert(r.getDouble(4) === 0.0) // precision = 0/(0+fp)
      assert(r.isNullAt(5)) // recall = tp/0 → NULL
      assert(r.getDouble(6) === 0.0) // f1 = 0/(0+fp+0) — denominator nonzero
    }
  }

  test("stopwordConfidence: ratio of list hits, 0.0 for empty docs") {
    import spark.implicits._
    val df = Seq("the cat and the dog", "zzz qqq", "")
      .toDF("text")
      .select(TextAnalysis.stopwordConfidence(col("text")).as("c"))
      .as[Double].collect().toSeq
    // "the", "and", "the" are en-stopwords out of 5 tokens
    assert(df === Seq(0.6, 0.0, 0.0))
  }

  test("labelAgreement degenerate single-class margins yield NULL kappa, po=pe=1") {
    import spark.implicits._
    import graft.operators.Eval
    val got = Eval.labelAgreement(
      Seq.fill(7)(("en", "en")).toDF("gold", "pred")).head()
    assert(got.getDouble(2) === 1.0 && got.getDouble(3) === 1.0)
    assert(got.isNullAt(4))
  }

  test("collocations: exact hand-checked counts and PMI; rare pairs filtered") {
    // uni: a=3 b=3 c=1 (Nu=7); bi: (a,b)=3 (b,a)=1 (b,c)=1 (Nb=5)
    val fixture = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.collocations(fixture, minCount = 2L).collect()
    assert(got.length === 1) // (b,a)/(b,c) fall under the count floor
    val r = got.head
    assert((r.getString(0), r.getString(1)) === ("a", "b"))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((3L, 3L, 3L)))
    val expected = BigDecimal(math.log(3.0 * 7 * 7 / (5.0 * 3 * 3)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(5) === expected)
  }

  test("hillTail: exact MLE on hand counts; xmin-count types weigh in; " +
      "all-at-xmin tail → NULL alpha") {
    // counts: a=8 b=4 c=2 d=2 e=1; xmin=2 → tail {8,4,2,2}, n=4
    // Σln(x/2) = ln4 + ln2 + 0 + 0; α = 1 + 4/Σ (8dp-rounded terms)
    val fixture = Seq(
      (1L, ("a " * 8 + "b " * 4 + "c c d d e").trim)).toDF("doc_id", "text")
    val got = TextAnalysis.hillTail(fixture, 2L).collect()(0)
    assert((got.getLong(0), got.getLong(1)) === ((2L, 4L)))
    def r8(x: Double) = BigDecimal(x).setScale(8,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val s = r8(math.log(4.0 / 2)) + r8(math.log(2.0 / 2)) +
      r8(math.log(8.0 / 2)) + r8(math.log(2.0 / 2))
    assert(got.getDouble(2) === BigDecimal(1.0 + 4.0 / s).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    // every tail type exactly at xmin → Σ = 0 → alpha undefined (NULL)
    val flat = Seq((1L, "x x y y")).toDF("doc_id", "text")
    val g2 = TextAnalysis.hillTail(flat, 2L).collect()(0)
    assert(g2.getLong(1) === 2L && g2.isNullAt(2))
  }

  test("sentenceDupRate: instance-level dup share per source; empty " +
      "fragments dropped; trim collapses padding") {
    val docs = Seq(
      (1L, "s1", "Hello there. Hello there. Bye now."),
      (2L, "s1", " Hello there.  "),   // same sentence after trim
      (3L, "s2", "Unique one! Unique two?"),
      (4L, "s2", "...")                // only empty fragments
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.sentenceDupRate(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(_._1)
    // s1: 4 instances {Hello there ×3, Bye now} → 2 distinct → 0.5
    assert(got === Seq(("s1", 4L, 2L, 0.5), ("s2", 2L, 2L, 0.0)))
  }
}
