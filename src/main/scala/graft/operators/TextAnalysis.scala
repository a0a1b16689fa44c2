package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: tokenization, token
  * counting, quality scoring, language ID. All pure per-row column math —
  * embarrassingly parallel, no shuffle, whole-stage-codegen'd; at 100 TB these
  * run at scan speed.
  *
  * Every function has an exact DuckDB mirror (kept in [[TextAnalysis.Sql]])
  * so outputs are oracle-hashable.
  */
object TextAnalysis {

  /** Word tokens: lowercase, split on non-alphanumeric runs, drop empties. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** BPE-ish token count: alpha runs + digit runs + individual symbols. */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Per-language stopword lists for the n-gram/stopword language heuristic. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "du", "pour"),
    "es" -> Seq("el", "los", "y", "es", "un", "una", "de", "que", "por", "se"))

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Per-document stats: `(doc_id, n_tokens, n_bpe_tokens, uniq_ratio,
    * stop_ratio, punct_ratio, quality)` — the quality score is a fixed
    * weighted combination of length/stopword/uniqueness/punctuation signals.
    */
  /** The quality score as a standalone column expression (the last column of
    * [[stats]]; [[Sql.qualityExpr]] is its DuckDB mirror) — reusable by any
    * operator that ranks or thresholds on quality without paying a join
    * against the stats frame.
    */
  def quality(text: Column): Column = round(qualityRaw(text), 4)

  /** [[quality]] WITHOUT the 4dp round — the form to use when the score
    * feeds ORDERING or further arithmetic that must agree across engines.
    * The weighted sum of small-denominator ratios lands on exact `.xxxx5`
    * decimal boundaries disproportionately often, and `round()` at such a
    * boundary is engine-dependent (Spark rounds the shortest decimal repr
    * half-up; DuckDB rounds `x·10⁴` in float — the q222 divergence class,
    * observed live on quality at sf0.1). The UNROUNDED double is mirrored
    * op-for-op by [[Sql.qualityRawExpr]] and is bit-identical in both
    * engines.
    */
  def qualityRaw(text: Column): Column = {
    val t = tokens(text)
    val nTok = size(t).cast("double")
    val nUniq = size(array_distinct(t)).cast("double")
    val stop = hitCount(t, Stopwords.head._2).cast("double")
    val punct = (length(text) -
      length(regexp_replace(text, "[.,!?;:]", ""))).cast("double")
    val chars = length(text).cast("double")
    lit(0.4) * (nUniq / greatest(nTok, lit(1.0))) +
      lit(0.3) * (stop / greatest(nTok, lit(1.0))) +
      lit(0.2) * least(nTok / lit(200.0), lit(1.0)) +
      lit(0.1) * (lit(1.0) - punct / greatest(chars, lit(1.0)))
  }

  def stats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val nTok = size(t).cast("double")
    val nUniq = size(array_distinct(t)).cast("double")
    val stop = hitCount(t, Stopwords.head._2).cast("double")
    val punct = (length(col(textCol)) -
      length(regexp_replace(col(textCol), "[.,!?;:]", ""))).cast("double")
    val chars = length(col(textCol)).cast("double")
    // ratios and quality are UNROUNDED mirrored-op doubles (each a fixed
    // IEEE expression over exact integers — bit-identical across engines);
    // a 4dp round here is the half-boundary class that can diverge between
    // Spark and DuckDB at scales beyond the sf0.01 gate (the q222 lesson)
    docs.select(
      col(idCol),
      size(t).as("n_tokens"),
      tokenCountBpe(col(textCol)).as("n_bpe_tokens"),
      (nUniq / greatest(nTok, lit(1.0))).as("uniq_ratio"),
      (stop / greatest(nTok, lit(1.0))).as("stop_ratio"),
      (punct / greatest(chars, lit(1.0))).as("punct_ratio"),
      qualityRaw(col(textCol)).as("quality"))
  }

  /** Intra-document repetition (the duplicate-n-gram family of quality
    * signals large-corpus filters use — a heavily repeated page is boiler-
    * plate/spam): per doc, total n-gram occurrences, distinct n-grams, the
    * duplicate fraction `1 − distinct/total`, and the single most frequent
    * n-gram's share of all occurrences. One (doc, ngram) group-count —
    * shuffle ∝ corpus tokens, no pair space; at 100 TB this is a plain
    * two-level aggregation.
    */
  def repetition(
      docs: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = docs
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), explode(transform(
        sequence(lit(1), greatest(size(col("toks")) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(col("toks"), i, lit(n))))).as("g"))
    grams.groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(
        sum(col("c")).as("n_ngrams"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_count"))
      .select(col(idCol),
        col("n_ngrams"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_ngrams").cast("double"), 4)
          .as("dup_ratio"),
        round(col("top_count").cast("double") / col("n_ngrams").cast("double"), 4)
          .as("top_ngram_ratio"))
  }

  /** DSIR-style hashed n-gram importance weighting (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"): score
    * each raw document by how much its hashed-bigram profile looks like a
    * TARGET distribution (a trusted/high-quality subset named by
    * `targetPred`) versus the RAW corpus distribution. Features are bigrams
    * hashed into `buckets` buckets ([[graft.functions.Hash60]] — the fixed
    * hashed-feature space that makes the two distributions comparable and
    * the state O(buckets), not O(vocab)); per-bucket weight is the
    * Laplace-smoothed log-likelihood ratio
    * `ln((ct+1)/(T+B)) − ln((cr+1)/(R+B))`, and a document's importance is
    * the mean weight over its feature instances. Upweight = "target-like";
    * downsample the low tail or feed the scores to a resampling draw
    * ([[Pipeline.mixtureSample]]'s hash-threshold machinery).
    *
    * Determinism contract (the q91 convention): the per-bucket log-ratio is
    * rounded to 6dp and summed per doc as DECIMAL(18,9) — exact,
    * order-independent — then the mean is a double rounded to 4dp. All ln
    * inputs are exact doubles (integer counts, integer denominators), so
    * both engines see identical arguments.
    *
    * Scale posture: per-row tokenize+hash (scan-speed), two
    * bucket-keyed aggregations bounded by `buckets` rows, one broadcast
    * ≤`buckets`-row weight join, one doc-keyed aggregation. No pair space,
    * no window, no per-source skew (buckets are hash-uniform). Docs with
    * <2 tokens carry no features and are omitted.
    *
    * Output `(doc_id, n_feats, importance)`.
    */
  def importanceWeights(
      docs: DataFrame,
      targetPred: Column,
      buckets: Int = 256,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    importanceFeatures(docs, buckets, idCol, textCol)
      .join(broadcast(importanceWeightTable(docs, targetPred, buckets, idCol, textCol)),
        Seq("b"))
      .groupBy(col(idCol))
      .agg(sum(col("lw")).as("slw"), count(lit(1)).as("n_feats"))
      .select(col(idCol), col("n_feats"),
        round(col("slw").cast("double") / col("n_feats"), 4).as("importance"))

  /** `(idCol, b)` hashed-bigram feature instances — one row per bigram
    * occurrence, bucket = hash60(w1 ⊔ w2) mod `buckets`.
    */
  private def importanceFeatures(docs: DataFrame, buckets: Int,
      idCol: String, textCol: String): DataFrame = {
    import graft.functions.Hash60
    docs.select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        explode(transform(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
          (w, i) => Hash60(concat(w, lit(" "), element_at(col("toks"), i + 2)))
            % buckets)).as("b"))
  }

  /** The fitted importance model: exactly `buckets` rows `(b, lw)` — the
    * Laplace-smoothed log-likelihood ratio for EVERY bucket, including ones
    * the raw corpus never hit (`ct = cr = 0` degenerates to
    * `ln((R+B)/(T+B))`), so scoring a future stream never misses a lookup.
    * This is the persistable "model" artifact of the DSIR fit — write it
    * with a plain parquet save, reload anywhere.
    */
  def importanceWeightTable(
      docs: DataFrame,
      targetPred: Column,
      buckets: Int = 256,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val feats = docs.select(col(idCol), targetPred.as("_tgt"),
        tokens(col(textCol)).as("toks"))
      .select(col("_tgt"),
        explode(transform(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
          (w, i) => graft.functions.Hash60(
            concat(w, lit(" "), element_at(col("toks"), i + 2))) % buckets)).as("b"))
    val raw = feats.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgt = feats.where(col("_tgt")).groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val tot = feats.agg(
      count(lit(1)).as("r_tot"),
      sum(when(col("_tgt"), 1L).otherwise(0L)).as("t_tot"))
    val allBuckets = docs.sparkSession.range(1)
      .select(explode(sequence(lit(0L), lit(buckets - 1L))).as("b"))
    allBuckets
      .join(raw, Seq("b"), "left")
      .join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("b"),
        round(
          log((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
            (col("t_tot") + buckets)) -
          log((coalesce(col("cr"), lit(0L)) + 1).cast("double") / (col("r_tot") + buckets)), 6)
          .cast(DecimalType(18, 9)).as("lw"))
  }

  /** Apply a fitted [[importanceWeightTable]] as a PURE PROJECTION: the
    * ≤`buckets`-row table is collected into an in-row lookup array
    * (documented bounded collect — the codebook-broadcast convention), and
    * each document's score is an in-row fold over its own bigram buckets.
    * Zero shuffle, whole-stage codegen, and therefore directly usable on a
    * STREAMING frame (no stateful aggregation, no watermark needed) — the
    * serving/ingest side of the DSIR split: fit once on the corpus
    * ([[importanceWeightTable]]), score every arriving batch here.
    * Same output contract as [[importanceWeights]]; identical values when
    * scoring the fit corpus itself (the oracle cross-check).
    */
  def importanceScore(
      docs: DataFrame,
      weightTable: DataFrame,
      buckets: Int = 256,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.Hash60
    val lws = new Array[java.math.BigDecimal](buckets)
    weightTable.collect().foreach { r =>
      lws(r.getLong(0).toInt) = r.getDecimal(1)
    }
    require(lws.forall(_ != null), s"weight table must cover all $buckets buckets")
    val lwArr = array(lws.map(w => lit(w).cast(DecimalType(18, 9))).toIndexedSeq: _*)
    val bg = transform(
      slice(col("_toks"), lit(1), greatest(size(col("_toks")) - 1, lit(0))),
      (w, i) => Hash60(concat(w, lit(" "), element_at(col("_toks"), i + 2))) % buckets)
    docs
      .select(col(idCol), tokens(col(textCol)).as("_toks"))
      .withColumn("_bg", bg)
      .where(size(col("_bg")) > 0)
      .select(col(idCol), size(col("_bg")).cast("long").as("n_feats"),
        aggregate(col("_bg"),
          lit(java.math.BigDecimal.ZERO).cast(DecimalType(28, 9)),
          // decimal + widens to (29,9); cast back to the accumulator type —
          // scale is unchanged so the value is exact (|lw| < 10, and a doc
          // would need ~10^19 bigrams to overflow 19 integer digits)
          (acc, b) => (acc + element_at(lwArr, b.cast("int") + 1))
            .cast(DecimalType(28, 9))).as("_slw"))
      .select(col(idCol), col("n_feats"),
        round(col("_slw").cast("double") / col("n_feats"), 4).as("importance"))
  }

  /** Multinomial Naive Bayes over hashed-bigram features — the trainable
    * curation classifier (the fastText/CCNet shape: cheap features, linear
    * decision, corpus-scale training is just counting): [[nbTrain]] counts
    * per-(label, bucket) feature instances into Laplace-smoothed
    * log-likelihoods plus log priors; [[nbClassify]] scores every document
    * against every class and takes the argmax. Everything derives from
    * exact integer counts through 6dp-rounded `ln` terms summed as DECIMAL
    * (the q91/q121 convention), so training AND inference are
    * bit-reproducible in any engine — the property Spark MLlib's float
    * reductions cannot give an oracle.
    *
    * Scale posture: training is two hash aggregations (bounded by
    * labels×buckets and labels); the model is a labels×buckets grid
    * (broadcast); classification fans each document's features out by the
    * (few) classes, one (doc, label) aggregation, and a per-doc argmax over
    * |labels| rows.
    */
  def nbTrain(
      docs: DataFrame,
      labelCol: String = "lang",
      buckets: Int = 256,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.Hash60
    val feats = docs.select(col(labelCol).as("label"),
        tokens(col(textCol)).as("toks"))
      .select(col("label"),
        explode(transform(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
          (w, i) => Hash60(concat(w, lit(" "), element_at(col("toks"), i + 2)))
            % buckets)).as("b"))
    val cb = feats.groupBy(col("label"), col("b")).agg(count(lit(1)).as("_c"))
    val ctot = feats.groupBy(col("label")).agg(count(lit(1)).as("_ct"))
    val nTot = docs.agg(count(lit(1)).as("_n"))
    val priors = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("_nl"))
      .crossJoin(broadcast(nTot))
      .select(col("label"),
        round(log(col("_nl").cast("double") / col("_n")), 6)
          .cast(DecimalType(18, 9)).as("prior"))
    val grid = docs.select(col(labelCol).as("label")).distinct()
      .select(col("label"),
        explode(sequence(lit(0L), lit(buckets - 1L))).as("b"))
    grid
      .join(cb, Seq("label", "b"), "left")
      .join(ctot, Seq("label"), "left")
      .join(broadcast(priors), Seq("label"))
      .select(col("label"), col("b"),
        round(log((coalesce(col("_c"), lit(0L)) + 1).cast("double") /
          (coalesce(col("_ct"), lit(0L)) + buckets)), 6)
          .cast(DecimalType(18, 9)).as("lcp"),
        col("prior"))
  }

  /** Apply an [[nbTrain]] model: `(idCol, pred_label, score)` — argmax over
    * classes of `prior + Σ_features lcp(label, bucket)`, ties to the
    * lexicographically smaller label; score is the winning log-posterior
    * (unnormalized), rounded to 4dp IN DECIMAL SPACE — `round` on the
    * DecimalType sum (model values are exact DECIMAL(18,9), so the sum is
    * exact and the half-away-from-zero decimal round is engine-identical;
    * mirror with DuckDB `round(score, 4)`, NOT a `::DECIMAL(18,4)` cast,
    * which DuckDB rounds half-to-even). A double-space `round(,4)` here
    * half-boundary diverged between Spark and DuckDB at sf0.1, 1 doc in
    * 5000. Documents with no bigrams are omitted (the q91 convention).
    */
  def nbClassify(
      docs: DataFrame,
      model: DataFrame,
      buckets: Int = 256,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Hash60
    val feats = docs.select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        explode(transform(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
          (w, i) => Hash60(concat(w, lit(" "), element_at(col("toks"), i + 2)))
            % buckets)).as("b"))
    val scored = feats
      .join(broadcast(model), Seq("b"))
      .groupBy(col(idCol), col("label"))
      .agg((first(col("prior")) + sum(col("lcp"))).as("_score"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("_score").desc, col("label"))
    scored.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col(idCol), col("label").as("pred_label"),
        round(col("_score"), 4).cast("double").as("score"))
  }

  /** [[nbClassify]] as a PURE PROJECTION (the [[importanceScore]] split):
    * the labels×buckets model collects into in-row lookup arrays (bounded
    * by construction) and every document scores all classes in one
    * expression — per-class decimal fold over its own bigram buckets, then
    * an in-row argmax (ties to the smaller label via the negated label
    * rank). Zero shuffle, whole-stage codegen, stream-safe; identical
    * output to [[nbClassify]] (the oracle cross-check).
    */
  def nbClassifyInRow(
      docs: DataFrame,
      model: DataFrame,
      buckets: Int = 256,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.Hash60
    val rows = model.collect()
    val labels = rows.map(_.getString(0)).distinct.sorted
    val lcp = labels.map { l =>
      val arr = new Array[java.math.BigDecimal](buckets)
      rows.filter(_.getString(0) == l).foreach(r =>
        arr(r.getLong(1).toInt) = r.getDecimal(2))
      require(arr.forall(_ != null), s"model must cover all $buckets buckets for $l")
      arr
    }
    val priors = labels.map(l =>
      rows.find(_.getString(0) == l).get.getDecimal(3))
    val bg = transform(
      slice(col("_toks"), lit(1), greatest(size(col("_toks")) - 1, lit(0))),
      (w, i) => Hash60(concat(w, lit(" "), element_at(col("_toks"), i + 2))) % buckets)
    val scoreCols = labels.indices.map { i =>
      val arr = array(lcp(i).map(v => lit(v).cast(DecimalType(18, 9))).toIndexedSeq: _*)
      val s = lit(priors(i)).cast(DecimalType(28, 9)) +
        aggregate(col("_bg"), lit(java.math.BigDecimal.ZERO).cast(DecimalType(28, 9)),
          (acc, b) => (acc + element_at(arr, b.cast("int") + 1)).cast(DecimalType(28, 9)))
      struct(s.cast(DecimalType(29, 9)).as("s"), lit(-i).as("nr"), lit(labels(i)).as("l"))
    }
    val best =
      if (scoreCols.size == 1) scoreCols.head else greatest(scoreCols: _*)
    docs.select(col(idCol), tokens(col(textCol)).as("_toks"))
      .withColumn("_bg", bg)
      .where(size(col("_bg")) > 0)
      .withColumn("_best", best)
      .select(col(idCol), col("_best.l").as("pred_label"),
        round(col("_best.s"), 4).cast("double").as("score"))
  }

  /** Bigram language-model familiarity score — the perplexity-filter signal
    * (CCNet/KenLM style) re-expressed Spark-first: train Laplace-smoothed
    * bigram counts ON the corpus itself, then score each document by the
    * mean log-probability of its bigrams. Low scores = text whose word
    * transitions the corpus has never seen (gibberish, OCR noise, wrong
    * language); high scores = fluent in-domain text.
    *
    * `lm_score(d) = mean over bigrams (w1,w2) of
    *   ln((C(w1,w2) + α) / (C(w1) + α·V))`, V = unigram vocabulary size.
    *
    * Determinism contract: each bigram's log-prob is rounded to 6dp and
    * summed as DECIMAL(18,9) — exact, order-independent addition — then the
    * mean is computed in double and rounded to 4dp. The ln inputs are exact
    * doubles (integer counts + exact α arithmetic), so Spark and DuckDB see
    * identical arguments.
    *
    * Scale posture: two word-count aggregations (the natural LM-training
    * shuffles, partial-agg'd map-side) + two 1:1 count-hydration joins on
    * (w1,w2)/(w1) + a broadcast 1-row vocab size. No pair space, no window;
    * documents with <2 tokens carry no bigrams and are omitted.
    */
  /** Per-doc adjacent-token bigram stream `(idCol, w1, w2)` off a
    * `(idCol, toks)` frame — the shared staging of the LM scorers
    * ([[ngramLmScore]], [[knBigramScore]]): ONE definition of the
    * off-by-one-prone slice/element_at indexing.
    */
  private def bigramsOf(toked: DataFrame, idCol: String): DataFrame =
    toked
      .select(col(idCol), explode(transform(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
        (w, i) => struct(w.as("w1"), element_at(col("toks"), i + 2).as("w2"))))
        .as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  def ngramLmScore(
      docs: DataFrame, alpha: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val toked = docs.select(col(idCol), tokens(col(textCol)).as("toks"))
    val bigrams = bigramsOf(toked, idCol)
    val c2 = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = bigrams.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = toked.select(explode(col("toks")).as("w"))
      .agg(countDistinct(col("w")).as("vocab"))
    bigrams
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("lp",
        round(log((col("c2") + lit(alpha)) /
          (col("c1") + lit(alpha) * col("vocab"))), 6)
          .cast(DecimalType(18, 9)))
      .groupBy(col(idCol))
      .agg(sum(col("lp")).as("sum_lp"), count(lit(1)).as("n_bigrams"))
      .select(col(idCol), col("n_bigrams"),
        round(col("sum_lp").cast("double") / col("n_bigrams"), 4).as("lm_score"))
  }

  /** Per-document token Shannon entropy (nats) — the lexical-diversity
    * quality signal: low entropy = repetitive/template text (a sharper
    * cousin of [[repetition]]'s duplicate fractions), high entropy =
    * diverse vocabulary. Output `(doc_id, n_tokens, n_uniq, entropy)`,
    * entropy 4dp; token-less docs emit nothing.
    *
    * Determinism: each `−p·ln p` term is rounded 6dp and summed through
    * DECIMAL(18,9) — the [[ngramLmScore]] convention, the one float-log
    * shape already proven to hash-match across engines. Scale: two hash
    * aggregations and one equi-join, all keyed by `doc_id` (+token) —
    * high-cardinality keys, map-side partials, no windows.
    */
  /** Interpolated Kneser–Ney bigram LM score per document — the
    * production-grade upgrade of [[ngramLmScore]]'s Laplace smoothing (the
    * standard perplexity-filter LM family: KN backs off to CONTINUATION
    * counts, so "francisco" — frequent but only ever after "san" — stops
    * looking like a plausible continuation everywhere the way raw-frequency
    * smoothing makes it). Per bigram, with discount `d`:
    * `p = max(c₁₂ − d, 0)/c₁ + (d·N₁₊(w₁·)/c₁)·N₁₊(·w₂)/T` where `c₁` is
    * w₁'s bigram-start count, `N₁₊(w₁·)`/`N₁₊(·w₂)` the distinct right/left
    * continuation counts and `T` the total distinct bigram types. Trained
    * on the corpus itself and scored in-corpus (every scored bigram has
    * c₁₂ ≥ 1 — the [[ngramLmScore]] contract). Output
    * `(doc_id, n_bigrams, kn_score)`: mean log-prob at 4dp.
    *
    * Determinism: each bigram's log-prob is one double over exact longs
    * rounded 6dp → DECIMAL(18,9) before the per-doc fold. Scale shape:
    * count/continuation tables are hash aggs keyed by token (bounded by
    * vocabulary), the score pass is the doc-bigram stream equi-joining
    * those tables — no windows, no sorts, type total is a one-row
    * broadcast.
    */
  def knBigramScore(
      docs: DataFrame, discount: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val bigrams = bigramsOf(
      docs.select(col(idCol), tokens(col(textCol)).as("toks")), idCol)
    val c2 = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = bigrams.groupBy(col("w1"))
      .agg(count(lit(1)).as("c1"), countDistinct(col("w2")).as("r1"))
    val l2 = c2.groupBy(col("w2")).agg(count(lit(1)).as("l2"))
    val types = c2.agg(count(lit(1)).as("types"))
    bigrams
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .join(l2, Seq("w2"))
      .crossJoin(broadcast(types))
      .withColumn("lp",
        round(log(
          greatest(col("c2") - lit(discount), lit(0.0)) / col("c1") +
          lit(discount) * col("r1") / col("c1") *
            (col("l2").cast("double") / col("types"))), 6)
          .cast(DecimalType(18, 9)))
      .groupBy(col(idCol))
      .agg(sum(col("lp")).as("sum_lp"), count(lit(1)).as("n_bigrams"))
      .select(col(idCol), col("n_bigrams"),
        round(col("sum_lp").cast("double") / col("n_bigrams"), 4).as("kn_score"))
  }

  /** Distinct-n diversity per source: for each n-gram order, the fraction
    * of n-gram OCCURRENCES that are distinct — the standard lexical
    * diversity dashboard (low distinct-2 = template/boilerplate-heavy or
    * model-generated text; the corpus-level twin of [[repetition]]'s
    * per-doc signal). Output `(source, n, total_ngrams, distinct_ngrams,
    * diversity)` with diversity at 6dp.
    *
    * Scale shape: n-grams form IN-ROW (transform over the token array —
    * nothing fans out before the aggregation), then ONE hash agg per order
    * with a partial-aggregating `count` + `countDistinct` keyed by source.
    * No windows, no joins.
    */
  def distinctNgrams(
      docs: DataFrame, ns: Seq[Int] = Seq(1, 2),
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "n-gram orders must be >= 1")
    // every order's n-grams form in ONE row pass (each tagged with its n,
    // concatenated in-row), so the corpus is scanned and tokenized once —
    // a per-order union would re-read and re-split the full table per n
    val tagged = ns.map { n =>
      val grams =
        if (n == 1) col("toks")
        else transform(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - (n - 1), lit(0))),
          (_, i) => concat_ws(" ",
            slice(col("toks"), i + 1, lit(n))))
      transform(grams, g => struct(lit(n).as("n"), g.as("g")))
    }.reduce(concat(_, _))
    docs.select(col(sourceCol).as("source"), tokens(col(textCol)).as("toks"))
      .select(col("source"), explode(tagged).as("t"))
      .groupBy(col("source"), col("t.n").as("n"))
      .agg(count(lit(1)).as("total_ngrams"),
        countDistinct(col("t.g")).as("distinct_ngrams"))
      .select(col("source"), col("n"),
        col("total_ngrams"), col("distinct_ngrams"),
        round(col("distinct_ngrams").cast("double") / col("total_ngrams"), 6)
          .as("diversity"))
  }

  /** Count-based word embeddings: PPMI co-occurrence factorized by
    * eigendecomposition — the classic construction (Levy & Goldberg's
    * result that SVD of the PPMI matrix approximates skip-gram's implicit
    * factorization), giving every pipeline that has no neural tokenizer a
    * corpus-native vector per word for synonym mining and query expansion.
    * Stages: (1) adjacent-token co-occurrence counts restricted to the
    * top-`v` vocabulary, SYMMETRIZED (both directions of each bigram) so
    * the matrix is symmetric and eigen ≡ SVD; (2)
    * `PPMI(w,c) = max(0, ln(n_wc·N/(n_w·n_c)))` on the bounded grid;
    * (3) driver-side Jacobi eigendecomposition of the collected matrix
    * (`v` is model-sized by contract — the [[graft.functions.PCA]]
    * bounded-driver adjudication; requires the kept top-`k` eigenvalues
    * positive); (4) the embedding
    * `value(w, j) = (Σ_c PPMI(w,c)·u_j(c)) / √λ_j` — row w of `U·Λ^½` up
    * to the eigen residual — computed AS A DATAFRAME EXPRESSION over the
    * PPMI rows with the scaled basis inlined as a broadcast-literal frame,
    * so the whole chain stays dynamic-oracle-replayable (the q217
    * contract: the fit is outside SQL; the fitted numbers are literals;
    * every downstream double is mirrored). Output `(token, dim, value)`
    * at 4dp; vocabulary words with no in-vocabulary neighbor have no
    * co-occurrence row and thus no vector.
    *
    * Determinism: counts are exact longs; per-(w, c, j) terms are one
    * double rounded 8dp → DECIMAL(38,8) before the per-(w, j) fold; the
    * Jacobi basis follows [[graft.functions.PCA.fit]]'s sign convention.
    */
  /** `scaled(j)(c)` = `u_j(toks(c)) / √λ_j` — the literal factors the
    * embedding fold and the dynamic oracle both consume.
    */
  final case class WvModel(v: Int, toks: Array[String],
      scaled: Array[Array[Double]])

  /** The symmetric PPMI frame `(w1, w2, p)` over the top-`v` vocabulary —
    * the mirrored expression both [[wordVectorsFit]] (collect) and
    * [[wordVectors]]' embedding fold (join) consume, and the one the
    * dynamic oracle replays in SQL.
    */
  private def ppmiFrame(docs: DataFrame, v: Int, textCol: String): DataFrame = {
    val bg = bigramsOf(docs.select(lit(0L).as("_id"),
      tokens(col(textCol)).as("toks")), "_id").select(col("w1"), col("w2"))
    val vtok = vocabulary(docs, v, textCol = textCol).select(col("token"))
    val pairs = bg.unionByName(
      bg.select(col("w2").as("w1"), col("w1").as("w2")))
    val cooc = pairs
      .join(broadcast(vtok.select(col("token").as("w1"))), Seq("w1"))
      .join(broadcast(vtok.select(col("token").as("w2"))), Seq("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val rowm = cooc.groupBy(col("w1")).agg(sum(col("c")).as("nw"))
    val tot = cooc.agg(sum(col("c")).as("nn"))
    cooc.join(rowm, Seq("w1"))
      .join(rowm.select(col("w1").as("w2"), col("nw").as("nc")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"),
        greatest(log(col("c").cast("double") * col("nn") /
          (col("nw").cast("double") * col("nc"))), lit(0.0)).as("p"))
  }

  /** Fit the scaled eigenbasis of the PPMI matrix (stage 3 of
    * [[wordVectors]]); collect is bounded by v².
    */
  def wordVectorsFit(docs: DataFrame, v: Int = 48, k: Int = 4,
      textCol: String = "text"): WvModel = {
    require(k >= 1 && k <= v, s"k=$k out of range for vocab $v")
    val rows = ppmiFrame(docs, v, textCol).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val toks = rows.map(_._1).distinct.sorted
    val idx = toks.zipWithIndex.toMap
    val m = Array.ofDim[Double](toks.length, toks.length)
    rows.foreach { case (a, b, p) => m(idx(a))(idx(b)) = p }
    require(toks.length >= k,
      s"wordVectors: only ${toks.length} co-occurring vocabulary tokens " +
        s"for k=$k dims (corpus too small)")
    val (vals, vecsM) = graft.functions.PCA.jacobiEigen(m)
    val order = vals.indices.sortBy(i => -vals(i)).take(k)
    require(order.forall(vals(_) > 0),
      s"wordVectors: top-$k PPMI spectrum not positive (corpus too small)")
    val scaled = order.map { ei =>
      val u = Array.tabulate(toks.length)(r => vecsM(r)(ei))
      val mx = u.indices.maxBy(i => (math.abs(u(i)), -i))
      val s = (if (u(mx) < 0) -1.0 else 1.0) / math.sqrt(vals(ei))
      u.map(_ * s)
    }.toArray
    WvModel(v, toks, scaled)
  }

  /** The embedding fold over [[ppmiFrame]] — the vocabulary size rides on
    * the model (a mismatched v would rebuild co-occurrence over a
    * DIFFERENT vocabulary than the one the basis was fitted on and
    * silently produce values from a mismatched factorization).
    */
  def wordVectors(docs: DataFrame, model: WvModel,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val spark = docs.sparkSession
    import spark.implicits._
    val basis = model.toks.zipWithIndex.map { case (t, c) =>
      (t, model.scaled.map(_(c)).toSeq)
    }.toSeq.toDF("_ct", "_us")
    ppmiFrame(docs, model.v, textCol)
      .join(broadcast(basis), col("w2") === col("_ct"))
      .select(col("w1"), col("p"),
        posexplode(col("_us")).as(Seq("dim", "_u")))
      .select(col("w1").as("token"), col("dim"),
        round(col("p") * col("_u"), 8).cast(DecimalType(38, 8)).as("_t"))
      .groupBy(col("token"), col("dim"))
      .agg(sum(col("_t")).cast("double").as("_v"))
      .select(col("token"), col("dim"), round(col("_v"), 4).as("value"))
  }

  /** Nearest-neighbor synonyms over the [[wordVectors]] embeddings: the
    * exact cosine self-kNN of the ≤v-token vector table — the
    * query-expansion / synonym-mining readout the PPMI factorization
    * exists for. The pair space is bounded at v² by CONSTRUCTION (the
    * vocabulary is model-sized), so the exact pairwise form IS the scale
    * path; zero-norm vectors take the cosine kernel's dist-1 convention.
    * Output `(token, rank, neighbor, dist)` with the kNN family's
    * (dist, neighbor) deterministic tie order and 4dp distances.
    */
  def wordSynonyms(docs: DataFrame, model: WvModel, k: Int,
      textCol: String = "text"): DataFrame = {
    val vecs = wordVectors(docs, model, textCol)
      .groupBy(col("token"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("value")))),
        x => x.getField("value")).as("vec"))
      .localCheckpoint(eager = false)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token")).orderBy(col("dist"), col("neighbor"))
    vecs
      .join(broadcast(vecs.select(col("token").as("neighbor"),
        col("vec").as("_vb"))), col("token") =!= col("neighbor"))
      .withColumn("dist",
        graft.functions.dist.byName("cos")(col("vec"), col("_vb")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("token"), col("rank"), col("neighbor"),
        round(col("dist"), 4).as("dist"))
  }

  def tokenEntropy(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
    val ct = toks.groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))
    val n = ct.groupBy(col(idCol))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_uniq"))
    val p = col("c") / col("n")
    ct.join(n, Seq(idCol))
      .withColumn("_term",
        round((lit(0) - p) * log(p), 6).cast(DecimalType(18, 9)))
      .groupBy(col(idCol), col("n"), col("n_uniq"))
      // round the DECIMAL sum directly (exact HALF_UP), THEN cast: a 6dp
      // sum often lands exactly on the 4dp half-boundary, where
      // double-then-round is engine-dependent
      .agg(round(sum(col("_term")), 4).cast("double").as("entropy"))
      .select(col(idCol), col("n").as("n_tokens"), col("n_uniq"),
        col("entropy"))
  }

  /** Stopword-profile language ID: pick the language with the most stopword
    * hits (ties broken by list order, 'und' when nothing matches).
    */
  def langId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val scored = Stopwords.zipWithIndex.map { case ((lang, words), i) =>
      struct(hitCount(t, words).as("hits"), lit(-i).as("prio"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    docs.select(
      col(idCol),
      when(best.getField("hits") > 0, best.getField("lang"))
        .otherwise(lit("und")).as("pred_lang"))
  }

  /** Default PII patterns for [[scrub]] — each `(name, regex)` valid in BOTH
    * Java regex (Spark) and RE2 (DuckDB): no backrefs/lookaround, inline
    * `(?i)` for case-insensitivity. The usual pre-training scrub targets:
    * emails, NANP-style phone numbers, dotted-quad IPs, SSN-shaped ids.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}",
    "phone" -> "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b")

  /** PII / deny-list scrubbing: per doc, one match count per pattern
    * (`n_<name>`, counted on the ORIGINAL text), the total (`n_scrubbed`),
    * and the redacted text (`scrubbed`) with each pattern's matches replaced
    * by `<NAME>`, patterns applied in list order. Pure per-row regex column
    * math — no shuffle, runs at scan speed at any corpus size; the regexes
    * are the dual-dialect set in [[PiiPatterns]] (or any caller-supplied
    * deny-list obeying the same Java∩RE2 contract so the oracle can mirror
    * them verbatim).
    *
    * Contract: because replacements apply sequentially while counts come
    * from the original text, a later pattern must NOT match text injected by
    * an earlier placeholder — otherwise `n_scrubbed` diverges from the
    * redactions visible in `scrubbed`. Deny-lists whose patterns match a
    * preceding placeholder token outright are rejected here; matches that
    * only arise SPANNING a placeholder boundary cannot be detected
    * statically and remain the caller's responsibility.
    */
  def scrub(docs: DataFrame, patterns: Seq[(String, String)] = PiiPatterns,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    for (((_, re), i) <- patterns.zipWithIndex;
         (name, _) <- patterns.take(i)) {
      val ph = s"<${name.toUpperCase}>"
      require(!java.util.regex.Pattern.compile(re).matcher(ph).find(),
        s"scrub pattern '$re' matches earlier placeholder '$ph' — " +
          "counts would diverge from the visible redactions")
    }
    val countExprs = patterns.map { case (_, re) =>
      size(regexp_extract_all(col(textCol), lit(re), lit(0))) }
    val counts = countExprs.zip(patterns).map { case (e, (name, _)) =>
      e.as(s"n_$name") }
    val redacted = patterns.foldLeft(col(textCol)) { case (c, (name, re)) =>
      regexp_replace(c, lit(re), lit(s"<${name.toUpperCase}>")) }
    docs.select(col(idCol) +: counts :+
      countExprs.reduce(_ + _).as("n_scrubbed") :+ redacted.as("scrubbed"): _*)
  }

  /** Tokenizer-vocabulary induction: corpus-wide token frequencies, keeping
    * the top `v` tokens by `(count DESC, token ASC)` — the counting pass a
    * BPE/unigram tokenizer trainer starts from (the deterministic tie-break
    * makes the vocab reproducible run-to-run). Output `(token, cnt)`.
    *
    * Scale: one hash groupBy on the token (map-side partial — shuffle
    * carries per-partition distinct tokens, bounded by vocabulary not corpus
    * size) and a bounded top-v (`TakeOrderedAndProject`: per-partition
    * heads + driver merge of v·tasks rows, no global sort shuffle).
    */
  def vocabulary(docs: DataFrame, v: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(v)

  /** Token frequency SPECTRUM per source — the Zipf/Heaps dataset-card
    * statistic: how many distinct token types fall in each frequency
    * octave `[2^k, 2^(k+1))`, and how many token occurrences they carry.
    * A healthy natural-language source shows the power-law staircase
    * (types ≈ halving per octave); a templated/machine-generated one shows
    * mass spikes in high octaves. Octaves instead of a log-log slope keep
    * every emitted number an exact integer — `log()` is not bit-identical
    * across engines, integer range tests are. Output
    * `(source, octave, lo, n_types, n_occurrences)`.
    *
    * Scale: one token-keyed hash groupBy (map-side partial, shuffle ∝
    * vocabulary), then a broadcast range join against the ≤`maxOctave`-row
    * bounds table (the q147 bounded-frame BNLJ pattern) and a tiny
    * per-(source, octave) aggregation.
    */
  def freqSpectrum(docs: DataFrame, sourceCol: String = "source",
      textCol: String = "text", maxOctave: Int = 40): DataFrame = {
    val spark = docs.sparkSession
    // the LAST octave is open-ended (hi = Long.MaxValue): a token type
    // whose count reaches 2^maxOctave must land in the top bucket, not
    // silently vanish from the spectrum
    val bounds = spark.range(0, maxOctave).select(
      col("id").cast("int").as("octave"),
      expr("shiftleft(cast(1 as bigint), cast(id as int))").as("lo"),
      when(col("id") === maxOctave - 1, lit(Long.MaxValue))
        .otherwise(expr("shiftleft(cast(2 as bigint), cast(id as int))")).as("hi"))
    val counts = docs
      .select(col(sourceCol), explode(tokens(col(textCol))).as("_tok"))
      .groupBy(col(sourceCol), col("_tok")).agg(count(lit(1)).as("_cnt"))
    counts
      .join(broadcast(bounds), col("_cnt") >= col("lo") && col("_cnt") < col("hi"))
      .groupBy(col(sourceCol), col("octave"), col("lo"))
      .agg(count(lit(1)).as("n_types"), sum(col("_cnt")).as("n_occurrences"))
  }

  /** Hill maximum-likelihood tail exponent of the token frequency
    * distribution — the single number [[freqSpectrum]]'s octave staircase
    * eyeballs: `α = 1 + n_tail / Σ ln(x_i / xmin)` over token types with
    * count ≥ `xmin` (the continuous-MLE Hill estimator; a healthy natural
    * corpus sits near the Zipf α ≈ 2, boilerplate-heavy ones drift low).
    * One row: `(xmin, n_tail, alpha)` at 6dp. Types with count = xmin
    * contribute ln 1 = 0 but DO count in n_tail, per the estimator.
    *
    * Determinism contract: each type's ln ratio is rounded 8dp →
    * DECIMAL(38,8) before the sum (order-free); the final α is one double
    * expression over the exact sum. Scale shape: one token hash agg to
    * type counts, one filtered agg — nothing else.
    */
  def hillTail(docs: DataFrame, xmin: Long,
      textCol: String = "text"): DataFrame = {
    require(xmin >= 1)
    docs.select(explode(tokens(col(textCol))).as("_tok"))
      .groupBy(col("_tok")).agg(count(lit(1)).as("_cnt"))
      .where(col("_cnt") >= xmin)
      .select(round(log(col("_cnt").cast("double") / xmin), 8)
        .cast("decimal(38,8)").as("_ln"))
      .agg(count(lit(1)).as("n_tail"), sum(col("_ln")).as("_s"))
      .select(lit(xmin).as("xmin"), col("n_tail"),
        round(when(col("_s").isNotNull && col("_s") > 0,
          lit(1.0) + col("n_tail").cast("double") / col("_s").cast("double"))
          .otherwise(lit(null).cast("double")), 6).as("alpha"))
  }

  /** Good–Turing / Chao1 unseen-vocabulary estimate — "how much of this
    * corpus's vocabulary have we actually seen": from the type-frequency
    * counts, the singleton/doubleton masses give the Good–Turing coverage
    * `1 − f1/N` (the probability the NEXT token is an already-seen type)
    * and the bias-corrected Chao1 richness floor
    * `v + f1·(f1−1)/(2·(f2+1))` — the standard capture–recapture answer to
    * "is more data still buying new vocabulary". One row:
    * `(n_types, n_tokens, f1, f2, chao1, gt_coverage)`.
    *
    * Determinism: every input to the two divides is an exact integer
    * aggregate; each output is ONE double expression rounded once —
    * engine- and order-exact. Scale shape: one token-keyed hash agg
    * (shuffle ∝ vocabulary) + one global agg; nothing else.
    */
  def unseenVocab(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("_tok"))
      .groupBy(col("_tok")).agg(count(lit(1)).as("_cnt"))
      .agg(count(lit(1)).as("n_types"), sum(col("_cnt")).as("n_tokens"),
        sum(when(col("_cnt") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("_cnt") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("n_types"), col("n_tokens"), col("f1"), col("f2"),
        round(col("n_types").cast("double") +
          col("f1").cast("double") * (col("f1") - 1).cast("double") /
            (lit(2.0) * (col("f2") + 1).cast("double")), 4).as("chao1"),
        round(lit(1.0) -
          col("f1").cast("double") / col("n_tokens").cast("double"), 6)
          .as("gt_coverage"))

  /** Heaps-law vocabulary-growth fit `V(n) ≈ K·n^β` — the scaling-law
    * readout of [[unseenVocab]]'s point estimate: bucket the corpus into
    * `buckets` equal doc_id ranges (doc_id order standing in for ingest
    * order), accumulate (tokens-so-far, NEW types whose FIRST occurrence
    * falls in the bucket) per prefix, and OLS-fit log V against log n over
    * the non-empty prefix points. β well below ~0.5 says vocabulary is
    * saturating (more of the same data buys little); β near 1 says the
    * corpus is still vocabulary-open. Output one row
    * `(n_points, beta, k_fit)`, β at 6dp, K at 4dp.
    *
    * Determinism contract: each point's ln is rounded 8dp → DECIMAL(38,8)
    * (the [[hillTail]] transcendental rule), the OLS moment sums are exact
    * decimal folds, β/K are single double expressions over them, and
    * `exp` runs on an 8dp-rounded argument before the final 4dp round.
    * Scale shape: one token pass to per-type first-occurrence buckets
    * (shuffle ∝ vocabulary), per-bucket aggs, and every cumulative/OLS
    * step on the ≤`buckets`-row bounded frame (self-join, no window).
    */
  def heapsFit(docs: DataFrame, buckets: Int = 32,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(buckets >= 2)
    val mx = docs.agg(max(col(idCol)).as("_mx"))
    val tok = docs.crossJoin(broadcast(mx))
      .select(least(lit(buckets - 1),
          floor(col(idCol) * buckets / (col("_mx") + 1)).cast("int")).as("_b"),
        explode(tokens(col(textCol))).as("_tok"))
    // per bucket: tokens landing in it, and types FIRST seen in it
    val tokPer = tok.groupBy(col("_b")).agg(count(lit(1)).as("_nt"))
    val newPer = tok.groupBy(col("_tok")).agg(min(col("_b")).as("_b"))
      .groupBy(col("_b")).agg(count(lit(1)).as("_nv"))
    val per = tokPer.join(newPer, Seq("_b"), "left")
      .select(col("_b"), col("_nt"), coalesce(col("_nv"), lit(0L)).as("_nv"))
      .localCheckpoint(eager = false)
    // cumulative prefix totals over the bounded bucket frame (self-join)
    val cum = per.select(col("_b"))
      .join(broadcast(per.select(col("_b").as("_c"), col("_nt"), col("_nv"))),
        col("_c") <= col("_b"))
      .groupBy(col("_b"))
      .agg(sum(col("_nt")).as("_n"), sum(col("_nv")).as("_v"))
      .where(col("_n") > 0 && col("_v") > 0)
    // moments multiply in IEEE double (deterministic given equal operands)
    // and round 8dp BEFORE the order-free decimal fold — decimal×decimal
    // would hit engine-specific precision-overflow rounding instead
    val pts = cum.select(
      round(log(col("_n").cast("double")), 8).as("_x"),
      round(log(col("_v").cast("double")), 8).as("_y"))
    val mom = pts.agg(count(lit(1)).as("_m"),
      sum(col("_x").cast("decimal(38,8)")).as("_sx"),
      sum(col("_y").cast("decimal(38,8)")).as("_sy"),
      sum(round(col("_x") * col("_y"), 8).cast("decimal(38,8)")).as("_sxy"),
      sum(round(col("_x") * col("_x"), 8).cast("decimal(38,8)")).as("_sxx"))
    val beta = (col("_sxy").cast("double") -
        col("_sx").cast("double") * col("_sy").cast("double") /
          col("_m").cast("double")) /
      (col("_sxx").cast("double") -
        col("_sx").cast("double") * col("_sx").cast("double") /
          col("_m").cast("double"))
    mom.select(col("_m").as("n_points"),
      round(when(col("_m") >= 2, beta), 6).as("beta"),
      round(when(col("_m") >= 2,
        exp(round(col("_sy").cast("double") / col("_m").cast("double") -
          beta * (col("_sx").cast("double") / col("_m").cast("double")), 8))),
        4).as("k_fit"))
  }

  /** Sentence-granularity duplication rate per source — the corpus-health
    * number between chunk-level exact dedup (token windows) and doc-level
    * dedup: boilerplate repeats SENTENCES long before whole docs repeat.
    * Sentences = text split on `[.!?]+`, trimmed, empties dropped; output
    * `(source, n_sentences, n_distinct, dup_rate)` with
    * `dup_rate = (n − distinct) / n` at 6dp (instance-level: 100 copies
    * of one sentence → 0.99).
    *
    * Scale shape: one explode + one hash agg (count + count distinct per
    * source) — corpus-linear, no pair space.
    */
  def sentenceDupRate(docs: DataFrame, sourceCol: String = "source",
      textCol: String = "text"): DataFrame =
    docs.select(col(sourceCol).as("source"),
        explode(filter(transform(split(col(textCol), "[.!?]+"),
          s => trim(s)), s => s =!= lit(""))).as("sentence"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sentences"),
        countDistinct(col("sentence")).as("n_distinct"))
      .select(col("source"), col("n_sentences"), col("n_distinct"),
        round((col("n_sentences") - col("n_distinct")).cast("double") /
          col("n_sentences"), 6).as("dup_rate"))

  /** Pairwise source vocabulary similarity — the dataset-card "how much do
    * my corpus slices overlap lexically" audit (near-identical sources are
    * mixture-weight double counting; disjoint ones signal domain silos).
    * Per unordered source pair: distinct-token set sizes and their Jaccard.
    * Output `(src_a, src_b, n_a, n_b, n_common, jaccard)` at 6dp; pairs
    * with NO shared token don't appear (their Jaccard is 0 by omission).
    *
    * Scale: the corpus reduces to a distinct `(source, token)` frame — ONE
    * hash aggregation, ∝ vocabulary × sources, never corpus rows — then the
    * pair counts come from a token-keyed self-join whose fan-out is bounded
    * by sources² per token (sources are few by construction; a token in all
    * S sources yields S(S−1)/2 pair rows). No doc-pair space anywhere.
    */
  def sourceSimilarity(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", sourceCol: String = "source"): DataFrame = {
    val st = docs
      .select(col(sourceCol).as("_src"), explode(tokens(col(textCol))).as("token"))
      .distinct()
      .localCheckpoint(true)
    val sizes = st.groupBy(col("_src")).agg(count(lit(1)).as("_n"))
    st.join(st.select(col("_src").as("_src2"), col("token")), Seq("token"))
      .where(col("_src") < col("_src2"))
      .groupBy(col("_src"), col("_src2")).agg(count(lit(1)).as("n_common"))
      .join(sizes.select(col("_src"), col("_n").as("n_a")), Seq("_src"))
      .join(sizes.select(col("_src").as("_src2"), col("_n").as("n_b")), Seq("_src2"))
      .select(col("_src").as("src_a"), col("_src2").as("src_b"),
        col("n_a"), col("n_b"), col("n_common"),
        round(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"), 6)
          .as("jaccard"))
  }

  /** Flesch-style readability score — the classic prose-complexity signal a
    * quality gate adds next to [[quality]]'s ratio features (curation
    * recipes band documents by reading ease; extreme scores flag boilerplate
    * and word salad). Syllables are proxied by vowel-group runs
    * (`[aeiouy]+`, min 1 per token — the standard dictionary-free
    * approximation); sentences by terminal-punctuation count (min 1).
    * Output `(doc_id, n_words, n_sentences, n_syllables, flesch)` with
    * `flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)`
    * at 4dp (NULL for token-less docs). Pure per-row column math — scan
    * speed, stream-safe, mirrored op-for-op by the oracle.
    */
  /** Per-source unigram KL divergence from the pooled corpus distribution —
    * `KL(P_src ‖ P_corpus)` in nats over the corpus vocabulary with Laplace
    * `alpha` smoothing on BOTH distributions (so zero-count words are
    * defined and the divergence is finite). The "which source is
    * token-distributionally distinctive" table: [[sourceSimilarity]] reads
    * set overlap, this reads the full distribution — a source can share
    * every word yet weight them so differently it needs its own mixture
    * slot. Output `(source, n_tokens, kl)` at 6dp.
    *
    * Determinism: per-(source, word) term is one double over exact longs
    * rounded 8dp → DECIMAL(38,8) before the fold. Scale shape: counts are
    * two hash aggs (vocabulary- and source-bounded); the dense source×V
    * grid is vocabulary crossJoin broadcast-tiny source list, zero-filled
    * via a left join — rows ∝ |V|·|sources|, never corpus-sized.
    */
  def sourceKl(docs: DataFrame, alpha: Double = 0.5,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val tok = docs.select(col(sourceCol).as("_src"),
      explode(tokens(col(textCol))).as("w"))
    val sw = tok.groupBy(col("_src"), col("w")).agg(count(lit(1)).as("_cs"))
    val cw = tok.groupBy(col("w")).agg(count(lit(1)).as("_cw"))
      .localCheckpoint(eager = false)
    val ns = sw.groupBy(col("_src")).agg(sum(col("_cs")).as("_ns"))
    val tot = cw.agg(sum(col("_cw")).as("_n"), count(lit(1)).as("_v"))
    val terms = cw.crossJoin(broadcast(ns))
      .join(sw, Seq("_src", "w"), "left")
      .crossJoin(broadcast(tot))
      .select(col("_src"), col("_ns"),
        ((coalesce(col("_cs"), lit(0L)).cast("double") + lit(alpha)) /
          (col("_ns") + lit(alpha) * col("_v"))).as("_ps"),
        ((col("_cw").cast("double") + lit(alpha)) /
          (col("_n") + lit(alpha) * col("_v"))).as("_pc"))
      .select(col("_src"), col("_ns"),
        round(col("_ps") * log(col("_ps") / col("_pc")), 8)
          .cast(DecimalType(38, 8)).as("_t"))
    terms.groupBy(col("_src"), col("_ns"))
      .agg(sum(col("_t")).cast("double").as("_kl"))
      .select(col("_src").as("source"), col("_ns").as("n_tokens"),
        round(col("_kl"), 6).as("kl"))
  }

  def readability(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val words = size(t)
    val sent = greatest(
      size(regexp_extract_all(col(textCol), lit("[.!?]"), lit(0))), lit(1))
    val syl = aggregate(t, lit(0), (acc, tok) =>
      acc + greatest(
        size(regexp_extract_all(tok, lit("[aeiouy]+"), lit(0))), lit(1)))
    docs.select(col(idCol),
      words.cast("long").as("n_words"),
      sent.cast("long").as("n_sentences"),
      syl.cast("long").as("n_syllables"))
      .withColumn("flesch",
        when(col("n_words") > 0,
          round(lit(206.835)
            - lit(1.015) * (col("n_words").cast("double")
              / col("n_sentences").cast("double"))
            - lit(84.6) * (col("n_syllables").cast("double")
              / col("n_words").cast("double")), 4)))
  }

  /** Vocabulary coverage / OOV curve: for each candidate vocabulary size in
    * `cutoffs`, the share of ALL token occurrences covered by the top-V
    * tokens of [[vocabulary]] (count DESC, token ASC) — the curve a
    * tokenizer-budget decision reads ("which V covers 99% of the stream");
    * everything off-vocab is the OOV mass a trainer pays in `<unk>`s.
    * Output `(vocab_size, covered_tokens, total_tokens, coverage)`, one row
    * per cutoff, coverage at 6dp.
    *
    * Scale: token counts are ONE vocabulary-bounded hash aggregation
    * (checkpointed so the |cutoffs| consumers don't re-scan the corpus);
    * each cutoff is a bounded `TakeOrderedAndProject` over that vocab frame
    * (never a global sort of corpus rows), and the one-row total joins
    * broadcast-style. No windows, no pair spaces.
    */
  def vocabCoverage(docs: DataFrame, cutoffs: Seq[Int],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(cutoffs.nonEmpty && cutoffs.forall(_ > 0), "cutoffs must be positive")
    val counts = docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val total = counts.agg(coalesce(sum(col("cnt")), lit(0L)).as("total_tokens"))
    cutoffs.map { v =>
      counts.orderBy(col("cnt").desc, col("token")).limit(v)
        .agg(coalesce(sum(col("cnt")), lit(0L)).as("covered_tokens"))
        .select(lit(v).cast("int").as("vocab_size"), col("covered_tokens"))
    }.reduce(_ unionByName _)
      .crossJoin(broadcast(total))
      .withColumn("coverage",
        round(col("covered_tokens").cast("double") /
          greatest(col("total_tokens"), lit(1L)).cast("double"), 6))
  }

  /** Per-language confidence score: the fraction of a text's tokens that
    * are stopwords of `lang` (4dp; 0.0 for token-less docs) — the raw
    * signal [[langId]] argmaxes over, exposed as a number so downstream
    * eval can sweep an operating threshold over it
    * ([[Eval.thresholdSweep]]). Pure per-row column math.
    */
  def stopwordConfidence(text: Column, lang: String = "en"): Column = {
    val words = Stopwords.find(_._1 == lang)
      .getOrElse(throw new IllegalArgumentException(s"no stopword list for $lang"))._2
    val t = tokens(text)
    when(size(t) > 0,
      round(hitCount(t, words).cast("double") / size(t), 4))
      .otherwise(lit(0.0))
  }

  /** Exact heavy hitters — every token whose count strictly exceeds a
    * `1/phi` share of the corpus token stream — computed WITHOUT a
    * vocabulary-sized aggregation. Output `(token, cnt, total_tokens)`,
    * counts exact.
    *
    * Two passes, both bounded:
    *  1. a single [[graft.functions.MisraGriesAgg]] aggregate (capacity
    *     `capacity`, default `2·phi`) + the exact stream length, in ONE
    *     scan — the MG guarantee (any token with share > 1/(capacity+1) is
    *     retained) makes the ≤ capacity survivors a SUPERSET of every
    *     token above the 1/phi bar whenever `capacity ≥ phi`;
    *  2. an exact re-count of only the candidate tokens (broadcast join —
    *     candidates are ≤ capacity rows) filtered by `cnt · phi > n`.
    *
    * The re-count makes the result deterministic and exact even though the
    * MG summary itself is partitioning-order-dependent beyond its
    * guarantee. Scale: pass 1's shuffle is ≤ capacity rows per map task;
    * pass 2's groupBy sees only rows matching ≤ capacity hot tokens —
    * map-side partials collapse each task's slice to ≤ capacity rows, so
    * the hot keys never concentrate on one reducer. Compare
    * [[vocabulary]], whose groupBy state is the full vocabulary: correct,
    * but the sketch path is what a 100 TB stream over an unbounded key
    * space (URLs, n-grams, user ids) actually runs.
    */
  def heavyHitters(docs: DataFrame, phi: Int, capacity: Int = 0,
      textCol: String = "text"): DataFrame = {
    val k = if (capacity > 0) capacity else 2 * phi
    require(phi > 1 && k >= phi,
      s"heavyHitters needs phi > 1 and capacity >= phi (phi=$phi, capacity=$k)")
    val toks = docs.select(explode(tokens(col(textCol))).as("token"))
    val summary = toks.agg(
      graft.functions.MisraGriesAgg.misraGries(col("token"), k).as("cand"),
      count(lit(1)).as("n"))
    val cands = summary
      .select(col("n"), explode(col("cand")).as("c"))
      .select(col("n"), col("c").getField("token").as("token"))
    toks.join(broadcast(cands), Seq("token"))
      .groupBy(col("token"), col("n"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * phi > col("n"))
      .select(col("token"), col("cnt"), col("n").as("total_tokens"))
  }

  /** Cluster topic labels: for documents carrying an embedding, assign
    * each to its nearest centroid (the q07 expression pass) and surface
    * every cluster's most DISTINCTIVE tokens — ranked by lift
    * `(df_in/n_c) / (df_all/N)`, how over-represented a token's document
    * frequency is inside the cluster vs the corpus. The
    * cluster-browsing / topic-audit step of an embedding-curated corpus
    * (what IS this cluster full of?). Output
    * `(head_id, rank, token, df_in, lift)`, top `topK` per cluster, lift
    * computed as one integer-products divide
    * `(df_in·N)/(df_all·n_c)` rounded 6dp, ties (lift DESC, df_in DESC,
    * token).
    *
    * Input `linked`: `(id, vec, text)`. Scale: assignment is map-only;
    * token stats are (cluster, token)- and token-keyed hash aggregates;
    * the rank window partitions by cluster over the per-cluster token
    * frame (vocabulary-bounded per cluster).
    */
  def clusterTopics(linked: DataFrame, centroidEveryNth: Int,
      topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vecs = linked.select(col("id"), col("vec"))
    val cents = Spann.selectHeadsModulo(vecs, centroidEveryNth)
    val assigned = Spann.buildPostings(vecs, cents, 1, "cos")
      .select(col("head_id"), col("id"))
    val docTok = linked.select(col("id"),
      explode(array_distinct(tokens(col("text")))).as("token"))
    val dfIn = docTok.join(assigned, Seq("id"))
      .groupBy(col("head_id"), col("token")).agg(count(lit(1)).as("df_in"))
    val dfAll = docTok.groupBy(col("token")).agg(count(lit(1)).as("df_all"))
    val sizes = assigned.groupBy(col("head_id")).agg(count(lit(1)).as("_nc"))
    val nTot = assigned.agg(count(lit(1)).as("_n"))
    val scored = dfIn
      .join(broadcast(dfAll), Seq("token"))
      .join(broadcast(sizes), Seq("head_id"))
      .crossJoin(broadcast(nTot))
      .withColumn("lift",
        round((col("df_in") * col("_n")).cast("double") /
          (col("df_all") * col("_nc")).cast("double"), 6))
    val w = Window.partitionBy(col("head_id"))
      .orderBy(col("lift").desc, col("df_in").desc, col("token"))
    scored
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= topK)
      .select(col("head_id"), col("rank"), col("token"),
        col("df_in"), col("lift"))
  }

  /** Inverted-index build with BOUNDED postings: per token, its document
    * frequency and the first `maxPostings` doc ids ascending (joined as a
    * comma string for engine-portable output) — the retrieval-index
    * artifact, sampled so a stopword's posting list cannot materialize a
    * corpus-sized array in one aggregation buffer. Output
    * `(token, df, postings)`.
    *
    * Scale: distinct (token, doc) presence pairs, then ONE token-keyed
    * aggregation where the posting sample is a bounded top-k buffer
    * ([[graft.functions.TopKByDistance]] keyed on the id itself) — state ≤
    * `maxPostings` per token on every map task, so hot tokens cost the
    * same as rare ones; `df` rides the same aggregate. The full-posting
    * variant (collect_list per token) is exactly the unbounded-state shape
    * this refuses to be.
    */
  def invertedIndex(docs: DataFrame, maxPostings: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxPostings > 0)
    docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .distinct()
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("df"),
        graft.functions.TopKByDistance.topk(
          col(idCol), col(idCol).cast("double"), maxPostings).as("_nn"))
      .select(col("token"), col("df"),
        concat_ws(",",
          transform(col("_nn"), x => x.getField("id").cast("string")))
          .as("postings"))
  }

  /** Fixed-size token-window chunking with overlap — the pretraining /
    * retrieval preprocessing step that turns documents into model-sized
    * pieces. Chunk i covers tokens `[i·stride, i·stride + window)`; the last
    * chunk may be short; empty documents emit nothing. Output
    * `(doc_id, chunk_idx, start_tok, n_tokens, chunk_text)`, chunk_idx and
    * start_tok 0-based, chunk_text re-joined with single spaces.
    *
    * Scale: pure per-row explode — chunk starts come from an in-row
    * `sequence(0, n_tokens-1, stride)`, so no shuffle at all; output row
    * count is ≈ corpus_tokens / stride. The whole thing is one
    * whole-stage-codegen projection over the scan.
    */
  def chunk(docs: DataFrame, window: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    docs
      .select(col(idCol), tokens(col(textCol)).as("_t"))
      .withColumn("_n", size(col("_t")).cast("long"))
      .where(col("_n") > 0)
      .select(col(idCol), col("_t"), col("_n"),
        posexplode(sequence(lit(0L), col("_n") - 1L, lit(stride.toLong))))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_idx"),
        col("col").as("start_tok"),
        least(lit(window.toLong), col("_n") - col("col")).as("n_tokens"),
        array_join(slice(col("_t"), (col("col") + 1L).cast("int"), lit(window)), " ")
          .as("chunk_text"))
  }

  /** Corpus-level boilerplate detection: distinct n-gram shingles per doc →
    * document frequency per shingle → shingles appearing in ≥ `minDf` docs,
    * with their share of the corpus. The repeated-fragment signal web
    * pipelines use to strip navigation chrome / license banners. One
    * hash-groupBy on the shingle (shuffle ∝ corpus tokens) plus a broadcast
    * one-row cross join for the denominator — no pair space, safe at 100 TB.
    */
  def boilerplate(docs: DataFrame, n: Int = 3, minDf: Long = 2L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val df = Dedup.shingles(docs, n, idCol, textCol)
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf)
    val total = docs.agg(count(lit(1)).as("n_docs"))
    df.crossJoin(broadcast(total))
      .select(col("sh"), col("df"),
        round(col("df").cast("double") / col("n_docs").cast("double"), 4)
          .as("doc_share"))
  }

  /** Boilerplate-span REMOVAL — the apply step downstream of
    * [[boilerplate]] (RefinedWeb/C4-style corpus cleaning): every occurrence
    * of a corpus-flagged n-gram is excised from the token stream (a token
    * goes if ANY flagged span covers it) and the document is re-joined from
    * the survivors. Returns `(doc_id, text_clean, n_removed)`.
    *
    * Scale posture: spans are occurrence-level (∝ corpus tokens) but only
    * flagged spans survive the semi-join on `sh` before the per-doc
    * aggregation, so the start-set frame is ∝ boilerplate hits; the final
    * token filter is in-row. No windows, no pair space.
    */
  def stripBoilerplate(docs: DataFrame, n: Int = 3, minDf: Long = 2L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toked = docs.select(col(idCol), tokens(col(textCol)).as("toks"))
    val flagged = boilerplate(docs, n, minDf, idCol, textCol).select(col("sh"))
    val spans = toked.select(col(idCol),
      explode(transform(
        sequence(lit(1), greatest(size(col("toks")) - (n - 1), lit(1))),
        i => struct(i.as("start"),
          concat_ws(" ", slice(col("toks"), i, lit(n))).as("sh")))).as("sp"))
      .select(col(idCol), col("sp.start").as("start"), col("sp.sh").as("sh"))
    val hitStarts = spans.join(flagged, Seq("sh"), "left_semi")
      .groupBy(col(idCol)).agg(collect_set(col("start")).as("starts"))
    toked.join(hitStarts, Seq(idCol), "left")
      .withColumn("_starts",
        coalesce(col("starts"), array().cast("array<int>")))
      .withColumn("_kept", filter(col("toks"), (t, i) =>
        !exists(col("_starts"), s => s <= i + 1 && i + 1 < s + n)))
      .select(col(idCol),
        concat_ws(" ", col("_kept")).as("text_clean"),
        (size(col("toks")) - size(col("_kept"))).cast("long").as("n_removed"))
  }

  /** BPE merge induction — tokenizer TRAINING (the step after [[vocabulary]]
    * counts): start from per-character segmentations of the corpus
    * vocabulary, then `rounds` times pick the adjacent symbol pair with the
    * highest corpus count (ties: lexicographic on the pair) and merge every
    * left-to-right-greedy occurrence. Returns the ranked merge list — the
    * tokenizer artifact — plus the final word segmentations.
    *
    * The merge apply is an in-row left fold over the symbol list: replacing
    * a trailing `x` followed by `y` is exactly `acc ++ y` (the accumulator
    * is the space-joined segmentation), so the whole round is one column
    * expression — no per-symbol rows, no shuffle beyond the pair count.
    *
    * Each round's top pair is a bounded 1-row driver collect (same
    * documented contract as the k-row Lloyd centroid collects); the pair
    * COUNT aggregation shuffles ∝ vocabulary size, which is the corpus'
    * distinct-word count, not its token count — the right 100 TB shape for
    * tokenizer training.
    */
  def bpeTrain(
      docs: DataFrame, rounds: Int = 3,
      idCol: String = "doc_id", textCol: String = "text")
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    val vocab = docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    var segs = vocab.select(col("token"), col("cnt"),
      concat_ws(" ",
        regexp_extract_all(col("token"), lit("[a-z0-9]"), lit(0))).as("seg"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var dry = false
    while (r <= rounds && !dry) {
      val withSyms = segs.withColumn("syms", split(col("seg"), " "))
      val pairs = withSyms
        .select(col("cnt"), explode(transform(
          slice(col("syms"), lit(1), greatest(size(col("syms")) - 1, lit(0))),
          (s, i) => struct(s.as("x"),
            element_at(col("syms"), i + 2).as("y")))).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum(col("cnt")).as("pc"))
      val top = pairs.orderBy(col("pc").desc, col("x"), col("y")).limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val (x, y, pc) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, x, y, pc))
        segs = withSyms
          .withColumn("seg", aggregate(
            slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))),
            element_at(col("syms"), 1),
            (acc, s) => when(
              (acc === lit(x) || acc.endsWith(s" $x")) && s === lit(y),
              concat(acc, lit(y))).otherwise(concat(acc, lit(" "), s))))
          .select(col("token"), col("cnt"), col("seg"))
          .localCheckpoint(true)
        r += 1
      }
    }
    (merges.toSeq, segs)
  }

  /** Composite rule filter — the published Gopher/C4-style heuristic gate
    * (word-count bounds, mean-word-length bounds, alphabetic-token fraction,
    * stopword presence), each rule surfaced as its own flag column so a
    * pipeline can audit WHY a document was dropped. Pure per-row column
    * math; `keep` = all rules pass.
    */
  def ruleFilter(
      docs: DataFrame,
      minTokens: Long = 10L, maxTokens: Long = 10000L,
      minMeanLen: Double = 2.0, maxMeanLen: Double = 12.0,
      minAlphaRatio: Double = 0.7, minStopHits: Long = 2L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val n = size(t).cast("long")
    val meanLen = round(
      aggregate(transform(t, x => length(x)), lit(0L), (a, x) => a + x)
        .cast("double") / greatest(n, lit(1L)).cast("double"), 4)
    val alphaRatio = round(
      size(filter(t, x => x.rlike("^[a-z]+$"))).cast("double") /
        greatest(n, lit(1L)).cast("double"), 4)
    val stopHits = hitCount(t, Stopwords.head._2).cast("long")
    docs.select(
      col(idCol),
      n.as("n_tokens"),
      meanLen.as("mean_word_len"),
      alphaRatio.as("alpha_ratio"),
      stopHits.as("stop_hits"),
      (n >= minTokens && n <= maxTokens).as("ok_length"),
      (meanLen >= minMeanLen && meanLen <= maxMeanLen).as("ok_word_len"),
      (alphaRatio >= minAlphaRatio).as("ok_alpha"),
      (stopHits >= minStopHits).as("ok_stopwords"))
      .withColumn("keep",
        col("ok_length") && col("ok_word_len") &&
          col("ok_alpha") && col("ok_stopwords"))
  }

  /** TF-IDF top terms per document: `(doc_id, token, tf, df, tfidf)` — the
    * `topK` highest-weighted terms of each doc, the classic keyword-extraction
    * / relevance-feature step (tfidf = tf · ln(N/df), rounded to 6dp; the
    * per-doc rank is computed ON the rounded value with `token` as the
    * tie-break so the ordering is engine-independent).
    *
    * Scale shape: explode → two map-side-partial hash aggs (per-(doc,token)
    * tf, per-token df) → one equi-join hash-partitioned on `token` → a window
    * partitioned by `doc_id` (high-cardinality key — balanced, unlike the
    * per-source windows q85/q86 avoid). No broadcast of anything
    * corpus-sized: the single-row corpus count joins as a broadcast literal.
    * The token-keyed df join skews on stopwords ("the" pairs with nearly
    * every doc), but it is a 1:N enrich — the skew-splittable join shape —
    * so AQE skew handling divides hot partitions while replicating the
    * single df row; no salting needed. (Same posture for every token/
    * shingle-keyed df join in this package: [[boilerplate]],
    * [[graft.operators.Dedup.noveltyScore]].)
    */
  def tfIdf(docs: DataFrame, topK: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col(idCol),
      explode(tokens(col(textCol))).as("token"))
    val tf = tok.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("_n"))
    val scored = tf.join(dfreq, "token").crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf").cast("double") *
          log(col("_n").cast("double") / col("df").cast("double")), 6))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("token"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col(idCol), col("rank"), col("token"), col("tf"), col("df"), col("tfidf"))
  }

  /** BM25 ranked retrieval for a fixed bag of query `terms`: the top-`k`
    * documents by the standard Okapi BM25 score
    * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with
    * `idf(t) = ln(1 + (N−df+0.5)/(df+0.5))`. Output `(doc_id, score)` —
    * the selected-set semantics carry no rank column, so the finish plans as
    * a bounded `TakeOrderedAndProject`, never a partition-less window.
    *
    * Determinism contract: `avgdl` is an exact long-sum ratio; the per-term
    * partial scores are cast to DECIMAL(38,12) before the per-doc sum (decimal
    * addition is exact and order-independent — the q91 log-prob trick), and
    * the top-k cut orders on the 4dp-rounded score with `doc_id` tie-break.
    *
    * Scale shape: the exploded token stream is filtered to the query terms
    * BEFORE any shuffle (terms are a literal list — scan-speed predicate);
    * df/avgdl are tiny aggregates joined as broadcasts; the finish is a
    * global top-k (`TakeOrderedAndProject`), not a full sort.
    */
  def bm25(docs: DataFrame, terms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol), tokens(col(textCol)).as("_toks"))
      .select(col(idCol), col("_toks"), size(col("_toks")).cast("long").as("dl"))
    val corpus = base.agg(count(lit(1)).as("_n"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("_avgdl"))
    val tok = base.select(col(idCol), col("dl"),
      explode(col("_toks")).as("token"))
      .where(col("token").isin(terms.map(lit): _*))
    val tf = tok.groupBy(col(idCol), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("_n").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfD = col("tf").cast("double")
    val part = idf * tfD * (lit(k1) + 1.0) /
      (tfD + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / col("_avgdl")))
    tf.join(broadcast(dfreq), "token").crossJoin(broadcast(corpus))
      .select(col(idCol), part.cast("decimal(38,12)").as("_s"))
      .groupBy(col(idCol))
      .agg(round(sum(col("_s")).cast("double"), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** PMI collocations — the corpus's statistically-bound word pairs:
    * adjacent-token bigrams scored by pointwise mutual information
    * `pmi = ln(p(xy) / (p(x)·p(y)))` with `p(xy) = c_xy/N_bi` and
    * `p(x) = c_x/N_uni`. Output `(w1, w2, pair_cnt, cnt1, cnt2, pmi)` for
    * pairs with `pair_cnt ≥ minCount` — rare pairs have unstable PMI and
    * would otherwise dominate the top of the list.
    *
    * Determinism contract: the ratio is ONE double expression over exact
    * long counts — `(c_xy·N_u·N_u) / (N_b·c_x·c_y)` with the cast-to-double
    * on the leading factor of each product (so no long overflow at scale and
    * the multiply order is pinned) — mirrored verbatim in the oracle, then
    * `round(ln(·), 6)`.
    *
    * Scale shape: bigrams assemble IN-ROW (no pair join); both count tables
    * are hash aggs keyed by token; the unigram table joins back twice on the
    * token equi-key (vocab-sized — NOT broadcast, a web-scale vocabulary is
    * not tiny); the two corpus totals are a one-row broadcast.
    */
  def collocations(docs: DataFrame, minCount: Long = 5L,
      textCol: String = "text"): DataFrame = {
    val toksDf = docs.select(tokens(col(textCol)).as("_toks"))
    val uni = toksDf.select(explode(col("_toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val bi0 = toksDf.where(size(col("_toks")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("_toks")) - 1),
        i => struct(element_at(col("_toks"), i).as("w1"),
          element_at(col("_toks"), i + 1).as("w2")))).as("_p"))
      .select(col("_p.w1").as("w1"), col("_p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("pair_cnt"))
    val totals = uni.agg(sum(col("cnt")).as("_nu"))
      .crossJoin(bi0.agg(sum(col("pair_cnt")).as("_nb")))
    bi0.where(col("pair_cnt") >= minCount)
      .join(uni.select(col("w").as("w1"), col("cnt").as("cnt1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cnt").as("cnt2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("pair_cnt"), col("cnt1"), col("cnt2"),
        round(log(
          col("pair_cnt").cast("double") * col("_nu") * col("_nu") /
            (col("_nb").cast("double") * col("cnt1") * col("cnt2"))), 6)
          .as("pmi"))
  }

  /** DuckDB mirrors. `toks(e)` must stay in lock-step with [[tokens]]. */
  object Sql {
    def toks(e: String): String =
      s"list_filter(string_split_regex(lower($e), '[^a-z0-9]+'), t -> t <> '')"

    def hitCount(toksE: String, words: Seq[String]): String =
      s"len(list_filter($toksE, t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

    /** Mirror of [[TextAnalysis.scrub]]'s projection (regexes must be in the
      * Java∩RE2 dialect and contain no single quotes).
      */
    def scrubSelect(patterns: Seq[(String, String)]): String = {
      val counts = patterns.map { case (name, re) =>
        s"len(regexp_extract_all(text, '$re')) AS n_$name" }
      val total = patterns.map { case (_, re) =>
        s"len(regexp_extract_all(text, '$re'))" }.mkString(" + ")
      val redacted = patterns.foldLeft("text") { case (e, (name, re)) =>
        s"regexp_replace($e, '$re', '<${name.toUpperCase}>', 'g')" }
      (s"doc_id" +: counts :+ s"$total AS n_scrubbed" :+ s"$redacted AS scrubbed")
        .mkString(",\n  ")
    }

    /** The quality-score expression alone — [[statsSelect]]'s last column,
      * also the q71 curation oracle's filter predicate.
      */
    val qualityExpr: String = s"round($qualityRawExpr, 4)"

    /** Mirror of [[TextAnalysis.qualityRaw]] — the UNROUNDED double, for
      * oracles whose query side orders or aggregates on the score.
      */
    lazy val qualityRawExpr: String = {
      val t = toks("text")
      val nTok = s"len($t)::DOUBLE"
      val nUniq = s"len(list_distinct($t))::DOUBLE"
      val stop = s"${hitCount(t, Stopwords.head._2)}::DOUBLE"
      val punct = "(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE"
      val chars = "length(text)::DOUBLE"
      s"""(0.4::DOUBLE * ($nUniq / greatest($nTok, 1.0))
         |      + 0.3::DOUBLE * ($stop / greatest($nTok, 1.0))
         |      + 0.2::DOUBLE * least($nTok / 200.0, 1.0)
         |      + 0.1::DOUBLE * (1.0 - $punct / greatest($chars, 1.0)))""".stripMargin
    }

    val statsSelect: String = {
      val t = toks("text")
      val nTok = s"len($t)::DOUBLE"
      val nUniq = s"len(list_distinct($t))::DOUBLE"
      val stop = s"${hitCount(t, Stopwords.head._2)}::DOUBLE"
      val punct = "(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE"
      val chars = "length(text)::DOUBLE"
      s"""doc_id,
         |  len($t) AS n_tokens,
         |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
         |  $nUniq / greatest($nTok, 1.0) AS uniq_ratio,
         |  $stop / greatest($nTok, 1.0) AS stop_ratio,
         |  $punct / greatest($chars, 1.0) AS punct_ratio,
         |  $qualityRawExpr AS quality""".stripMargin
    }

    /** DuckDB 1.0 lacks greatest() over structs; the priority-ordered argmax
      * (max hits, earlier language wins ties) is spelled as a CASE cascade —
      * equivalent to Spark's lexicographic struct-greatest on (hits, -index).
      */
    val langIdSelect: String = {
      val t = toks("text")
      val hits = Stopwords.map { case (lang, words) => lang -> hitCount(t, words) }
      val langs = hits.map(_._1)
      val zero = hits.map { case (_, h) => s"$h = 0" }.mkString(" AND ")
      val cascade = langs.init.zipWithIndex.map { case (lang, i) =>
        val rest = langs.drop(i + 1)
        val cond = rest.map(o => s"${hits(i)._2} >= ${hits(langs.indexOf(o))._2}").mkString(" AND ")
        s"WHEN $cond THEN '$lang'"
      }.mkString("\n       ")
      s"""doc_id,
         |  CASE WHEN $zero THEN 'und'
         |       $cascade
         |       ELSE '${langs.last}' END AS pred_lang""".stripMargin
    }
  }
}
